"""diversity, value/nominal assortativity, pairs-Jaccard, dominator tree."""

import math

from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.flow import dominator_tree
from xdata_igraph_spark.operators.similarity import (
    assortativity,
    assortativity_degree,
    assortativity_nominal,
    jaccard_edge_pairs,
    jaccard_pairs,
)
from xdata_igraph_spark.operators.structure import diversity


def _wg(spark, rows, n, directed=False):
    return LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        n=n,
    )


# ---------------------------------------------------------------- diversity


def test_diversity_matches_reference_formula(spark):
    # star with distinct weights: center entropy computed by hand
    rows = [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 4.0)]
    g = _wg(spark, rows, 4)
    got = {r["id"]: r["diversity"] for r in diversity(g).collect()}
    ws = [1.0, 2.0, 4.0]
    s = sum(ws)
    ent = sum(w * math.log(w) for w in ws)
    want0 = (math.log(s) - ent / s) / math.log(3)
    assert abs(got[0] - want0) < 1e-12
    # leaves (k=1) and isolates (k=0) are NaN like the reference's 0/0
    for v in (1, 2, 3):
        assert math.isnan(got[v])


def test_diversity_uniform_weights_is_one(spark):
    # equal weights → maximum entropy → D = 1 exactly for every k >= 2
    rows = [(0, 1, 3.0), (0, 2, 3.0), (1, 2, 3.0), (1, 3, 3.0), (2, 3, 3.0)]
    g = _wg(spark, rows, 4)
    for r in diversity(g).collect():
        assert abs(r["diversity"] - 1.0) < 1e-12


# ------------------------------------------------------------ assortativity


def test_assortativity_values_matches_degree_version(spark):
    # excess-degree values reproduce assortativity_degree (mixing.c:271
    # implements the degree version by calling the values version)
    rows = [
        (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (4, 6, 1.0), (5, 6, 1.0),
    ]
    g = _wg(spark, rows, 7)
    sym = g.symmetrized().select("src", "dst").distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        (F.count("*") - 1).cast("double").alias("x")
    )
    # the undirected estimator must be fed each edge once (the pooled
    # moments already count both endpoints)
    r1 = assortativity(g, deg, directed=False)
    r2 = assortativity_degree(g)
    assert abs(r1 - r2) < 1e-12


def test_assortativity_directed_is_pearson(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 1.0)]
    g = _wg(spark, rows, 3, directed=True)
    vals = spark.createDataFrame([(0, 1.0), (1, 4.0), (2, 9.0)], "id long, v double")
    got = assortativity(g, vals, directed=True)
    import numpy as np

    x = np.array([1.0, 4.0, 9.0, 1.0])  # tail values per arc
    y = np.array([4.0, 9.0, 1.0, 9.0])  # head values per arc
    want = np.corrcoef(x, y)[0, 1]
    assert abs(got - want) < 1e-12


def test_assortativity_nominal_perfectly_assortative(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    g = _wg(spark, rows, 6)
    types = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)], "id long, t long"
    )
    assert abs(assortativity_nominal(g, types, directed=False) - 1.0) < 1e-12


def test_assortativity_nominal_undirected_matches_c_bookkeeping(spark):
    # mixed small case evaluated with mixing.c:99-140's literal loop
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0), (0, 2, 1.0)]
    types = {0: 0, 1: 1, 2: 0, 3: 1}
    g = _wg(spark, rows, 4)
    tdf = spark.createDataFrame(list(types.items()), "id long, t long")
    m = len(rows)
    ai = [0.0, 0.0]
    bi = [0.0, 0.0]
    eii = [0.0, 0.0]
    for u, v, _ in rows:
        ft, tt = types[u], types[v]
        ai[ft] += 1
        bi[tt] += 1
        if ft == tt:
            eii[ft] += 2
        ai[tt] += 1
        bi[ft] += 1
    sumaibi = sum((a / m) * (b / m) for a, b in zip(ai, bi)) / 4.0
    sumeii = sum(e / m for e in eii) / 2.0
    want = (sumeii - sumaibi) / (1.0 - sumaibi)
    got = assortativity_nominal(g, tdf, directed=False)
    assert abs(got - want) < 1e-12


# ------------------------------------------------------------ jaccard pairs


def test_jaccard_pairs_agrees_with_edge_pairs(spark):
    rows = [
        (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0),
        (3, 4, 1.0), (1, 4, 1.0),
    ]
    g = _wg(spark, rows, 5)
    ref = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_edge_pairs(g).collect()}
    pairs = spark.createDataFrame(sorted(ref), "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(g, pairs).collect()}
    assert got.keys() == ref.keys()
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12


def test_jaccard_pairs_disjoint_and_empty(spark):
    rows = [(0, 1, 1.0), (2, 3, 1.0)]
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=False,
        n=5,  # vertex 4 is isolated
    )
    pairs = spark.createDataFrame([(0, 2), (0, 4), (4, 4)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(g, pairs).collect()}
    assert got[(0, 2)] == 0.0  # neighborhoods {1} vs {3}
    assert got[(0, 4)] == 0.0  # one side isolated
    assert got[(4, 4)] == 0.0  # both empty → reference convention 0


# ------------------------------------------------------------ dominator tree


def _brute_idom(n_ids, arcs, root):
    """idom via the definition: dominators(w) = vertices whose removal
    disconnects w from root; idom = the dominator closest to w (the one
    dominated by all others)."""
    from collections import deque

    succ = {}
    for u, v in arcs:
        succ.setdefault(u, []).append(v)

    def reach(skip=None):
        seen = set()
        if root == skip:
            return seen
        seen.add(root)
        q = deque([root])
        while q:
            u = q.popleft()
            for v in succ.get(u, []):
                if v != skip and v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    base = reach()
    doms = {}
    for w in base:
        doms[w] = {v for v in base if v == w or w not in reach(skip=v)}
    idom = {}
    for w in base:
        if w == root:
            idom[w] = -1
            continue
        cands = doms[w] - {w}
        # the immediate dominator is dominated by every other dominator
        (best,) = [v for v in cands if all(v in doms and o in doms[v] for o in cands)]
        idom[w] = best
    return idom, sorted(set(n_ids) - base)


def test_dominator_tree_classic_flowgraph(spark):
    # the flowgraph family used in dominator papers: diamonds + a join
    arcs = [
        (0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 5), (4, 5),
        (5, 6), (6, 3), (0, 7),
    ]
    g = LinkGraph(
        spark.createDataFrame([(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"),
        directed=True,
        n=9,  # vertex 8 unreachable
    )
    dom, left = dominator_tree(g, root=0)
    got = {r["id"]: r["idom"] for r in dom.collect()}
    want, want_left = _brute_idom(range(9), arcs, 0)
    assert got == want
    assert [r["id"] for r in left.collect()] == want_left == [8]


def test_dominator_tree_mode_in(spark):
    arcs = [(1, 0), (2, 0), (3, 1), (3, 2)]
    g = LinkGraph(
        spark.createDataFrame([(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"),
        directed=True,
        n=4,
    )
    dom, left = dominator_tree(g, root=0, mode="in")
    got = {r["id"]: r["idom"] for r in dom.collect()}
    want, _ = _brute_idom(range(4), [(b, a) for a, b in arcs], 0)
    assert got == want
    assert left.count() == 0


def test_dominator_tree_linear_chain(spark):
    arcs = [(0, 1), (1, 2), (2, 3)]
    g = LinkGraph(
        spark.createDataFrame([(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"),
        directed=True,
        n=4,
    )
    dom, _ = dominator_tree(g, root=0)
    assert {r["id"]: r["idom"] for r in dom.collect()} == {0: -1, 1: 0, 2: 1, 3: 2}


# ------------------------------------------------------- convergence degree


def _brute_convergence(n, arcs, directed):
    """Literal transcription of igraph_convergence_degree's BFS loop
    (structural_properties.c:4011), keyed by (src, dst) arc."""
    from collections import defaultdict, deque

    ins = defaultdict(int)
    outs = defaultdict(int)
    passes = [("out", ins)] if not directed else [("out", ins), ("in", outs)]
    for mode, vec in passes:
        adj = defaultdict(list)  # node -> [(other, key)]
        for u, v in arcs:
            key = (u, v)
            if directed:
                if mode == "out":
                    adj[u].append((v, key))
                else:
                    adj[v].append((u, key))
            else:
                adj[u].append((v, key))
                adj[v].append((u, key))
        for i in range(n):
            geo = {i: 1}
            q = deque([(i, 0)])
            while q:
                act, d = q.popleft()
                for nbr, key in adj[act]:
                    tight = False
                    if nbr in geo:
                        if geo[nbr] - 1 == d + 1:
                            tight = True
                    else:
                        q.append((nbr, d + 1))
                        geo[nbr] = d + 2
                        tight = True
                    if tight:
                        if directed:
                            vec[key] += 1
                        elif act < nbr:
                            ins[key] += 1
                        else:
                            outs[key] += 1
    out = {}
    for key in {(u, v) for u, v in arcs}:
        k = (min(key), max(key)) if not directed else key
        i_, o_ = ins[key], outs[key]
        out[k] = (i_, o_)
    return out


def test_convergence_degree_directed(spark):
    from xdata_igraph_spark.operators.structure import convergence_degree

    arcs = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (1, 3)]
    g = LinkGraph(
        spark.createDataFrame([(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"),
        directed=True,
        n=4,
    )
    got = {
        (r["src"], r["dst"]): (r["ins"], r["outs"], r["convergence"])
        for r in convergence_degree(g).collect()
    }
    want = _brute_convergence(4, arcs, directed=True)
    assert set(got) == set(want)
    for k, (wi, wo) in want.items():
        gi, go, gc = got[k]
        assert (gi, go) == (wi, wo), (k, got[k], want[k])
        if wi + wo:
            assert abs(gc - (wi - wo) / (wi + wo)) < 1e-12
        else:
            assert math.isnan(gc)


def test_convergence_degree_undirected_bridge(spark):
    from xdata_igraph_spark.operators.structure import convergence_degree

    # two triangles joined by a bridge: the bridge carries all
    # cross-traffic, |convergence| reflects field asymmetry
    arcs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    g = LinkGraph(
        spark.createDataFrame([(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"),
        directed=False,
        n=6,
    )
    got = {
        (r["src"], r["dst"]): (r["ins"], r["outs"])
        for r in convergence_degree(g).collect()
    }
    want = _brute_convergence(6, arcs, directed=False)
    assert got == want
