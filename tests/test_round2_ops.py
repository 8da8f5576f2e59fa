"""Round-2 operators: paths reconstruction, closeness, betweenness,
triad census, scan-k, barrat, girth, k-core h-index, new generators,
core-API additions."""

from __future__ import annotations

import itertools
import math
import random
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph



# ---------------------------------------------------------------- helpers


def _py_brandes(n, arcs, directed=True):
    """Reference Brandes betweenness (unweighted), pure Python."""
    adj = defaultdict(list)
    edges = set(arcs)
    if not directed:
        edges |= {(b, a) for a, b in arcs}
    for a, b in edges:
        adj[a].append(b)
    bc = dict.fromkeys(range(n), 0.0)
    for s in range(n):
        S, P = [], defaultdict(list)
        sigma = dict.fromkeys(range(n), 0.0)
        sigma[s] = 1.0
        dist = dict.fromkeys(range(n), -1)
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = dict.fromkeys(range(n), 0.0)
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if not directed:
        for v in bc:
            bc[v] /= 2.0
    return bc


def _random_arcs(n, p, seed, directed=True):
    rng = random.Random(seed)
    out = set()
    for u in range(n):
        for v in range(n):
            if u != v and rng.random() < p:
                out.add((u, v) if directed else (min(u, v), max(u, v)))
    return sorted(out)


# ------------------------------------------------------------ paths / closeness


def test_get_shortest_paths_small(spark):
    from xdata_igraph_spark.operators.paths import get_shortest_paths

    # 0→1→3, 0→2→3 (tie → parent min id = 1), 3→4
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], directed=True
    )
    out = {r["target"]: (r["dist"], r["path"]) for r in
           get_shortest_paths(g, 0).collect()}
    assert out[0] == (0.0, [0])
    assert out[1] == (1.0, [0, 1])
    assert out[3] == (2.0, [0, 1, 3])  # min-parent tie-break
    assert out[4] == (3.0, [0, 1, 3, 4])


def test_closeness_formula(spark):
    from xdata_igraph_spark.operators.paths import closeness

    # directed path 0→1→2 plus isolated-ish structure
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=True, n=3)
    out = {r["id"]: r["closeness"] for r in closeness(g, mode="out").collect()}
    n = 3
    # vertex 0 reaches {0,1,2}: total = 0+1+2 = 3 → 1/3
    assert out[0] == pytest.approx(1.0 / 3.0)
    # vertex 1 reaches {1,2}: total = 1 + 3*(3-2) = 4
    assert out[1] == pytest.approx(1.0 / 4.0)
    # vertex 2 reaches {2}: total = 0 + 3*2 = 6
    assert out[2] == pytest.approx(1.0 / 6.0)
    norm = {r["id"]: r["closeness"]
            for r in closeness(g, mode="out", normalized=True).collect()}
    assert norm[0] == pytest.approx((n - 1) / 3.0)


def test_path_length_hist_ring(spark):
    from xdata_igraph_spark.operators.paths import path_length_hist
    from xdata_igraph_spark.sources.generators import ring

    g = ring(spark, 6, directed=False)
    hist = {r["dist"]: r["npairs"] for r in path_length_hist(g).collect()}
    # C6 unordered pairs: 6 at dist 1, 6 at dist 2, 3 at dist 3
    assert hist == {1.0: 6, 2.0: 6, 3.0: 3}


def test_girth_famous(spark):
    from xdata_igraph_spark.operators.paths import girth
    from xdata_igraph_spark.sources.generators import famous

    for name, g_expect in [("bull", 3), ("petersen", 5), ("heawood", 6),
                           ("frucht", 3), ("chvatal", 4)]:
        assert girth(famous(spark, name)) == g_expect, name
    from xdata_igraph_spark.sources.generators import tree

    assert math.isinf(girth(tree(spark, 7, 2)))


# ------------------------------------------------------------ betweenness


def test_betweenness_path(spark):
    from xdata_igraph_spark.operators.centrality import betweenness

    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False)
    out = {r["id"]: r["betweenness"] for r in betweenness(g).collect()}
    assert out == {0: 0.0, 1: 1.0, 2: 0.0}


@pytest.mark.parametrize("directed", [True, False])
def test_betweenness_random_vs_python(spark, directed):
    from xdata_igraph_spark.operators.centrality import betweenness

    n = 12
    arcs = _random_arcs(n, 0.25, seed=5, directed=directed)
    ref = _py_brandes(n, arcs, directed=directed)
    g = LinkGraph.from_pairs(spark, arcs, directed=directed, n=n)
    out = {r["id"]: r["betweenness"]
           for r in betweenness(g, directed=directed).collect()}
    for v in range(n):
        assert out[v] == pytest.approx(ref[v], abs=1e-9), v


# ------------------------------------------------------------ triad census


def test_triad_census_bruteforce(spark):
    from xdata_igraph_spark.operators.structure import TRIAD_NAMES, triad_census

    n = 13
    arcs = set(_random_arcs(n, 0.2, seed=11, directed=True))

    def classify(tri):
        x, y, z = tri

        def t(a, b):
            return ((a, b) in arcs) + ((b, a) in arcs)

        m = sum(t(a, b) == 2 for a, b in [(x, y), (x, z), (y, z)])
        a_ = sum(t(a, b) == 1 for a, b in [(x, y), (x, z), (y, z)])
        outd = dict.fromkeys(tri, 0)
        ind = dict.fromkeys(tri, 0)
        for (u, v) in itertools.permutations(tri, 2):
            if (u, v) in arcs and (v, u) not in arcs:
                outd[u] += 1
                ind[v] += 1
        if m == 0 and a_ == 0:
            return "003"
        if m == 0 and a_ == 1:
            return "012"
        if m == 1 and a_ == 0:
            return "102"
        if m == 0 and a_ == 2:
            if max(outd.values()) == 2:
                return "021D"
            if max(ind.values()) == 2:
                return "021U"
            return "021C"
        if m == 1 and a_ == 1:
            third = z if t(x, y) == 2 else (y if t(x, z) == 2 else x)
            return "111D" if outd[third] == 1 else "111U"
        if m == 0 and a_ == 3:
            return "030C" if all(outd[v] == 1 for v in tri) else "030T"
        if m == 2 and a_ == 0:
            return "201"
        if m == 1 and a_ == 2:
            third = z if t(x, y) == 2 else (y if t(x, z) == 2 else x)
            if ind[third] == 0:
                return "120D"
            if outd[third] == 0:
                return "120U"
            return "120C"
        if m == 2 and a_ == 1:
            return "210"
        return "300"

    ref = dict.fromkeys(TRIAD_NAMES, 0)
    for tri in itertools.combinations(range(n), 3):
        ref[classify(tri)] += 1
    g = LinkGraph.from_pairs(spark, sorted(arcs), directed=True, n=n)
    out = {r["triad"]: r["count"] for r in triad_census(g).collect()}
    assert out == ref


def test_triad_census_canonical_fixtures(spark):
    """Each Davis-Leinhardt class built literally from igraph's documented
    picture (doc of igraph_triad_census, /root/reference/src/motifs.c:976):
    a 3-vertex graph whose single triple must land in exactly that class."""
    from xdata_igraph_spark.operators.structure import triad_census

    fixtures = {
        "003": [],
        "012": [(0, 1)],
        "102": [(0, 1), (1, 0)],
        "021D": [(1, 0), (1, 2)],                     # A<-B->C
        "021U": [(0, 1), (2, 1)],                     # A->B<-C
        "021C": [(0, 1), (1, 2)],                     # A->B->C
        "111D": [(0, 1), (1, 0), (2, 1)],             # A<->B<-C
        "111U": [(0, 1), (1, 0), (1, 2)],             # A<->B->C
        "030T": [(0, 1), (2, 1), (0, 2)],             # A->B<-C, A->C
        "030C": [(1, 0), (2, 1), (0, 2)],             # A<-B<-C, A->C
        "201": [(0, 1), (1, 0), (1, 2), (2, 1)],      # A<->B<->C
        "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],     # A<-B->C, A<->C
        "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],     # A->B<-C, A<->C
        "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],     # A->B->C, A<->C
        "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],  # A->B<->C, A<->C
        "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
    }
    for name, arcs in fixtures.items():
        g = LinkGraph.from_pairs(spark, arcs, directed=True, n=3)
        out = {r["triad"]: r["count"] for r in triad_census(g).collect()}
        assert out[name] == 1, (name, out)
        assert sum(out.values()) == 1, (name, out)


# ------------------------------------------------------------ k-core / scan


def test_kcore_hindex_equals_peel(spark):
    from xdata_igraph_spark.operators.kcore import coreness

    arcs = _random_arcs(14, 0.25, seed=3, directed=False)
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=14)
    hx = {r["id"]: r["coreness"] for r in coreness(g, method="hindex").collect()}
    peel = {r["id"]: r["coreness"] for r in coreness(g, method="peel").collect()}
    assert hx == peel


def test_kcore_hindex_equals_peel_directed(spark):
    """Directed in/out/all-mode h-index fixpoint must agree with the
    exact peel (the Lü et al. theorem's directed generalization —
    verified here rather than assumed)."""
    from xdata_igraph_spark.operators.kcore import coreness

    arcs = _random_arcs(16, 0.3, seed=7, directed=True)
    g = LinkGraph.from_pairs(spark, arcs, directed=True, n=16)
    for mode in ("out", "in", "all"):
        hx = {r["id"]: r["coreness"] for r in coreness(g, mode=mode, method="hindex").collect()}
        pl = {r["id"]: r["coreness"] for r in coreness(g, mode=mode, method="peel").collect()}
        assert hx == pl, mode


def test_scan_k1_equals_scan1(spark):
    from xdata_igraph_spark.operators.scan_stats import scan1, scan_k_ecount

    arcs = _random_arcs(12, 0.3, seed=9, directed=False)
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=12)
    s1 = {r["id"]: r["scan1"] for r in scan1(g).collect()}
    sk = {r["id"]: r["scan"] for r in scan_k_ecount(g, k=1).collect()}
    assert sk == s1


def test_scan_k_full_graph_saturates(spark):
    from xdata_igraph_spark.operators.scan_stats import scan_k_ecount
    from xdata_igraph_spark.sources.generators import ring

    # C6: 2-hop closed neighborhood of each vertex = 5 vertices holding
    # 4 ring edges
    g = ring(spark, 6, directed=False)
    out = {r["id"]: r["scan"] for r in scan_k_ecount(g, k=2).collect()}
    assert out == dict.fromkeys(range(6), 4)


def test_scan_reciprocal_arcs_count_twice(spark):
    """Reference incidence-walk semantics (src/scan.c:172-236,785-805):
    a directed reciprocal pair inside the neighborhood contributes 2 —
    each stored arc counts once, with multiplicity."""
    from xdata_igraph_spark.operators.scan_stats import scan1, scan_k_ecount

    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 0), (1, 2)], directed=True, n=3)
    s1 = {r["id"]: r["scan1"] for r in scan1(g).collect()}
    # N[0]={0,1}: arcs 0->1,1->0 → 2; N[1]={0,1,2}: all 3; N[2]={1,2}: 1->2 → 1
    assert s1 == {0: 2, 1: 3, 2: 1}
    sk = {r["id"]: r["scan"] for r in scan_k_ecount(g, k=2).collect()}
    assert sk == {0: 3, 1: 3, 2: 3}


def test_scan_k_them_matches_scan1_them(spark):
    from xdata_igraph_spark.operators.scan_stats import (
        scan1_them,
        scan_k_ecount_them,
    )

    us = LinkGraph.from_pairs(
        spark, _random_arcs(10, 0.3, seed=21, directed=False), directed=False, n=10
    )
    them = LinkGraph.from_pairs(
        spark, _random_arcs(10, 0.3, seed=22, directed=False), directed=False, n=10
    )
    a = {r["id"]: r["scan1_them"] for r in scan1_them(us, them).collect()}
    b = {r["id"]: r["scan"] for r in scan_k_ecount_them(us, them, k=1).collect()}
    assert a == b


# ------------------------------------------------------------ barrat


def test_barrat_unit_weights_equals_local_transitivity(spark):
    from xdata_igraph_spark.operators.triangles import (
        transitivity_barrat,
        transitivity_local_undirected,
    )

    arcs = _random_arcs(12, 0.35, seed=13, directed=False)
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=12)
    b = {r["id"]: r["barrat"] for r in transitivity_barrat(g).collect()}
    t = {r["id"]: r[1] for r in transitivity_local_undirected(g).collect()}
    for v in range(12):
        if math.isnan(t[v]):
            assert math.isnan(b[v])
        else:
            assert b[v] == pytest.approx(t[v], abs=1e-12)


# ------------------------------------------------------------ generators


def test_kautz_structure(spark):
    from xdata_igraph_spark.sources.generators import kautz

    g = kautz(spark, 2, 2)
    assert g.vcount() == 12 and g.ecount() == 24
    degs = g.degrees("out")
    assert degs.filter(F.col("degree") != 2).count() == 0


def test_famous_catalog(spark):
    from xdata_igraph_spark.operators.triangles import count_triangles
    from xdata_igraph_spark.sources.generators import famous

    heawood = famous(spark, "heawood")
    assert (heawood.vcount(), heawood.ecount()) == (14, 21)
    assert heawood.degrees().filter(F.col("degree") != 3).count() == 0
    ico = famous(spark, "icosahedral")
    assert (ico.vcount(), ico.ecount()) == (12, 30)
    assert ico.degrees().filter(F.col("degree") != 5).count() == 0
    # the Grötzsch graph is triangle-free
    assert count_triangles(famous(spark, "grotzsch")) == 0
    cub = famous(spark, "cubical")
    assert (cub.vcount(), cub.ecount()) == (8, 12)


def test_degree_sequence_game(spark):
    from xdata_igraph_spark.sources.generators import degree_sequence_game

    seq = [3, 3, 2, 2, 1, 1]
    g = degree_sequence_game(spark, seq, seed=7)
    degs = {r["id"]: r["degree"] for r in g.degrees("all").collect()}
    assert [degs[i] for i in range(6)] == seq


def test_gnm_dense_request(spark):
    from xdata_igraph_spark.sources.generators import gnm

    g = gnm(spark, 20, 180, directed=False, seed=3)  # 180 of 190 possible
    assert g.ecount() == 180
    assert g.is_simple()


# ------------------------------------------------------------ core API


def test_core_api_additions(spark):
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 0), (2, 2), (0, 1)], directed=True, n=4
    )
    assert not g.is_simple()
    assert g.has_multiple()
    simple = g.simplify()
    assert simple.is_simple()
    g2 = simple.add_edges([(3, 0)])
    assert g2.ecount() == simple.ecount() + 1
    g3 = g2.add_vertices(2)
    assert g3.vcount() == 6
    eid = simple.get_eid(0, 1)
    assert eid >= 0
    assert simple.get_eid(1, 0, error=False) == -1
    inc = {r["eid"] for r in simple.incident(2, "out").collect()}
    assert len(inc) == 1
    sub = g2.subgraph_edges(
        spark.createDataFrame([(0, 1)], "src long, dst long")
    )
    assert sub.ecount() == 1


def test_subcomponent_and_decompose(spark):
    from xdata_igraph_spark.operators.components import decompose, subcomponent

    # two components: {0,1,2} cycle and {5,6} edge
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 0), (5, 6)], directed=True
    )
    sc = {r["id"] for r in subcomponent(g, 0, mode="out").collect()}
    assert sc == {0, 1, 2}
    parts = decompose(g, mode="weak")
    sizes = sorted(p.vertices().count() for p in parts)
    assert sizes == [2, 3]
    big = decompose(g, mode="weak", minelements=3)
    assert len(big) == 1


def test_resume_fingerprint_guard(spark, tmp_path):
    from xdata_igraph_spark.operators.pagerank import pagerank

    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 0), (1, 2)], directed=True)
    ck = str(tmp_path / "ck")
    pagerank(g, tol=0.0, max_iter=3, checkpoint_dir=ck, checkpoint_interval=1)
    # same params resume fine
    pagerank(g, tol=0.0, max_iter=4, checkpoint_dir=ck, checkpoint_interval=1)
    with pytest.raises(ValueError, match="different graph/parameters"):
        pagerank(g, damping=0.5, tol=0.0, max_iter=4, checkpoint_dir=ck,
                 checkpoint_interval=1)


def test_empty_graph_guards(spark):
    from xdata_igraph_spark.operators.components import scc
    from xdata_igraph_spark.operators.kcore import coreness
    from xdata_igraph_spark.operators.paths import topological_sorting

    g = LinkGraph.empty(spark, 0)
    assert scc(g).count() == 0
    assert coreness(g, method="peel").count() == 0
    assert topological_sorting(g).count() == 0


def test_srp_multiprobe_recall(spark):
    import os

    from xdata_igraph_spark.operators.ann import cosine_topk, srp_topk

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    emb = spark.read.parquet(path).localCheckpoint()
    probe = emb.filter(F.col("vec_id") < 100)
    exact = cosine_topk(emb, k=3, probe=probe).localCheckpoint(eager=True)

    def recall(mp):
        srp = srp_topk(emb, k=3, n_planes=8, dim=64, n_tables=4, multiprobe=mp)
        hits = exact.join(srp, ["query_id", "neighbor_id"], "left_semi").count()
        return hits / exact.count()

    r0, r2 = recall(0), recall(2)
    # uniformly random 64-dim vectors are LSH's worst case; multiprobe-2
    # must still recover a solid majority of true top-3 neighbors
    assert r2 >= 0.5
    assert r2 > r0


def _py_edge_brandes(n, arcs, directed=True):
    adj = defaultdict(list)
    edges = set(arcs)
    if not directed:
        edges |= {(b, a) for a, b in arcs}
    for a, b in edges:
        adj[a].append(b)
    eb = defaultdict(float)
    for s in range(n):
        S, P = [], defaultdict(list)
        sigma = dict.fromkeys(range(n), 0.0)
        sigma[s] = 1.0
        dist = dict.fromkeys(range(n), -1)
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = dict.fromkeys(range(n), 0.0)
        while S:
            w = S.pop()
            for v in P[w]:
                c = sigma[v] / sigma[w] * (1 + delta[w])
                eb[(v, w)] += c
                delta[v] += c
    if not directed:
        merged = defaultdict(float)
        for (a, b), v in eb.items():
            merged[(min(a, b), max(a, b))] += v / 2.0
        return dict(merged)
    return dict(eb)


@pytest.mark.parametrize("directed", [True, False])
def test_edge_betweenness_random(spark, directed):
    from xdata_igraph_spark.operators.centrality import edge_betweenness

    n = 11
    arcs = _random_arcs(n, 0.25, seed=17, directed=directed)
    ref = _py_edge_brandes(n, arcs, directed=directed)
    g = LinkGraph.from_pairs(spark, arcs, directed=directed, n=n)
    out = {(r["src"], r["dst"]): r["betweenness"]
           for r in edge_betweenness(g, directed=directed).collect()}
    for k, v in ref.items():
        assert out.get(k, 0.0) == pytest.approx(v, abs=1e-9), k
    for k in out:
        assert k in ref or out[k] == pytest.approx(0.0)


def test_bfs_dfs(spark):
    from xdata_igraph_spark.operators.paths import bfs, dfs

    g = LinkGraph.from_pairs(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], directed=True
    )
    b = {r["id"]: (r["dist"], r["parent"], r["order"]) for r in bfs(g, 0).collect()}
    assert b[0] == (0, None, 0)
    assert b[1][0] == 1 and b[2][0] == 1
    assert b[3] == (2, 1, 3)  # min-parent, order after layer-1
    assert b[4] == (3, 3, 4)
    d = {r["id"]: (r["order"], r["parent"]) for r in dfs(g, 0).collect()}
    # neighbors ascending: 0 → 1 → 3 → 4, backtrack → 2
    assert d[0] == (0, None)
    assert d[1] == (1, 0)
    assert d[3] == (2, 1)
    assert d[4] == (3, 3)
    assert d[2] == (4, 0)


def test_centralization_degree_star(spark):
    from xdata_igraph_spark.operators.centrality import centralization_degree
    from xdata_igraph_spark.sources.generators import star

    # an undirected star is the maximally centralized graph: 1.0
    g = star(spark, 7, mode="undirected")
    assert centralization_degree(g) == pytest.approx(1.0)


def test_louvain_ring_of_cliques(spark):
    from xdata_igraph_spark.operators.lpa import modularity
    from xdata_igraph_spark.operators.louvain import multilevel_communities

    # 4 cliques of 5, joined in a ring by single bridges
    pairs = []
    for c in range(4):
        base = c * 5
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append((base + i, base + j))
        pairs.append((base, ((c + 1) % 4) * 5 + 1))
    g = LinkGraph.from_pairs(spark, pairs, directed=False, n=20)
    mem = multilevel_communities(g)
    labels = {r["id"]: r["label"] for r in mem.collect()}
    # each clique ends up in one community
    for c in range(4):
        vals = {labels[c * 5 + i] for i in range(5)}
        assert len(vals) == 1, (c, vals)
    assert len(set(labels.values())) == 4
    q = modularity(g, mem.select("id", F.col("label").alias("c")))
    assert q > 0.6


def test_louvain_karate_quality(spark):
    from xdata_igraph_spark.operators.lpa import modularity
    from xdata_igraph_spark.operators.louvain import multilevel_communities
    from xdata_igraph_spark.sources.generators import famous

    g = famous(spark, "zachary")
    mem = multilevel_communities(g)
    q = modularity(g, mem.select("id", F.col("label").alias("c")))
    # igraph's sequential multilevel reaches ~0.4188 on karate; the
    # synchronous distributed variant must still find real structure
    assert q >= 0.35
    k = mem.select("label").distinct().count()
    assert 2 <= k <= 8


def test_spectral_embedding_vs_numpy(spark):
    import numpy as np

    from xdata_igraph_spark.operators.embedding import (
        adjacency_spectral_embedding,
    )

    arcs = _random_arcs(14, 0.3, seed=29, directed=False)
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=14)
    X, lambdas = adjacency_spectral_embedding(
        g, no=3, scaled=True, max_iter=150, tol=1e-10
    )
    A = np.zeros((14, 14))
    for a, b in arcs:
        A[a, b] = A[b, a] = 1.0
    w, V = np.linalg.eigh(A)
    order = np.argsort(-np.abs(w))[:3]
    ref_l = w[order]
    assert np.allclose(sorted(np.abs(lambdas), reverse=True),
                       sorted(np.abs(ref_l), reverse=True), atol=1e-4)
    # columns match up to sign: compare |X| to |u·sqrt(|λ|)|
    rows = {r["id"]: [r["x0"], r["x1"], r["x2"]] for r in X.collect()}
    got = np.array([rows[i] for i in range(14)])
    ref = V[:, order] * np.sqrt(np.abs(ref_l))
    assert np.allclose(np.abs(got), np.abs(ref), atol=1e-3)


def test_spectral_embedding_bipartite_pm_pairs(spark):
    """Bipartite graphs have a symmetric spectrum (±λ pairs) that the
    A²-Ritz loop alone cannot split — the final Rayleigh–Ritz on A
    must return the true signed pairs. Star S_5: eigenvalues ±2, 0…"""
    import numpy as np

    from xdata_igraph_spark.operators.embedding import (
        adjacency_spectral_embedding,
    )

    arcs = [(0, i) for i in range(1, 5)]  # star, center 0, 4 leaves
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=5)
    X, lambdas = adjacency_spectral_embedding(
        g, no=2, scaled=False, max_iter=200, tol=1e-12
    )
    assert np.allclose(sorted(lambdas), [-2.0, 2.0], atol=1e-6)
    rows = {r["id"]: [r["x0"], r["x1"]] for r in X.collect()}
    got = np.array([rows[i] for i in range(5)])
    A = np.zeros((5, 5))
    for a, b in arcs:
        A[a, b] = A[b, a] = 1.0
    # each returned column must be a genuine eigenvector: ‖A·x − λ·x‖ ≈ 0
    for j, lam in enumerate(lambdas):
        resid = A @ got[:, j] - lam * got[:, j]
        assert float(np.abs(resid).max()) < 1e-5, (j, lam, resid)


# ------------------------------------------------------------ constraint


def _constraint_brute(n, arcs, weights, directed):
    """Burt constraint straight from the formula (reference semantics:
    a[i,j]+a[j,i] tie strengths, ALL-degree denominator, NaN isolates)."""
    import numpy as np

    A = np.zeros((n, n))
    for (a, b), w in zip(arcs, weights):
        if a == b:
            continue
        A[a, b] += w
        if not directed:
            A[b, a] += w
    ab = A + A.T if directed else A
    s = ab.sum(axis=1)
    out = []
    for i in range(n):
        if s[i] == 0:
            out.append(float("nan"))
            continue
        p = ab[i] / s[i]
        c = 0.0
        for j in range(n):
            if ab[i, j] == 0 or j == i:
                continue
            ind = sum(
                p[q] * (ab[q, j] / s[q])
                for q in range(n)
                if q != i and q != j and s[q] > 0
            )
            c += (p[j] + ind) ** 2
        out.append(c)
    return out


@pytest.mark.parametrize("directed", [False, True])
def test_constraint_random(spark, directed):
    import math

    from xdata_igraph_spark.operators.centrality import constraint

    n = 12
    arcs = _random_arcs(n, 0.25, seed=13, directed=directed)
    weights = [1.0 + (h % 5) for h, _ in enumerate(arcs)]
    rows = [(a, b, w) for (a, b), w in zip(arcs, weights)]
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed, n=n,
    )
    got = {r["id"]: r["constraint"] for r in constraint(g, weighted=True).collect()}
    ref = _constraint_brute(n, arcs, weights, directed)
    for i in range(n):
        if math.isnan(ref[i]):
            assert math.isnan(got[i]), i
        else:
            assert got[i] == pytest.approx(ref[i], abs=1e-9), i


def test_constraint_star_known_values(spark):
    from xdata_igraph_spark.operators.centrality import constraint
    from xdata_igraph_spark.sources.generators import star

    g = star(spark, 5, mode="undirected")
    got = {r["id"]: r["constraint"] for r in constraint(g).collect()}
    assert got[0] == pytest.approx(0.25)       # center: 1/(n-1)
    for leaf in range(1, 5):
        assert got[leaf] == pytest.approx(1.0)


# ------------------------------------------------------------ unfold_tree


def test_unfold_tree_ring(spark):
    from xdata_igraph_spark.operators.paths import unfold_tree
    from xdata_igraph_spark.sources.generators import ring

    g = ring(spark, 4, directed=False)  # C4
    edges, vidx = unfold_tree(g, [0], mode="all")
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    # tree: (0,1), (1,2), (3,0); the 2-3 edge re-reaches 2 → copy 4
    assert got == {(0, 1), (1, 2), (3, 0), (4, 3)}
    idx = {r["new_id"]: r["orig_id"] for r in vidx.collect()}
    assert idx == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}


def test_unfold_tree_directed_diamond(spark):
    from xdata_igraph_spark.operators.paths import unfold_tree

    g = LinkGraph.from_pairs(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True, n=4
    )
    edges, vidx = unfold_tree(g, [0], mode="out")
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(0, 1), (0, 2), (1, 3), (2, 4)}
    idx = {r["new_id"]: r["orig_id"] for r in vidx.collect()}
    assert idx[4] == 3


def test_unfold_tree_forest(spark):
    from xdata_igraph_spark.operators.paths import unfold_tree

    g = LinkGraph.from_pairs(spark, [(0, 1), (2, 3)], directed=False, n=4)
    edges, vidx = unfold_tree(g, [0, 2], mode="all")
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(0, 1), (2, 3)}
    assert vidx.count() == 4  # identity only, no copies


# ------------------------------------------------------- all shortest paths


def test_get_all_shortest_paths_diamond(spark):
    from xdata_igraph_spark.operators.paths import get_all_shortest_paths

    g = LinkGraph.from_pairs(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], directed=True
    )
    rows = get_all_shortest_paths(g, 0).collect()
    by_target = defaultdict(set)
    for r in rows:
        by_target[r["target"]].add(tuple(r["path"]))
    assert by_target[3] == {(0, 1, 3), (0, 2, 3)}
    assert by_target[4] == {(0, 1, 3, 4), (0, 2, 3, 4)}
    assert by_target[0] == {(0,)}


def test_get_all_shortest_paths_vs_bruteforce(spark):
    from xdata_igraph_spark.operators.paths import get_all_shortest_paths

    n = 10
    arcs = _random_arcs(n, 0.3, seed=17, directed=True)
    adj = defaultdict(list)
    for a, b in arcs:
        adj[a].append(b)

    # brute-force: BFS distances then DFS over the geodesic DAG
    dist = {0: 0}
    q = deque([0])
    while q:
        v = q.popleft()
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)

    ref = defaultdict(set)

    def expand(path):
        h = path[-1]
        ref[h].add(tuple(path))
        for w in adj[h]:
            if dist.get(w) == dist[h] + 1:
                expand(path + [w])

    expand([0])
    got = defaultdict(set)
    for r in get_all_shortest_paths(g := LinkGraph.from_pairs(
        spark, arcs, directed=True, n=n
    ), 0).collect():
        got[r["target"]].add(tuple(r["path"]))
    # ref includes every prefix; keep only per-target full sets
    want = {t: {p for p in ps if p[-1] == t} for t, ps in ref.items()}
    assert dict(got) == {t: s for t, s in want.items() if s}


# --------------------------------------------------------- adjacency ctor


def test_from_adjacency_modes(spark):
    from xdata_igraph_spark.sources.generators import from_adjacency

    M = [
        [0, 2, 0],
        [1, 0, 1],
        [0, 0, 0],
    ]
    g = from_adjacency(spark, M, mode="directed")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 1), (1, 0), (1, 2)]
    g = from_adjacency(spark, M, mode="max")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 1), (1, 2)]
    g = from_adjacency(spark, M, mode="min")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1)]
    g = from_adjacency(spark, M, mode="plus")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1)] * 3 + [(1, 2)]
    g = from_adjacency(spark, M, mode="upper")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 1), (1, 2)]
    g = from_adjacency(spark, M, mode="lower")
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1)]


def test_from_weighted_adjacency_roundtrip(spark):
    from xdata_igraph_spark.sources.generators import from_weighted_adjacency

    M = [
        [0.0, 1.5, 0.0],
        [0.5, 0.0, 2.0],
        [0.0, 0.0, 3.0],
    ]
    g = from_weighted_adjacency(spark, M, mode="directed")
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == {(0, 1): 1.5, (1, 0): 0.5, (1, 2): 2.0, (2, 2): 3.0}
    adj = g.get_adjacency()
    cells = {(r[0], r[1]): r[2] for r in adj.collect()}
    assert cells[(0, 1)] == 1.5 or cells[(0, 1)] == 1  # sparse count or weight


# ------------------------------------------------------------ motifs


def test_motifs3_bruteforce(spark):
    from xdata_igraph_spark.operators.triangles import motifs_randesu_3

    n = 11
    arcs = _random_arcs(n, 0.3, seed=23, directed=False)
    es = set(arcs)
    paths = tris = 0
    for tri in itertools.combinations(range(n), 3):
        cnt = sum(
            1 for a, b in itertools.combinations(tri, 2)
            if (a, b) in es or (b, a) in es
        )
        if cnt == 2:
            paths += 1
        elif cnt == 3:
            tris += 1
    got = {r["isoclass"]: r["count"] for r in motifs_randesu_3(
        LinkGraph.from_pairs(spark, arcs, directed=False, n=n)
    ).collect()}
    assert math.isnan(got[0]) and math.isnan(got[1])
    assert got[2] == paths and got[3] == tris


# ------------------------------------------------------------ cliques


def _brute_cliques(n, edges):
    es = {frozenset(e) for e in edges}
    out = []
    for k in range(1, n + 1):
        found = False
        for combo in itertools.combinations(range(n), k):
            if all(frozenset(p) in es for p in itertools.combinations(combo, 2)):
                out.append(tuple(combo))
                found = True
        if not found and k > 2:
            break
    return set(out)


def test_cliques_bruteforce(spark):
    from xdata_igraph_spark.operators.cliques import (
        clique_number,
        cliques,
        maximal_cliques,
    )

    n = 11
    arcs = _random_arcs(n, 0.4, seed=31, directed=False)
    ref = _brute_cliques(n, arcs)
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=n)
    got = {tuple(r["members"]) for r in cliques(g, min_size=1).collect()}
    assert got == ref
    # maximal = cliques with no common neighbor of all members
    adj = defaultdict(set)
    for a, b in arcs:
        adj[a].add(b)
        adj[b].add(a)
    ref_max = {
        c for c in ref
        if not any(all(m in adj[w] for m in c) for w in range(n) if w not in c)
    }
    got_max = {tuple(r["members"]) for r in maximal_cliques(g).collect()}
    assert got_max == ref_max
    assert clique_number(g) == max(len(c) for c in ref)


def test_cliques_k4_fixture(spark):
    from xdata_igraph_spark.operators.cliques import cliques
    from xdata_igraph_spark.sources.generators import full

    g = full(spark, 5, directed=False)  # K5
    got = cliques(g, min_size=4, max_size=4).collect()
    assert len(got) == 5  # C(5,4)
    assert all(r["size"] == 4 for r in got)


# ------------------------------------------------------------ flow / bipartite


def test_maxflow_classic_fixture(spark):
    from xdata_igraph_spark.operators.flow import maxflow_value, st_mincut

    # CLRS-style network: maxflow(0→5) = 23
    rows = [
        (0, 1, 16.0), (0, 2, 13.0), (1, 2, 10.0), (2, 1, 4.0),
        (1, 3, 12.0), (3, 2, 9.0), (2, 4, 14.0), (4, 3, 7.0),
        (3, 5, 20.0), (4, 5, 4.0),
    ]
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=True, n=6,
    )
    assert maxflow_value(g, 0, 5) == pytest.approx(23.0)
    val, p1, cut = st_mincut(g, 0, 5)
    assert val == pytest.approx(23.0)
    cut_edges = {(r["src"], r["dst"]) for r in cut.collect()}
    caps = {(a, b): c for a, b, c in rows}
    assert sum(caps[e] for e in cut_edges) == pytest.approx(23.0)
    side1 = {r["id"] for r in p1.collect()}
    assert 0 in side1 and 5 not in side1


def test_maxflow_undirected_path(spark):
    from xdata_igraph_spark.operators.flow import maxflow_value

    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    assert maxflow_value(g, 0, 2) == pytest.approx(1.0)


def test_is_bipartite(spark):
    from xdata_igraph_spark.operators.components import is_bipartite
    from xdata_igraph_spark.sources.generators import ring, star

    ok, types = is_bipartite(ring(spark, 6, directed=False))
    assert ok
    tmap = {r["id"]: r["type"] for r in types.collect()}
    assert all(tmap[i] != tmap[(i + 1) % 6] for i in range(6))
    ok, _ = is_bipartite(ring(spark, 5, directed=False))
    assert not ok  # odd cycle
    ok, _ = is_bipartite(star(spark, 7, mode="undirected"))
    assert ok
    # two components: C4 + odd triangle → not bipartite
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 4)],
        directed=False, n=7,
    )
    ok, _ = is_bipartite(g)
    assert not ok


def test_cliques_level_guard_raises_on_dense_blowup(spark):
    from xdata_igraph_spark.operators.cliques import cliques

    # K7: level 3 holds C(7,3)=35 triangles > the tiny guard
    n = 7
    rows = [(a, b, 1.0) for a in range(n) for b in range(n) if a < b]
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=False, n=n,
    )
    with pytest.raises(ValueError, match="max_level_rows"):
        cliques(g, min_size=2, max_level_rows=30).collect()


def test_connectivity_famous_values(spark):
    """Reference test style (tests/flow*.at): known κ/λ on named graphs."""
    from xdata_igraph_spark.operators.flow import (
        edge_connectivity,
        mincut_value,
        vertex_connectivity,
    )
    from xdata_igraph_spark.sources.generators import famous, full, ring

    pet = famous(spark, "petersen")
    assert vertex_connectivity(pet) == 3
    assert edge_connectivity(pet) == 3

    r6 = ring(spark, 6)
    assert vertex_connectivity(r6) == 2
    assert edge_connectivity(r6) == 2

    k5 = full(spark, 5)
    assert vertex_connectivity(k5) == 4
    assert edge_connectivity(k5) == 4

    # path 0-1-2: cut vertex 1 / bridge edges
    p3 = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    assert vertex_connectivity(p3) == 1
    assert edge_connectivity(p3) == 1

    # weighted global mincut: dumbbell with a light bridge
    rows = [(0, 1, 5.0), (1, 2, 5.0), (2, 0, 5.0),
            (3, 4, 5.0), (4, 5, 5.0), (5, 3, 5.0), (0, 3, 2.0)]
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=False, n=6,
    )
    assert mincut_value(g) == pytest.approx(2.0)

    # disconnected → 0
    d = LinkGraph.from_pairs(spark, [(0, 1), (2, 3)], directed=False, n=4)
    assert edge_connectivity(d) == 0
    assert vertex_connectivity(d) == 0


def test_spectral_embedding_krylov_bulk_pair(spark):
    """Snapshot-Krylov mode (r5): a 2nd eigenvalue at the edge of a
    near-degenerate bulk — where plain subspace iteration stalls —
    must still come out accurate. Fixture: ER-ish dense graph whose
    spectrum has one separated eigenvalue plus a tight bulk."""
    import numpy as np

    from xdata_igraph_spark.operators.embedding import (
        adjacency_spectral_embedding,
        eigenpair_residuals,
    )

    rng = np.random.default_rng(99)
    n = 120
    arcs = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.3
    ]
    g = LinkGraph.from_pairs(spark, arcs, directed=False, n=n)
    A = np.zeros((n, n))
    for a, b in arcs:
        A[a, b] = A[b, a] = 1.0
    w = np.linalg.eigvalsh(A)
    ref = w[np.argsort(-np.abs(w))[:2]]

    X, lambdas = adjacency_spectral_embedding(
        g, no=2, max_iter=50, tol=0.0, krylov_snapshots=8
    )
    assert np.allclose(
        sorted(np.abs(lambdas), reverse=True),
        sorted(np.abs(ref), reverse=True),
        rtol=1e-3,
    ), (lambdas, ref)
    # a-posteriori certificate: small per-vertex residual on both pairs
    res = eigenpair_residuals(g, X, lambdas)
    row = res.agg(F.max("r_x0"), F.max("r_x1")).first()
    assert row[0] <= 1e-6 * abs(lambdas[0])
    assert row[1] <= 1e-2 * abs(lambdas[1])
