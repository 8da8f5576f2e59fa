"""Round-4 operators: Johnson all-pairs, Gomory-Hu tree, graphdb IO."""

import itertools
import os

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _floyd_warshall(n, arcs):
    INF = float("inf")
    d = [[0.0 if i == j else INF for j in range(n)] for i in range(n)]
    for u, v, w in arcs:
        d[u][v] = min(d[u][v], w)
    for k in range(n):
        for i in range(n):
            for j in range(n):
                if d[i][k] + d[k][j] < d[i][j]:
                    d[i][j] = d[i][k] + d[k][j]
    return d


def _wdf(spark, rows, n, directed=True):
    return LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        n=n,
    )


def test_johnson_negative_weights(spark):
    """Negative arcs, no negative cycle — matches Floyd-Warshall."""
    from xdata_igraph_spark.operators.paths import johnson_all_pairs

    rows = [
        (0, 1, 3.0), (0, 2, 8.0), (0, 4, -4.0),
        (1, 3, 1.0), (1, 4, 7.0),
        (2, 1, 4.0),
        (3, 0, 2.0), (3, 2, -5.0),
        (4, 3, 6.0),
    ]  # CLRS 25.1 example
    n = 5
    g = _wdf(spark, rows, n)
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in johnson_all_pairs(g).collect()
    }
    want = _floyd_warshall(n, rows)
    for i in range(n):
        for j in range(n):
            assert got[(i, j)] == pytest.approx(want[i][j]), (i, j)


def test_johnson_negative_cycle_raises(spark):
    from xdata_igraph_spark.operators.paths import johnson_all_pairs

    g = _wdf(spark, [(0, 1, 1.0), (1, 2, -3.0), (2, 0, 1.0)], 3)
    with pytest.raises(ValueError, match="negative cycle"):
        johnson_all_pairs(g).collect()

    # undirected negative edge is a negative cycle by definition
    gu = _wdf(spark, [(0, 1, -1.0)], 2, directed=False)
    with pytest.raises(ValueError, match="negative"):
        johnson_all_pairs(gu).collect()


def test_johnson_nonneg_matches_bellman_ford(spark):
    """With nonnegative weights the reweighting is a no-op: results must
    equal the plain weighted shortest_paths."""
    import random

    from xdata_igraph_spark.operators.paths import (
        johnson_all_pairs,
        shortest_paths,
    )

    rng = random.Random(7)
    n = 12
    rows = [
        (u, v, float(rng.randint(1, 9)))
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < 0.3
    ]
    g = _wdf(spark, rows, n)
    a = {
        (r["source"], r["id"]): r["dist"]
        for r in johnson_all_pairs(g).collect()
    }
    b = {
        (r["source"], r["id"]): r["dist"]
        for r in shortest_paths(g, weighted=True).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k]), k


def test_gomory_hu_tree_min_edge_equals_mincut(spark):
    """Tree property: min edge weight on the tree path u..v equals the
    u-v max-flow in the input (checked for every pair)."""
    import random

    from xdata_igraph_spark.operators.flow import gomory_hu_tree, maxflow_value

    rng = random.Random(13)
    n = 8
    rows = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < 0.5:
                rows.append((u, v, float(rng.randint(1, 8))))
    # ensure connectivity via a ring
    for u in range(n):
        rows.append((u, (u + 1) % n, float(rng.randint(1, 8))))
    g = _wdf(spark, rows, n, directed=False)

    tree = gomory_hu_tree(g).collect()
    assert len(tree) == n - 1
    adj = {}
    for r in tree:
        adj.setdefault(r["src"], []).append((r["dst"], r["weight"]))
        adj.setdefault(r["dst"], []).append((r["src"], r["weight"]))

    def tree_min_edge(s, t):
        # DFS on the n-1-edge tree
        stack = [(s, float("inf"), None)]
        while stack:
            node, mn, par = stack.pop()
            if node == t:
                return mn
            for nxt, w in adj.get(node, []):
                if nxt != par:
                    stack.append((nxt, min(mn, w), node))
        return None

    for s, t in itertools.combinations(range(n), 2):
        assert tree_min_edge(s, t) == pytest.approx(
            maxflow_value(g, s, t)
        ), (s, t)


def test_gomory_hu_requires_undirected(spark):
    from xdata_igraph_spark.operators.flow import gomory_hu_tree

    g = _wdf(spark, [(0, 1, 1.0)], 2, directed=True)
    with pytest.raises(ValueError, match="undirected"):
        gomory_hu_tree(g)


def test_graphdb_roundtrip(spark, tmp_path):
    from xdata_igraph_spark.sources.foreign import read_graphdb, write_graphdb

    edges = [(0, 1), (0, 11), (1, 2), (2, 3), (3, 0), (11, 5), (5, 5)]
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=12)
    p = os.path.join(tmp_path, "g.gdb")
    write_graphdb(g, p)
    g2 = read_graphdb(spark, p, directed=True)
    assert g2.vcount() == 12
    got = sorted(
        (r["src"], r["dst"]) for r in g2.edges.select("src", "dst").collect()
    )
    assert got == sorted(edges)


def test_graphdb_known_bytes(spark, tmp_path):
    """Hand-encoded file: 3 nodes; node0 → {1,2}, node1 → {2}, node2 → {}."""
    import struct

    from xdata_igraph_spark.sources.foreign import read_graphdb

    words = [3, 2, 1, 2, 1, 2, 0]
    p = os.path.join(tmp_path, "k.gdb")
    with open(p, "wb") as f:
        f.write(struct.pack(f"<{len(words)}H", *words))
    g = read_graphdb(spark, p, directed=True)
    assert g.vcount() == 3
    got = sorted(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_graphdb_truncated_raises(spark, tmp_path):
    import struct

    from xdata_igraph_spark.sources.foreign import read_graphdb

    p = os.path.join(tmp_path, "t.gdb")
    with open(p, "wb") as f:
        f.write(struct.pack("<3H", 3, 2, 1))  # node0 promises 2 targets, has 1
    with pytest.raises(ValueError, match="Truncated"):
        read_graphdb(spark, p)


def test_motifs_randesu_sample_full_equals_census(spark):
    """cut_prob = 0 must reproduce the exact full census."""
    from xdata_igraph_spark.operators.triangles import (
        motifs_randesu_3,
        motifs_randesu_3_sample,
    )
    from xdata_igraph_spark.sources.generators import famous

    z = famous(spark, "zachary")
    full = {r["isoclass"]: r["count"] for r in motifs_randesu_3(z).collect()}
    samp = {
        r["isoclass"]: r["count"]
        for r in motifs_randesu_3_sample(z, (0.0, 0.0, 0.0)).collect()
    }
    assert samp[2] == full[2] and samp[3] == full[3]
    assert full[3] == 45.0  # zachary triangles


def test_motifs_randesu_sample_root_cut_exact(spark):
    """With only the root coin active, counts must equal the brute-force
    census restricted to triples whose minimum vertex passed the coin —
    an exact check of the ESU decomposition (root = min vertex)."""
    import itertools as it

    from pyspark.sql import functions as F

    from xdata_igraph_spark.operators.triangles import motifs_randesu_3_sample
    from xdata_igraph_spark.sources.generators import famous

    z = famous(spark, "zachary")
    p0, seed, res = 0.6, 42, 1 << 24
    # replicate the level-0 hash coin for every vertex
    ids = spark.range(34).select(F.col("id"))
    passed = {
        r["id"]
        for r in ids.filter(
            (F.abs(F.xxhash64(F.lit(seed), F.lit(0), F.col("id"))) % res)
            / float(res)
            >= p0
        ).collect()
    }
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in z.edges.select("src", "dst").collect()
    }

    def connected(tri):
        e = [tuple(sorted(p)) in edges for p in it.combinations(tri, 2)]
        return sum(e) >= 2

    want_path = want_tri = 0
    for tri in it.combinations(range(34), 3):
        if min(tri) not in passed or not connected(tri):
            continue
        ne = sum(tuple(sorted(p)) in edges for p in it.combinations(tri, 2))
        if ne == 3:
            want_tri += 1
        else:
            want_path += 1

    got = {
        r["isoclass"]: r["count"]
        for r in motifs_randesu_3_sample(z, (p0, 0.0, 0.0), seed=seed).collect()
    }
    assert got[3] == float(want_tri)
    assert got[2] == float(want_path)
    assert 0 < got[3] < 45.0  # genuinely sampled


def test_motifs_randesu_sample_deterministic_and_monotone(spark):
    from xdata_igraph_spark.operators.triangles import motifs_randesu_3_sample
    from xdata_igraph_spark.sources.generators import famous

    z = famous(spark, "zachary")

    def counts(p, seed=42):
        return {
            r["isoclass"]: r["count"]
            for r in motifs_randesu_3_sample(z, p, seed=seed).collect()
        }

    a = counts((0.3, 0.3, 0.3))
    b = counts((0.3, 0.3, 0.3))
    assert (a[2], a[3]) == (b[2], b[3])  # same seed → identical
    heavy = counts((0.8, 0.5, 0.5))
    assert heavy[2] <= a[2] or heavy[3] <= a[3]


def _path_of_cliques(spark, n_cliques=4, size=5):
    """A PATH (not ring) of cliques: the ring's rotational symmetry makes
    the leading eigenvalue degenerate, and any vector in that eigenspace
    — including the one ARPACK would return in the reference — may cut
    through cliques. The path has a simple leading eigenvalue, so exact
    clique recovery is well-defined."""
    edges = []
    for c in range(n_cliques):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((base + i, base + j))
        if c + 1 < n_cliques:
            edges.append((base + size - 1, (c + 1) * size))
    return LinkGraph.from_pairs(
        spark, edges, directed=False, n=n_cliques * size
    )


def test_leading_eigenvector_path_of_cliques(spark):
    """Each clique must land in its own community (verified non-degenerate
    in numpy: top eigenvalues 4.174 > 3.952; recursion stops at pure
    cliques because their restricted B has leading eigenvalue 0)."""
    from xdata_igraph_spark.operators.leading_eigenvector import (
        leading_eigenvector_communities,
    )

    g = _path_of_cliques(spark)
    got = {
        r["id"]: r["label"]
        for r in leading_eigenvector_communities(g).collect()
    }
    assert len(got) == 20
    for c in range(4):
        labels = {got[c * 5 + i] for i in range(5)}
        assert len(labels) == 1, f"clique {c} split: {labels}"
    assert len({got[c * 5] for c in range(4)}) == 4


def test_leading_eigenvector_karate_modularity(spark):
    """Newman 2006 reports Q≈0.393 on the karate club with this method;
    require a comfortably-positive Q and determinism."""
    from xdata_igraph_spark.operators.leading_eigenvector import (
        leading_eigenvector_communities,
    )
    from xdata_igraph_spark.operators.lpa import modularity
    from xdata_igraph_spark.sources.generators import famous

    z = famous(spark, "zachary")
    memb = leading_eigenvector_communities(z)
    q = modularity(z, memb.select("id", F.col("label").alias("comm")))
    assert q >= 0.35, q
    again = leading_eigenvector_communities(z)
    a = {(r["id"], r["label"]) for r in memb.collect()}
    b = {(r["id"], r["label"]) for r in again.collect()}
    assert a == b


def test_graphdb_out_of_range_target_raises(spark, tmp_path):
    import struct

    from xdata_igraph_spark.sources.foreign import read_graphdb

    # 2 vertices; vertex 0 declares an edge to vertex 7 (>= n)
    p = os.path.join(tmp_path, "bad.gdb")
    with open(p, "wb") as f:
        f.write(struct.pack("<5H", 2, 1, 7, 0, 0))
    with pytest.raises(ValueError, match=">= vertex count"):
        read_graphdb(spark, p)


def test_johnson_unconverged_max_iter_raises(spark):
    from xdata_igraph_spark.operators.paths import johnson_all_pairs

    # negative chain longer than max_iter: potentials can't settle in 2
    # rounds; must raise rather than silently clamp reweighted arcs
    edges = [(i, i + 1, -1.0) for i in range(6)]
    g = LinkGraph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=True,
        n=7,
    )
    with pytest.raises(ValueError, match="did not converge"):
        johnson_all_pairs(g, max_iter=2)
