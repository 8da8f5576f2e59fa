"""Round-4 operators: Johnson all-pairs, Gomory-Hu tree, graphdb IO."""

import itertools
import os

import pytest

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
