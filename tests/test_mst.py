"""Minimum spanning tree vs a Kruskal union-find oracle."""

import random

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.mst import minimum_spanning_tree, mst_total_weight
from xdata_igraph_spark.sources.generators import ring


def kruskal_weight(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, used = 0.0, 0
    for u, v, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            used += 1
    return total, used


def test_ring_drops_heaviest(spark):
    edges = [(i, (i + 1) % 6, float(i + 1)) for i in range(6)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=6)
    rows = minimum_spanning_tree(g).collect()
    assert len(rows) == 5
    weights = sorted(r["weight"] for r in rows)
    assert weights == [1.0, 2.0, 3.0, 4.0, 5.0]  # heaviest (6.0) dropped


def test_random_graph_matches_kruskal(spark):
    rng = random.Random(11)
    n = 40
    edges = []
    seen = set()
    while len(edges) < 150:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((u, v, round(rng.uniform(0.5, 9.5), 3)))
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    tree = minimum_spanning_tree(g).collect()
    want_total, want_edges = kruskal_weight(n, edges)
    assert len(tree) == want_edges
    assert abs(sum(r["weight"] for r in tree) - want_total) < 1e-9
    # the tree spans: its edge set connects every vertex kruskal reaches
    tn, tedges = kruskal_weight(
        n, [(int(r["src"]), int(r["dst"]), float(r["weight"])) for r in tree]
    )
    assert tedges == want_edges and abs(tn - want_total) < 1e-9


def test_forest_on_disconnected(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0), (3, 4, 1.0)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=5)
    rows = minimum_spanning_tree(g).collect()
    assert len(rows) == 3  # 5 vertices, 2 components
    assert abs(sum(r["weight"] for r in rows) - 4.0) < 1e-12


def test_unweighted_counts_edges(spark):
    g = ring(spark, 10, directed=False)
    assert mst_total_weight(g) == 9.0


def test_chain_worst_case(spark):
    # monotone path weights make every component hook leftward in
    # round 1 — the pointer-jumping regression case
    n = 33
    edges = [(i, i + 1, float(i)) for i in range(n - 1)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    rows = minimum_spanning_tree(g).collect()
    assert len(rows) == n - 1
    assert sum(r["weight"] for r in rows) == sum(range(n - 1))
