"""Articulation points / bridges / biconnected components vs removal oracle."""

import random

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.biconnected import (
    articulation_points,
    biconnected_components,
    bridges,
)
from xdata_igraph_spark.sources.generators import ring


def n_components(n, edges, skip_vertex=None, skip_edge=None):
    adj = {v: set() for v in range(n) if v != skip_vertex}
    for u, v in edges:
        if u == v or skip_vertex in (u, v):
            continue
        if skip_edge and (min(u, v), max(u, v)) == skip_edge:
            continue
        adj[u].add(v)
        adj[v].add(u)
    seen, comps = set(), 0
    for s in adj:
        if s in seen:
            continue
        comps += 1
        stack = [s]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj[x] - seen)
    return comps


def brute_aps(n, edges):
    base = n_components(n, edges)
    # removing a non-cut vertex never raises the count (an isolated
    # vertex lowers it); strictly more components == articulation
    return {
        v
        for v in range(n)
        if n_components(n, edges, skip_vertex=v) > base
    }


def brute_bridges(n, edges):
    base = n_components(n, edges)
    uniq = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    multi = {
        e
        for e in uniq
        if sum(1 for u, v in edges if (min(u, v), max(u, v)) == e) > 1
    }
    return {
        e
        for e in uniq - multi
        if n_components(n, edges, skip_edge=e) > base
    }


def test_path_graph(spark):
    e = [(0, 1), (1, 2), (2, 3)]
    g = LinkGraph.from_pairs(spark, e, directed=False, n=4)
    assert {r["id"] for r in articulation_points(g).collect()} == {1, 2}
    assert {(r["src"], r["dst"]) for r in bridges(g).collect()} == {
        (0, 1), (1, 2), (2, 3)
    }
    comps = biconnected_components(g).collect()
    assert len({r["component"] for r in comps}) == 3


def test_ring_has_no_cuts(spark):
    g = ring(spark, 5, directed=False)
    assert articulation_points(g).count() == 0
    assert bridges(g).count() == 0
    comps = biconnected_components(g).collect()
    assert len({r["component"] for r in comps}) == 1
    assert len(comps) == 5


def test_barbell(spark):
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = LinkGraph.from_pairs(spark, e, directed=False, n=6)
    assert {r["id"] for r in articulation_points(g).collect()} == {2, 3}
    assert {(r["src"], r["dst"]) for r in bridges(g).collect()} == {(2, 3)}
    comps = biconnected_components(g).collect()
    by_comp = {}
    for r in comps:
        by_comp.setdefault(r["component"], set()).add((r["src"], r["dst"]))
    assert sorted(len(s) for s in by_comp.values()) == [1, 3, 3]


def test_multi_edge_not_bridge(spark):
    e = [(0, 1), (0, 1), (1, 2)]
    g = LinkGraph.from_pairs(spark, e, directed=False, n=3)
    assert {(r["src"], r["dst"]) for r in bridges(g).collect()} == {(1, 2)}
    assert {r["id"] for r in articulation_points(g).collect()} == {1}


def test_random_graph_matches_removal_oracle(spark):
    rng = random.Random(23)
    n = 30
    edges = []
    for _ in range(40):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.append((u, v))
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    assert {r["id"] for r in articulation_points(g).collect()} == brute_aps(
        n, edges
    )
    assert {
        (r["src"], r["dst"]) for r in bridges(g).collect()
    } == brute_bridges(n, edges)
    # biconnected components partition the distinct non-loop edges
    comps = biconnected_components(g).collect()
    uniq = {(min(u, v), max(u, v)) for u, v in edges}
    assert {(r["src"], r["dst"]) for r in comps} == uniq
    assert len(comps) == len(uniq)


def test_guard(spark):
    g = ring(spark, 10, directed=False)
    with pytest.raises(ValueError, match="refusing"):
        articulation_points(g, max_edges=5)
