"""Walktrap communities."""

import pytest

from tests.fixtures import ZACHARY_EDGES, ZACHARY_N
from tests.test_greedy_communities import membership_groups, ring_of_cliques
from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import modularity
from xdata_igraph_spark.operators.walktrap import community_walktrap


def test_walktrap_ring_of_cliques(spark):
    n, edges = ring_of_cliques(k=4, size=5)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    mem = community_walktrap(g)
    groups = membership_groups(mem)
    assert groups == [set(range(c * 5, c * 5 + 5)) for c in range(4)]


def test_walktrap_karate_quality(spark):
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    mem, info = community_walktrap(g, return_details=True)
    # published walktrap(t=4) karate cut: Q ≈ 0.353 (Pons-Latapy 2005);
    # assert the quality band rather than the exact split (tie order
    # deviates from the reference's heap, documented)
    assert info["modularity"] >= 0.34
    assert 2 <= mem.select("label").distinct().count() <= 6
    assert abs(modularity(g, mem, weighted=False) - info["modularity"]) < 1e-9


def test_walktrap_two_triangles_bridge(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=6)
    mem = community_walktrap(g)
    assert membership_groups(mem) == [{0, 1, 2}, {3, 4, 5}]


def test_walktrap_guard(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    with pytest.raises(ValueError, match="guarded"):
        community_walktrap(g, max_vertices=2)
