"""Menger wrappers: edge/vertex disjoint paths, st connectivity, adhesion/cohesion."""

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.flow import (
    adhesion,
    cohesion,
    edge_disjoint_paths,
    st_edge_connectivity,
    st_vertex_connectivity,
    vertex_disjoint_paths,
)
from xdata_igraph_spark.sources.generators import famous, full, ring


def test_ring_two_disjoint_paths(spark):
    g = ring(spark, 6, directed=False)
    assert edge_disjoint_paths(g, 0, 3) == 2
    assert vertex_disjoint_paths(g, 0, 3) == 2
    assert st_edge_connectivity(g, 0, 3) == 2
    assert st_vertex_connectivity(g, 0, 3) == 2


def test_full_graph_adjacent_endpoints(spark):
    g = full(spark, 5, directed=False)
    assert edge_disjoint_paths(g, 0, 1) == 4
    # adjacent: 3 internal paths + the direct edge
    assert vertex_disjoint_paths(g, 0, 1) == 4
    with pytest.raises(ValueError, match="adjacent"):
        st_vertex_connectivity(g, 0, 1)
    assert st_vertex_connectivity(g, 0, 1, neighbors="infinity") > 10**6
    assert st_vertex_connectivity(g, 0, 1, neighbors="ignore") == 3
    assert adhesion(g) == 4
    assert cohesion(g) == 4


def test_petersen_three_connected(spark):
    g = famous(spark, "petersen")
    # 0 and 5 are adjacent in the standard numbering; pick non-adjacent 0,6
    assert vertex_disjoint_paths(g, 0, 6) == 3
    assert edge_disjoint_paths(g, 0, 6) == 3
    assert adhesion(g) == 3
    assert cohesion(g) == 3


def test_multi_edges_count_separately(spark):
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (0, 1), (0, 2), (2, 1)], directed=False, n=3
    )
    assert edge_disjoint_paths(g, 0, 1) == 3
    # reference adds exactly 1 for the direct connection(s)
    assert vertex_disjoint_paths(g, 0, 1) == 2


def test_directed_asymmetry(spark):
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (1, 2), (0, 2)], directed=True, n=3
    )
    assert edge_disjoint_paths(g, 0, 2) == 2
    assert vertex_disjoint_paths(g, 0, 2) == 2
    assert edge_disjoint_paths(g, 2, 0) == 0
    assert vertex_disjoint_paths(g, 2, 0) == 0


def test_source_equals_target_raises(spark):
    g = ring(spark, 4, directed=False)
    with pytest.raises(ValueError, match="source"):
        edge_disjoint_paths(g, 1, 1)
    with pytest.raises(ValueError, match="source"):
        vertex_disjoint_paths(g, 1, 1)
