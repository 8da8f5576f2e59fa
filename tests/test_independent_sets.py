"""Independent sets (complement-of-cliques, mirroring the reference)."""

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.cliques import (
    independence_number,
    independent_vertex_sets,
    largest_cliques,
    largest_independent_vertex_sets,
    maximal_independent_vertex_sets,
)
from xdata_igraph_spark.sources.generators import full, ring


def members(df):
    return sorted(tuple(r["members"]) for r in df.collect())


def test_ring5_independence(spark):
    g = ring(spark, 5, directed=False)
    assert independence_number(g) == 2
    best = members(largest_independent_vertex_sets(g))
    assert best == [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4)]


def test_ring6_maximal_sets(spark):
    g = ring(spark, 6, directed=False)
    assert independence_number(g) == 3
    mx = members(maximal_independent_vertex_sets(g))
    # C6 maximal independent sets: the two alternating triples and the
    # six opposite pairs
    assert (0, 2, 4) in mx and (1, 3, 5) in mx
    assert all(len(m) in (2, 3) for m in mx)
    assert len(mx) == 5  # {0,2,4},{1,3,5},{0,3},{1,4},{2,5}


def test_complete_graph_singletons(spark):
    g = full(spark, 4, directed=False)
    assert independence_number(g) == 1
    assert members(largest_independent_vertex_sets(g)) == [
        (0,), (1,), (2,), (3,)
    ]


def test_independent_sets_sizes(spark):
    g = ring(spark, 5, directed=False)
    sets2 = members(independent_vertex_sets(g, min_size=2, max_size=2))
    assert sets2 == [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4)]


def test_largest_cliques(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=4)
    assert members(largest_cliques(g)) == [(0, 1, 2)]
