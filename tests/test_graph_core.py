import math

from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.select("src", "dst").collect()}


def test_degree_modes(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (0, 2), (1, 2), (2, 0)], directed=True, n=4)
    out = {r["id"]: r["degree"] for r in g.degrees("out").collect()}
    assert out == {0: 2, 1: 1, 2: 1, 3: 0}
    inn = {r["id"]: r["degree"] for r in g.degrees("in").collect()}
    assert inn == {0: 1, 1: 1, 2: 2, 3: 0}
    alld = {r["id"]: r["degree"] for r in g.degrees("all").collect()}
    assert alld == {0: 3, 1: 2, 2: 3, 3: 0}


def test_degree_loops_flag(spark):
    """igraph_degree: loops=False excludes self-loops; loops=True counts
    a loop twice in 'all' mode (src/type_indexededgelist.c:935-1030)."""
    g = LinkGraph.from_pairs(spark, [(0, 0), (0, 1)], directed=False, n=2)
    with_loops = {r["id"]: r["degree"] for r in g.degrees("all", loops=True).collect()}
    assert with_loops == {0: 3, 1: 1}
    no_loops = {r["id"]: r["degree"] for r in g.degrees("all", loops=False).collect()}
    assert no_loops == {0: 1, 1: 1}


def test_strength(spark):
    g = LinkGraph.from_pairs(
        spark, [(0, 1, 2.5), (0, 2, 1.0), (1, 2, 4.0)], directed=True, n=3
    )
    s = {r["id"]: r["strength"] for r in g.strength("out").collect()}
    assert s == {0: 3.5, 1: 4.0, 2: 0.0}


def test_simplify_collapse(spark):
    """igraph_simplify: loops dropped, multi-edges combined
    (src/structural_properties.c:2161-2300); undirected edges
    canonicalized src>=dst (src/type_indexededgelist.c:280-286)."""
    g = LinkGraph.from_pairs(
        spark,
        [(0, 1, 1.0), (1, 0, 2.0), (1, 1, 9.0), (1, 2, 3.0)],
        directed=False,
        n=3,
    )
    s = g.simplify(combiner="sum")
    rows = {(r["src"], r["dst"]): r["weight"] for r in s.edges.collect()}
    assert rows == {(1, 0): 3.0, (2, 1): 3.0}


def test_density_and_maxdegree(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0)], directed=False, n=3)
    assert abs(g.density() - 1.0) < 1e-12
    assert g.maxdegree() == 2


def test_reciprocity(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 0), (1, 2)], directed=True, n=3)
    assert abs(g.reciprocity() - 2.0 / 3.0) < 1e-12


def test_are_connected_and_neighbors(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=True, n=3)
    assert g.are_connected(0, 1)
    assert not g.are_connected(1, 0)
    und = LinkGraph.from_pairs(spark, [(0, 1)], directed=False, n=2)
    assert und.are_connected(1, 0)
    nb = {r["id"] for r in g.neighbors(1, "out").collect()}
    assert nb == {2}


def test_set_operations(spark):
    g1 = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=True, n=3)
    g2 = LinkGraph.from_pairs(spark, [(1, 2), (2, 0)], directed=True, n=3)
    assert _pairs(g1.union(g2).edges) == {(0, 1), (1, 2), (2, 0)}
    assert _pairs(g1.intersection(g2).edges) == {(1, 2)}
    assert _pairs(g1.difference(g2).edges) == {(0, 1)}
    dj = g1.disjoint_union(g2)
    assert _pairs(dj.edges) == {(0, 1), (1, 2), (4, 5), (5, 3)}
    assert dj.vcount() == 6


def test_compose(spark):
    """igraph_compose = relational equi-join (src/operators.c:1114)."""
    g1 = LinkGraph.from_pairs(spark, [(0, 1), (2, 1)], directed=True, n=3)
    g2 = LinkGraph.from_pairs(spark, [(1, 2)], directed=True, n=3)
    assert _pairs(g1.compose(g2).edges) == {(0, 2), (2, 2)}


def test_complementer(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1)], directed=False, n=3)
    comp = g.complementer()
    assert _pairs(comp.edges) == {(2, 0), (2, 1)}


def test_induced_subgraph_and_delete(spark):
    g = LinkGraph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0)], directed=True, n=4
    )
    sub = g.induced_subgraph([0, 1, 2])
    assert _pairs(sub.edges) == {(0, 1), (1, 2)}
    dele = g.delete_vertices([3])
    assert _pairs(dele.edges) == {(0, 1), (1, 2)}
    assert dele.vcount() == 3


def test_renumber(spark):
    g = LinkGraph.from_pairs(spark, [(10, 20), (20, 30)], directed=True)
    newg, mapping = g.renumber()
    assert _pairs(newg.edges) == {(0, 1), (1, 2)}
    mp = {r["id"]: r["new_id"] for r in mapping.collect()}
    assert mp == {10: 0, 20: 1, 30: 2}


def test_to_undirected_to_directed(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1, 1.0), (1, 0, 2.0)], directed=True, n=2)
    und = g.to_undirected(combiner="sum")
    rows = {(r["src"], r["dst"]): r["weight"] for r in und.edges.collect()}
    assert rows == {(1, 0): 3.0}
    back = und.to_directed(mutual=True)
    assert _pairs(back.edges) == {(1, 0), (0, 1)}


def test_contract_vertices(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 3)], directed=False, n=4)
    mapping = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, new_id long"
    )
    c = g.contract_vertices(mapping)
    assert _pairs(c.edges) == {(0, 0), (0, 1), (1, 1)}


def test_stochastic_edges(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1, 1.0), (0, 2, 3.0)], directed=True, n=3)
    p = {(r["src"], r["dst"]): r["p"] for r in g.stochastic_edges().collect()}
    assert abs(p[(0, 1)] - 0.25) < 1e-12 and abs(p[(0, 2)] - 0.75) < 1e-12


def test_count_multiple_and_mutual(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (0, 1), (1, 0), (1, 2)], directed=True, n=3)
    mult = {
        (r["src"], r["dst"]): r["multiplicity"] for r in g.count_multiple().collect()
    }
    assert mult[(0, 1)] == 2 and mult[(1, 0)] == 1 and mult[(1, 2)] == 1
    mut = {(r["src"], r["dst"]): r["mutual"] for r in g.is_mutual().distinct().collect()}
    assert mut[(0, 1)] and mut[(1, 0)] and not mut[(1, 2)]


def test_empty_graph(spark):
    g = LinkGraph.empty(spark, 5, directed=False)
    assert g.vcount() == 5 and g.ecount() == 0
    assert math.isnan(g.density()) is False  # n(n-1)/2 = 10 → 0.0
    assert g.density() == 0.0
