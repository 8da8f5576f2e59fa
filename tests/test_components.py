from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.components import (
    component_sizes,
    is_connected,
    scc,
    wcc,
)

from tests.fixtures import SCC_EDGES, SCC_EXPECTED, SCC_N, WCC_EDGES, WCC_EXPECTED, WCC_N
from tests.oracles import gnm_edges, scc_oracle, wcc_oracle


def _membership(df, n):
    rows = {r["id"]: r["component"] for r in df.collect()}
    return [rows[i] for i in range(n)]


def test_wcc_fixture(spark):
    """FIXTURES.md §3.3 — numbering = rank of component's min vertex id
    (bit-exact with igraph_clusters_weak scan order)."""
    g = LinkGraph.from_pairs(spark, WCC_EDGES, directed=False, n=WCC_N)
    assert _membership(wcc(g), WCC_N) == WCC_EXPECTED


def test_wcc_directed_ignores_direction(spark):
    g = LinkGraph.from_pairs(spark, [(1, 0), (2, 1), (4, 3)], directed=True, n=5)
    assert _membership(wcc(g), 5) == [0, 0, 0, 1, 1]


def test_wcc_sizes_and_connected(spark):
    g = LinkGraph.from_pairs(spark, WCC_EDGES, directed=False, n=WCC_N)
    sizes = {r["component"]: r["csize"] for r in component_sizes(wcc(g)).collect()}
    assert sizes == {0: 3, 1: 3, 2: 1}
    assert not is_connected(g)
    g2 = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    assert is_connected(g2)


def test_wcc_gnm_vs_oracle(spark):
    n, m = 500, 700  # sparse → several components
    edges = gnm_edges(n, m, directed=False)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    assert _membership(wcc(g), n) == wcc_oracle(n, edges)


def test_scc_fixture(spark):
    g = LinkGraph.from_pairs(spark, SCC_EDGES, directed=True, n=SCC_N)
    assert _membership(scc(g), SCC_N) == SCC_EXPECTED


def test_scc_path_all_singletons(spark):
    """A directed path is all singleton SCCs — resolved entirely by the
    trim phase."""
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 3)], directed=True, n=4)
    assert _membership(scc(g), 4) == [0, 1, 2, 3]


def test_scc_gnm_vs_oracle(spark):
    n, m = 200, 400
    edges = gnm_edges(n, m, directed=True)
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=n)
    assert _membership(scc(g), n) == scc_oracle(n, edges)
