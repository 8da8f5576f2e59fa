from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.kcore import coreness, k_core_subgraph

from tests.fixtures import KCORE_EDGES, KCORE_EXPECTED, KCORE_N


def test_coreness_fixture(spark):
    """interfaces/python/igraph/test/decomposition.py:37-46."""
    g = LinkGraph.from_pairs(spark, KCORE_EDGES, directed=False, n=KCORE_N)
    got = {r["id"]: r["coreness"] for r in coreness(g).collect()}
    assert [got[i] for i in range(KCORE_N)] == KCORE_EXPECTED


def test_three_core_subgraph(spark):
    g = LinkGraph.from_pairs(spark, KCORE_EDGES, directed=False, n=KCORE_N)
    sub = k_core_subgraph(g, 3)
    got = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    expected = {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert got == expected
