import math

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.triangles import (
    adjacent_triangles,
    count_triangles,
    transitivity_local_undirected,
    transitivity_undirected,
)

from tests.fixtures import ZACHARY_EDGES, ZACHARY_N, ZACHARY_TRIANGLES
from tests.oracles import gnm_edges, triangles_oracle


def test_zachary_total(spark):
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    assert count_triangles(g) == ZACHARY_TRIANGLES


def test_zachary_transitivity(spark):
    """FIXTURES.md §3.5: 6·45 / Σdeg(deg−1) = 0.2556818."""
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    assert abs(transitivity_undirected(g) - 0.2556818) < 1e-6


def test_k4_local_all_one(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=4)
    vals = {r["id"]: r["transitivity"] for r in transitivity_local_undirected(g).collect()}
    assert all(abs(v - 1.0) < 1e-12 for v in vals.values())


def test_path_local_nan_vs_zero(spark):
    """Degree<2 → NaN by default, 0 with the mode flag
    (/root/reference/src/triangles.c:60-64)."""
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    nan_vals = {
        r["id"]: r["transitivity"] for r in transitivity_local_undirected(g).collect()
    }
    assert math.isnan(nan_vals[0]) and math.isnan(nan_vals[2])
    assert nan_vals[1] == 0.0  # degree 2, no triangle
    zero_vals = {
        r["id"]: r["transitivity"]
        for r in transitivity_local_undirected(g, zero_if_undefined=True).collect()
    }
    assert zero_vals[0] == 0.0 and zero_vals[2] == 0.0


def test_multi_loop_invariance(spark):
    """Directions ignored, loops and multi-edges dropped before counting
    (/root/reference/src/triangles.c:399-428)."""
    simple = [(0, 1), (1, 2), (2, 0)]
    messy = simple + [(1, 0), (0, 1), (2, 2), (0, 0), (2, 1)]
    g1 = LinkGraph.from_pairs(spark, simple, directed=False, n=3)
    g2 = LinkGraph.from_pairs(spark, messy, directed=True, n=3)
    assert count_triangles(g1) == count_triangles(g2) == 1


def test_per_vertex_gnm_vs_oracle(spark):
    n, m = 300, 1500
    edges = gnm_edges(n, m, directed=False)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    total, per = triangles_oracle(n, edges)
    assert count_triangles(g) == total
    got = {r["id"]: r["triangles"] for r in adjacent_triangles(g).collect()}
    assert [got[i] for i in range(n)] == per
