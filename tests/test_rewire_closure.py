"""get_laplacian, transitive_closure_dag, rewire_edges, rewire."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.paths import transitive_closure_dag
from xdata_igraph_spark.operators.structure import get_laplacian
from xdata_igraph_spark.sources.generators import rewire, rewire_edges, ring


def _wg(spark, rows, n, directed=False):
    return LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        n=n,
    )


def _dense(trips, n):
    m = np.zeros((n, n))
    for r in trips:
        m[r["row"], r["col"]] += r["value"]
    return m


# ----------------------------------------------------------------- laplacian


def test_laplacian_undirected_unnormalized(spark):
    rows = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 1.0), (2, 2, 5.0)]  # loop ignored
    g = _wg(spark, rows, 4)  # vertex 3 isolated
    L = _dense(get_laplacian(g).collect(), 4)
    A = np.zeros((4, 4))
    for u, v, w in [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 1.0)]:
        A[u, v] += w
        A[v, u] += w
    want = np.diag(A.sum(1)) - A
    assert np.allclose(L, want)


def test_laplacian_directed_normalized(spark):
    rows = [(0, 1, 1.0), (0, 2, 3.0), (1, 2, 1.0)]
    g = _wg(spark, rows, 3, directed=True)
    L = _dense(get_laplacian(g, normalized=True).collect(), 3)
    # diag = 1 where out-strength > 0 else 0; off-diag -w/d_out(from)
    want = np.array(
        [
            [1.0, -1.0 / 4.0, -3.0 / 4.0],
            [0.0, 1.0, -1.0],
            [0.0, 0.0, 0.0],
        ]
    )
    assert np.allclose(L, want)


def test_laplacian_undirected_normalized_symmetric(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)]
    g = _wg(spark, rows, 4)
    L = _dense(get_laplacian(g, normalized=True).collect(), 4)
    A = np.zeros((4, 4))
    for u, v, w in rows:
        A[u, v] += w
        A[v, u] += w
    d = A.sum(1)
    want = np.eye(4) - A / np.sqrt(np.outer(d, d))
    assert np.allclose(L, want)
    assert np.allclose(L, L.T)


# ------------------------------------------------------------------ closure


def test_transitive_closure_dag_path_and_diamond(spark):
    arcs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3)]
    g = _wg(spark, [(a, b, 1.0) for a, b in arcs], 5, directed=True)
    c = transitive_closure_dag(g)
    got = {(r["src"], r["dst"]) for r in c.edges.select("src", "dst").collect()}
    want = {
        (0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (2, 3), (4, 3),
    }
    assert got == want


def test_transitive_closure_rejects_cycles(spark):
    g = _wg(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)], 3, directed=True)
    with pytest.raises(ValueError, match="DAG"):
        transitive_closure_dag(g)


def test_transitive_closure_deep_path_uses_doubling(spark):
    n = 40
    g = _wg(spark, [(i, i + 1, 1.0) for i in range(n - 1)], n, directed=True)
    c = transitive_closure_dag(g)
    assert c.ecount() == n * (n - 1) // 2


# ------------------------------------------------------------- rewire_edges


def test_rewire_edges_preserves_count_and_avoids_loops(spark):
    g = ring(spark, 60)
    out = rewire_edges(g, prob=0.5, loops=False, seed=7)
    assert out.ecount() == g.ecount()
    assert out.edges.filter(F.col("src") == F.col("dst")).count() == 0
    # prob=0 is the identity
    same = rewire_edges(g, prob=0.0, seed=7)
    assert same.ecount() == g.ecount()
    moved = (
        out.edges.select("src", "dst")
        .subtract(g.edges.select("src", "dst"))
        .count()
    )
    assert moved > 0  # half the endpoints should have moved


def test_rewire_edges_is_deterministic(spark):
    g = ring(spark, 30)
    a = sorted(map(tuple, rewire_edges(g, 0.3, seed=5).edges.select("src", "dst").collect()))
    b = sorted(map(tuple, rewire_edges(g, 0.3, seed=5).edges.select("src", "dst").collect()))
    assert a == b


# -------------------------------------------------------------------- rewire


def _degrees(g):
    rows = g.degrees("all").collect()
    return {r["id"]: r["degree"] for r in rows}


def test_rewire_preserves_degrees_and_simplicity(spark):
    g = ring(spark, 50)  # simple 2-regular
    out = rewire(g, n_trials=200, seed=11)
    assert out.ecount() == g.ecount()
    assert _degrees(out) == _degrees(g)
    # simple mode: no loops, no multiples
    assert out.edges.filter(F.col("src") == F.col("dst")).count() == 0
    pairs = out.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    assert pairs.groupBy("a", "b").count().filter(F.col("count") > 1).count() == 0
    # and something actually changed
    assert (
        out.edges.select("src", "dst").subtract(g.edges.select("src", "dst")).count()
        > 0
    )


def test_rewire_directed_preserves_in_and_out_degrees(spark):
    arcs = [(i, (i + k) % 20, 1.0) for i in range(20) for k in (1, 3)]
    g = _wg(spark, arcs, 20, directed=True)
    out = rewire(g, n_trials=60, seed=3)
    for mode in ("in", "out"):
        want = {r["id"]: r["degree"] for r in g.degrees(mode).collect()}
        got = {r["id"]: r["degree"] for r in out.degrees(mode).collect()}
        assert got == want


def test_rewire_rejects_tiny_simple_graphs(spark):
    g = _wg(spark, [(0, 1, 1.0), (1, 2, 1.0)], 3, directed=False)
    with pytest.raises(ValueError, match="unsuitable"):
        rewire(g, n_trials=5)


def test_rewire_sparse_vertex_ids(spark):
    """Regression: vertex ids need not be dense 0..n-1 — rewiring must
    neither mint phantom vertices nor shrink the vertex universe."""
    rows = [(10, 20, 1.0), (20, 30, 1.0), (30, 40, 1.0), (40, 10, 1.0),
            (10, 30, 1.0), (20, 40, 1.0), (10, 99, 1.0), (99, 20, 1.0)]
    g = _wg(spark, rows, None, directed=True)
    vids = {r["id"] for r in g.vertices().collect()}

    out = rewire(g, n_trials=20, seed=2)
    for mode in ("in", "out"):
        d0 = {r["id"]: r["degree"] for r in g.degrees(mode).collect()}
        d1 = {r["id"]: r["degree"] for r in out.degrees(mode).collect()}
        assert d0 == d1

    rwe = rewire_edges(g, prob=0.9, seed=6)
    ends = {r["src"] for r in rwe.edges.collect()} | {
        r["dst"] for r in rwe.edges.collect()
    }
    assert ends <= vids
    assert rwe.vcount() == g.vcount()
    assert rwe.edges.filter(F.col("src") == F.col("dst")).count() == 0


# -------------------------------------------------------- feedback arc set


def test_feedback_arc_set_directed_makes_dag(spark):
    from xdata_igraph_spark.operators.feedback import feedback_arc_set
    from xdata_igraph_spark.operators.paths import is_dag

    # two overlapping cycles + a DAG tail
    arcs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (4, 5), (5, 6)]
    g = _wg(spark, [(a, b, 1.0) for a, b in arcs], 7, directed=True)
    fas = feedback_arc_set(g)
    removed = {(r["src"], r["dst"]) for r in fas.collect()}
    assert 1 <= len(removed) <= len(arcs) // 2  # Eades bound |E|/2 - |V|/6
    rest = g.edges.join(fas.select("src", "dst"), ["src", "dst"], "left_anti")
    assert is_dag(LinkGraph(rest, directed=True, n=7))


def test_feedback_arc_set_on_dag_is_empty(spark):
    from xdata_igraph_spark.operators.feedback import feedback_arc_set

    g = _wg(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], 3, directed=True)
    assert feedback_arc_set(g).count() == 0


def test_feedback_arc_set_undirected_is_mst_complement(spark):
    from xdata_igraph_spark.operators.feedback import feedback_arc_set

    # weighted: must drop exactly the LIGHTEST edges of each cycle
    rows = [(0, 1, 5.0), (1, 2, 5.0), (2, 0, 1.0), (2, 3, 4.0), (3, 0, 1.5)]
    g = _wg(spark, rows, 4, directed=False)
    removed = {(r["src"], r["dst"]) for r in feedback_arc_set(g).collect()}
    # max spanning forest keeps {01, 12, 23}; drops 20 (w1) and 30 (w1.5)
    assert removed == {(2, 0), (3, 0)}
