import numpy as np
import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.pagerank import pagerank

from tests.fixtures import IPRCOM_EDGES, IPRCOM_GOLDEN_2DP, IPRCOM_N
from tests.oracles import gnm_edges, pagerank_oracle


def _ranks(df, n):
    rows = {r["id"]: r["rank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_iprcom_golden(spark):
    """Golden: /root/reference/examples/simple/igraph_pagerank.out:2."""
    g = LinkGraph.from_pairs(spark, IPRCOM_EDGES, directed=True, n=IPRCOM_N)
    pr = _ranks(pagerank(g, tol=1e-12), IPRCOM_N)
    assert np.allclose(np.round(pr, 2), IPRCOM_GOLDEN_2DP)
    oracle = pagerank_oracle(IPRCOM_N, IPRCOM_EDGES)
    assert np.allclose(pr, oracle, atol=1e-6)
    assert abs(pr.sum() - 1.0) < 1e-9
    assert pr.min() >= 0


def test_star_undirected(spark):
    """Golden: interfaces/python/igraph/test/structural.py:282-297."""
    edges = [(0, i) for i in range(1, 11)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=11)
    pr = _ranks(pagerank(g, tol=1e-12), 11)
    assert round(float(pr.max()), 4) == pytest.approx(0.4668, abs=1e-3)
    assert int(pr.argmax()) == 0
    assert abs(pr.sum() - 1.0) < 1e-9


def test_star_personalized(spark):
    edges = [(0, i) for i in range(1, 11)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=11)
    reset = spark.createDataFrame([(1, 10.0)], "id long, reset double")
    pr = _ranks(pagerank(g, damping=0.5, reset=reset, tol=1e-12), 11)
    assert pr[0] == pytest.approx(0.3333, abs=1e-3)
    assert pr[1] == pytest.approx(0.5166, abs=1e-3)
    assert pr[2] == pytest.approx(0.0166, abs=1e-3)


def test_all_zero_reset_raises(spark):
    edges = [(0, i) for i in range(1, 11)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=11)
    reset = spark.createDataFrame([(1, 0.0)], "id long, reset double")
    with pytest.raises(ValueError):
        pagerank(g, reset=reset)


def test_dangling_mass(spark):
    """Vertex 3 is dangling in the iprcom graph; dangling donates all
    its rank to the reset distribution (src/centrality.c:926-939).
    The linear-solve oracle encodes that; allclose is the check."""
    edges = [(0, 1), (1, 2)]  # 2 is dangling; 3 isolated (dangling too)
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=4)
    pr = _ranks(pagerank(g, tol=1e-12), 4)
    oracle = pagerank_oracle(4, edges, directed=True)
    assert np.allclose(pr, oracle, atol=1e-8)
    assert abs(pr.sum() - 1.0) < 1e-9


def test_weighted_with_negative_clamp(spark):
    edges = [(0, 1, 2.0), (0, 2, -1.0), (1, 2, 1.0), (2, 0, 3.0)]
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=3)
    with pytest.warns(UserWarning):
        pr = _ranks(pagerank(g, tol=1e-12), 3)
    oracle = pagerank_oracle(
        3, [(s, d) for s, d, _ in edges], weights=[w for _, _, w in edges]
    )
    assert np.allclose(pr, oracle, atol=1e-6)


@pytest.mark.parametrize("directed", [True, False])
def test_gnm_vs_oracle(spark, directed):
    """Seeded GNM n=300 m=1200 (FIXTURES.md §3.7 scale-reduced),
    allclose 1e-6 against the exact dense solve."""
    n, m = 300, 1200
    edges = gnm_edges(n, m, directed=directed)
    g = LinkGraph.from_pairs(spark, edges, directed=directed, n=n)
    pr = _ranks(pagerank(g, tol=1e-10), n)
    oracle = pagerank_oracle(n, edges, directed=directed)
    assert np.allclose(pr, oracle, atol=1e-6)
    assert abs(pr.sum() - 1.0) < 1e-9


def test_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume: running with a checkpoint dir, then resuming
    from iteration k, must give a state identical to the uninterrupted
    run (north-rule resumability)."""
    n, m = 100, 400
    edges = gnm_edges(n, m, directed=True)
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=n)
    full = _ranks(pagerank(g, tol=1e-12, max_iter=300), n)

    ckpt = str(tmp_path / "ck")
    # phase 1: stop early at 7 iterations, checkpoint every 3
    pagerank(
        g, tol=0.0, max_iter=7, checkpoint_dir=ckpt, checkpoint_interval=3
    )
    # phase 2: resume from the durable checkpoint and run to convergence
    resumed = _ranks(
        pagerank(
            g, tol=1e-12, max_iter=300, checkpoint_dir=ckpt, checkpoint_interval=50
        ),
        n,
    )
    assert np.allclose(resumed, full, atol=1e-9)


def test_pagerank_bucketed_matches_default(spark):
    """bucket_edges changes the physical layout only — identical ranks."""
    from tests.fixtures import KCORE_EDGES, KCORE_N
    from tests.oracles import gnm_edges

    edges = gnm_edges(60, 180, True, seed=21)
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=60)
    a = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-10).collect()}
    b = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-10, bucket_edges=True).collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
