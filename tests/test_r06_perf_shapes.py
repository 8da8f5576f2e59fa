"""Round-6 optimization invariants: plan shapes, loop tuning, and the
value-equivalence of restructured operators.

These pin the properties the r6 optimizations rely on, so a later
refactor that silently reintroduces a per-superstep exchange, a
broadcast rebuild, or a double-scored rerank fails here instead of in
a bench regression.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    """Count physical Exchange operators via their detail headers
    ("(k) Exchange"); BroadcastExchange does not match."""
    import re as _re

    return len(_re.findall(r"^\(\d+\) Exchange$", plan, _re.M))


def _ring_graph(spark, n=600, extra=7):
    e = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    e2 = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + extra) % n).alias("dst")
    )
    return LinkGraph(e.unionByName(e2), directed=True)


class _Recorder(SuperstepRunner):
    """Capture the pre-materialize superstep plan at iteration 2."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.recorded = None

    def materialize(self, state, iteration, force_durable=False):
        if iteration == 2 and self.recorded is None:
            self.recorded = state
        return super().materialize(state, iteration, force_durable)


def test_tune_loop_partitions_derives_and_restores(spark):
    runner = SuperstepRunner(spark, "t_tune")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with runner.loop_conf():
        # tiny rows → the floor (min(8, session)); session is 4 in tests
        parts = runner.tune_loop_partitions(10)
        assert parts == min(8, int(before))
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == parts
        # huge rows → saturates at the session setting
        runner2 = SuperstepRunner(spark, "t_tune2")
        assert runner2.tune_loop_partitions(10**12) == int(before)
    # conf restored on scope exit
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.codegen.factoryMode") != "NO_CODEGEN"


def test_wcc_steady_superstep_single_exchange(spark):
    """The wcc superstep's only exchange is the message aggregation:
    the edge side streams pre-partitioned+pre-sorted, the state side
    arrives sorted from the previous superstep, and nothing is
    broadcast (guide §2.4)."""
    from xdata_igraph_spark.operators.components import wcc

    g = _ring_graph(spark)
    rec = _Recorder(spark, "t_wcc_shape")
    wcc(g, max_iter=6, runner=rec)
    assert rec.recorded is not None
    with rec.loop_conf():
        plan = _plan_str(rec.recorded)
    assert _n_exchanges(plan) == 1, plan
    assert "BroadcastExchange" not in plan
    assert "might_contain" not in plan  # no runtime bloom build per sweep


def test_pagerank_steady_superstep_single_exchange(spark):
    from xdata_igraph_spark.operators.pagerank import pagerank

    g = _ring_graph(spark)
    rec = _Recorder(spark, "t_pr_shape")
    pagerank(g, tol=0.0, max_iter=4, runner=rec)
    assert rec.recorded is not None
    with rec.loop_conf():
        plan = _plan_str(rec.recorded)
    assert _n_exchanges(plan) == 1, plan
    assert "BroadcastExchange" not in plan


def test_lpa_sweep_single_message_exchange(spark):
    from xdata_igraph_spark.operators.lpa import label_propagation

    g = _ring_graph(spark)
    rec = _Recorder(spark, "t_lpa_shape")
    label_propagation(g, max_sweeps=4, runner=rec)
    assert rec.recorded is not None
    with rec.loop_conf():
        plan = _plan_str(rec.recorded)
    # one message exchange; the dst repartition serves the histogram
    # aggregate, the per-dst fold AND the current-label join
    assert _n_exchanges(plan) == 1, plan
    assert "might_contain" not in plan


def test_srp_topk_matches_unhalved_rerank(spark):
    """The symmetric-candidate halving must not change the result:
    compare against a direct both-directions rerank of the same
    bucket-join candidate set."""
    from xdata_igraph_spark.operators.ann import (
        _bucket_expr,
        _cos_expr,
        _planes,
        srp_topk,
    )
    from pyspark.sql import Window

    n, dim = 80, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 500.0 - 1.0
            ),
        ).alias("embedding"),
    )
    got = srp_topk(emb, k=3, n_planes=4, dim=dim, n_tables=2, multiprobe=1)

    # naive reference: ordered candidates, each direction scored
    import itertools as it

    masks = [0] + [1 << p for p in range(4)]
    bcols = [
        (_bucket_expr("embedding", _planes(dim, 4, seed=42 + t)) + F.lit(t << 4)).alias(
            f"b{t}"
        )
        for t in range(2)
    ]
    b = emb.select(F.col("vec_id").alias("id"), *bcols)
    base = b.select(
        F.col("id").alias("neighbor_id"),
        F.explode(F.array(*[F.col(f"b{t}") for t in range(2)])).alias("key"),
    )
    probes = b.select(
        F.col("id").alias("query_id"),
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.array(
                            *[F.col(f"b{t}").bitwiseXOR(F.lit(m)) for m in masks]
                        )
                        for t in range(2)
                    ]
                )
            )
        ).alias("key"),
    )
    cand = (
        probes.join(base, "key")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    scored = cand.join(qv, "query_id").join(nv, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        _cos_expr(F.col("qv"), F.col("nv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    want = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )
    gs = sorted(map(tuple, got.collect()))
    ws = sorted(map(tuple, want.collect()))
    assert len(gs) == len(ws) and all(
        a[0] == b[0] and a[1] == b[1] and abs(a[2] - b[2]) < 1e-12
        for a, b in zip(gs, ws)
    )


def test_ensure_min_parallelism(spark):
    from xdata_igraph_spark.plans.parallel import ensure_min_parallelism

    one = spark.range(100).coalesce(1)
    out = ensure_min_parallelism(one, min_parts=4)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 100
    wide = spark.range(100).repartition(8)
    # already parallel enough → returned as-is, no extra exchange
    assert ensure_min_parallelism(wide, min_parts=4) is wide


def test_edges_cached_memoizes_derived_plans(spark):
    li = spark.range(200).select(
        (F.col("id") % 50).alias("src"), (F.col("id") % 37).alias("dst")
    )
    derived = li.groupBy("src", "dst").agg(F.count("*").cast("double").alias("weight"))
    g = LinkGraph(derived, directed=True)
    e1 = g.edges_cached()
    assert g.edges_cached() is e1  # memoized
    # a raw scan / local relation is returned as-is (storage is the cache)
    g2 = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)])
    assert g2.edges_cached() is g2.edges_cached()
    # counts agree with the raw edge table
    assert e1.count() == derived.count()
    assert g.ecount() == derived.count()
