"""Physical layout: bucketed static side ⇒ exchange-free superstep join."""

import io
import contextlib

from pyspark.sql import functions as F

from xdata_igraph_spark.plans.layout import bucketize


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_edge_side_exchange(spark):
    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"),
        (F.col("id") % 89).alias("dst"),
        F.lit(1.0).alias("p"),
    )
    contrib = bucketize(edges, ["src"], name="test_contrib")
    state = spark.range(97).select(F.col("id"), F.lit(0.5).alias("rank"))
    joined = (
        state.select(F.col("id").alias("src"), "rank")
        .join(contrib, "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("p")).alias("acc"))
    )
    plan = _plan_of(joined)
    # the scan must be bucket-aware…
    assert "Bucketed: true" in plan, plan
    # …and the only shuffle Exchange is the final aggregate; the edge
    # side feeds the join straight from the bucketed scan (the state
    # side may broadcast or shuffle — both are vertex-size)
    import re

    shuffles = re.findall(r"^\(\d+\) Exchange\b", plan, re.M)
    assert len(shuffles) <= 2, plan
    scan_hdr = re.search(r"^\(\d+\) Scan parquet", plan, re.M)
    assert scan_hdr is not None, plan
    # and the result is still correct
    total = joined.agg(F.sum("acc")).first()[0]
    assert abs(total - 0.5 * 2000) < 1e-9


def test_bucketize_unique_names(spark):
    df = spark.range(10).select(F.col("id").alias("src"), F.lit(1.0).alias("w"))
    a = bucketize(df, ["src"], name="dup")
    b = bucketize(df, ["src"], name="dup")
    assert a.count() == b.count() == 10
