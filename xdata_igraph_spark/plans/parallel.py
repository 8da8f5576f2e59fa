"""Scan-parallelism floor for per-row-heavy operators.

A parquet scan's task count is bounded by the input's file/row-group
layout: a table written as one file with one row group scans as ONE
task no matter how many cores the session has, and everything fused
into that scan stage (hash folds, bucket projections, signature
expressions) runs single-threaded (guide §6 — input split size; §2.6
stragglers/idle capacity). Operators whose per-row work dominates call
:func:`ensure_min_parallelism` on their input: it round-robin
repartitions ONLY when the physical plan yields fewer partitions than
the session's default parallelism — at production scale the layout
already provides more splits than cores and this is a no-op (no added
exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    default parallelism) iff its physical plan currently produces fewer
    partitions. Round-robin keeps no keys — downstream aggregations and
    joins are partitioning-agnostic, and Spark's sort-before-repartition
    keeps the assignment deterministic under task retry."""
    sc = df.sparkSession.sparkContext
    target = min_parts if min_parts is not None else sc.defaultParallelism
    if target <= 1:
        return df
    try:
        cur = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    return df.repartition(target)
