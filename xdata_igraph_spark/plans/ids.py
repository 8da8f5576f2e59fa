"""Scale-safe dense id minting — the zipWithIndex of the DataFrame world.

Several operators need "rank every row by a sort key, 0..n-1" (vertex id
minting, edge-id minting for linegraph, component renumbering, LPA
fresh-label assignment, topological total order). The naive expression —
``row_number().over(Window.orderBy(...))`` with no partition key — moves
the WHOLE table through ONE partition (Spark's WindowExec warns
``No Partition Defined``); at web scale that is a driver-adjacent
single-task sort of up to |E| rows.

The scale-safe plan (same trick the RDD zipWithIndex uses):

1. range-partition by the sort key (P partitions, sampled boundaries);
2. rank *within* each partition (window keyed by partition id — every
   partition is one independent group, no global exchange);
3. collect only the P per-partition row counts to the driver and turn
   them into exclusive prefix offsets;
4. broadcast-join the P-row offset table back and add.

The range partitioner's boundaries are sampled per evaluation, so step 1
is frozen with an eager localCheckpoint before the pid is observed —
otherwise the offsets collected in step 3 could disagree with a later
re-evaluation of the ranked rows and silently scramble ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "idx",
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Append ``out_col`` = dense rank ``start..start+n-1`` of each row
    by ascending ``order_cols``. Rows must be unique on the sort key
    (ties would get arbitrary relative order within a partition).
    Returns the input columns plus ``out_col``; the result is
    materialized (eager localCheckpoint) so repeated actions see one
    consistent assignment.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = df.columns
    # the range partitioner SAMPLES its input before the real pass — a
    # derived input (typically a distinct/aggregate of labels or urls)
    # would run its whole pipeline twice; materialize such inputs once
    from xdata_igraph_spark.plans.checkpointing import materialize_if_derived

    df = materialize_if_derived(df)
    part = df.repartitionByRange(num_partitions, *order_cols)
    # lazy checkpoint: the counts collect right below is the first
    # action and materializes it — ONE evaluation (the freeze the
    # module docstring requires) with one fewer Spark job than an
    # eager checkpoint followed by the collect
    with_pid = part.select(
        F.spark_partition_id().alias("_pid"), *cols
    ).localCheckpointFlat(eager=False)
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long")).filter(F.lit(False))
    offsets_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    rn = F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    out = (
        with_pid.withColumn("_rn", rn)
        .join(F.broadcast(offsets_df), "_pid")
        .select(*cols, (F.col("_offset") + F.col("_rn") - 1).alias(out_col))
    )
    # the per-partition counts already told us the exact row count for
    # free — when the ranked table is small, stamp a broadcast hint so
    # the caller's join-back skips shuffling its (much larger) side.
    # Data-derived, not a local tune: at crawl scale the count is huge
    # and the hint is not applied. Threshold overridable via env.
    bcast_rows = int(os.environ.get("SPARK_GRAFT_IDS_BROADCAST_ROWS", "4000000"))
    if acc - start <= bcast_rows:
        out = out.hint("broadcast")
    return out
