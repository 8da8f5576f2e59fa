"""Physical-layout helpers — the Spark analogue of the reference's
indexed edge list.

The reference builds two sort permutations + CSR offsets at
construction so every algorithm iterates without re-sorting
(/root/reference/src/type_indexededgelist.c:258-339, 835-877). The
DataFrame equivalent is a **bucketed, bucket-sorted table**: writing the
static side of an iterative join with ``bucketBy(P, key).sortBy(key)``
makes every subsequent scan expose ``HashPartitioning(key, P)`` and a
sorted order, so the per-superstep sort-merge join needs **no exchange
and no sort on the edge-size side** — only the (much smaller)
vertex-size state and the message aggregate shuffle each superstep.

``localCheckpoint`` alone does NOT achieve this: a checkpointed
DataFrame scans as a bare ``LogicalRDD`` with unknown partitioning, so
Catalyst re-shuffles and re-sorts the edge table every iteration
(measured: the edge exchange dominated each superstep before this
helper existed).

At cluster scale the same layout is a bucketed Iceberg/Hive table; the
one-time write amortizes over the 50-100 supersteps of a
converge-to-1e-6 PageRank run.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame

_counter = itertools.count()
# the warehouse dir outlives the (in-memory) catalog, so table names
# must be unique across sessions, not just within one
_SESSION_TAG = f"{os.getpid():x}"


def bucketize(
    df: DataFrame,
    cols: list[str],
    n_buckets: int | None = None,
    name: str = "t",
) -> DataFrame:
    """Write ``df`` as a bucketed+sorted table and return a scan of it.

    ``n_buckets`` defaults to ``spark.sql.shuffle.partitions`` so the
    bucketed side co-partitions with the shuffled side of every join.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    table = f"xigs_bucketed_{name}_{_SESSION_TAG}_{next(_counter)}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a recycled pid can leave an orphan location the catalog no longer
    # tracks; clear it or the managed-table write refuses
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    loc = os.path.join(wh, table)
    if wh and os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
    (
        # repartition by the bucket key first so each bucket is ONE
        # file: Spark trusts a bucket's sort order only when the bucket
        # is a single file — multi-file buckets force a per-scan Sort of
        # the edge-size table on EVERY superstep (measured in the
        # executed plan), which defeats half the point of the layout
        df.repartition(n_buckets, *cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(cols[0], *cols[1:])
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)
