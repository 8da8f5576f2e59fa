"""SparkSession factory tuned for the link-graph workload.

Local mode is a stand-in for a multi-executor cluster: the configuration
below (AQE, skew-join handling, explicit shuffle partition counts,
Arrow-enabled pandas UDFs) is exactly what the job would ship with via
``spark-submit --py-files`` on a real cluster; only ``master`` and the
memory knobs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xdata_igraph_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to ``cpus`` — at cluster scale this
    would be ~2-3x total executor cores; AQE coalesces downward at
    runtime either way.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # superstep loops replace the ranks/labels DataFrame every
        # iteration; reliable local checkpoints truncate lineage.
        .config("spark.checkpoint.compress", "true")
        # iterative self-join plans make Catalyst's constraint
        # propagation both slow (exponential constraint sets) and
        # fragile (Union.rewriteConstraints NoSuchElementException on
        # aliased keys); the optimization it buys is marginal here.
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
