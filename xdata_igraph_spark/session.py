"""SparkSession factory tuned for the link-graph workload.

Local mode is a stand-in for a multi-executor cluster: the configuration
below (AQE, skew-join handling, explicit shuffle partition counts,
Arrow-enabled pandas UDFs) is exactly what the job would ship with via
``spark-submit --py-files`` on a real cluster; only ``master`` and the
memory knobs change.
"""

from __future__ import annotations

import os
import shutil
import tempfile

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
        # bucketed-layout tables (plans/layout.py) land here; keep them
        # out of the caller's cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "xigs_warehouse"),
            ),
        )
        # shuffle/spill dir: prefer tmpfs when present — local mode's
        # stand-in for the node-local SSDs a real cluster would have
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/xigs_local" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # superstep loops replace the ranks/labels DataFrame every
        # iteration; reliable local checkpoints truncate lineage.
        # Compression is Spark's stock default (off): the state is
        # vertex-size (orders of magnitude below the edge table), and
        # compressing every superstep's checkpoint blocks costs
        # measurable CPU per iteration (r6: ~0.2-0.3s/superstep on the
        # 200k-vertex corpus loop) for memory the block manager does
        # not need. Opt back in for memory-tight clusters via env.
        .config(
            "spark.checkpoint.compress",
            os.environ.get("SPARK_GRAFT_CHECKPOINT_COMPRESS", "false"),
        )
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
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors regardless of the
    driver's cwd — the in-process equivalent of
    ``spark-submit --py-files xdata_igraph_spark.zip`` (pandas UDFs
    pickle references to this module, so workers must import it)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    marker = "_xdata_igraph_spark_shipped"
    if getattr(spark.sparkContext, marker, False):
        return
    zip_base = os.path.join(tempfile.mkdtemp(prefix="xigs_pyfiles_"), "xdata_igraph_spark")
    zip_path = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    setattr(spark.sparkContext, marker, True)
