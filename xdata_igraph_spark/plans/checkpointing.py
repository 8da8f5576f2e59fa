"""Lineage truncation that actually truncates on Spark 4.x.

``Dataset.localCheckpoint`` in Spark 4.x wraps the checkpointed RDD in
a ``LogicalRDD`` that KEEPS deferred references to the pre-checkpoint
plan (its statistics / constraints are computed from the origin
dataset on demand). In a superstep loop whose next plan references the
checkpointed state several times (e.g. Louvain reads ``labels`` for
community totals, neighbor weights, and the current assignment), those
origin links chain across iterations: the stats visitor then walks a
virtual tree that grows by the reference multiplicity every superstep
and multiplies ``sizeInBytes`` BigIntegers of exponentially growing
bit-length. Observed: an 8-supernode Louvain level spending minutes of
driver CPU in ``BigInteger.multiplyToomCook3`` per sweep, doubling
every sweep — with a 63-character logical plan and 8 rows of data.

Fix: after the checkpoint, rewrap the (already materialized/truncated)
internal RDD in a FRESH ``LogicalRDD`` via
``SparkSession.internalCreateDataFrame`` — no origin linkage, so stats
fall back to ``defaultSizeInBytes`` and the chain is severed. Costs:
the checkpointed side no longer auto-qualifies for broadcast (the
engine broadcasts explicitly where intended) and its output
partitioning metadata is dropped (superstep joins shuffle messages
anyway; the exchange-free side is the bucket-scan edge table, which is
never checkpointed this way).

Installed as ``DataFrame.localCheckpointFlat`` so call sites keep the
chaining style of ``localCheckpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def flat_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    try:
        jdf = df._jdf
        ck = jdf.localCheckpoint(eager)
        jspark = ck.sparkSession()
        fresh = jspark.internalCreateDataFrame(
            ck.queryExecution().toRdd(), ck.schema(), False
        )
        return DataFrame(fresh, df.sparkSession)
    except Exception:
        # non-classic sessions (Connect) or private-API drift: degrade
        # to the plain checkpoint rather than fail
        return df.localCheckpoint(eager)


def install() -> None:
    """Attach ``DataFrame.localCheckpointFlat``; idempotent."""
    if getattr(DataFrame, "localCheckpointFlat", None) is None:
        DataFrame.localCheckpointFlat = flat_local_checkpoint
