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
Severed-vs-plain trade-off: the stock checkpoint's LogicalRDD keeps
output partitioning metadata, so the next superstep's join over the
state avoids one exchange — the fully-severed wrap loses it (measured
+65% on a 10-iteration PageRank). The helper therefore uses the stock
checkpoint by default and severs the chain every ``FLAT_EVERY``-th
call: chains stay bounded at a handful of links (stats walks visit at
most multiplicity^FLAT_EVERY nodes) while most supersteps keep the
exchange-free state side. Superstep loops pass ``force_flat``
explicitly from their OWN iteration count (SuperstepRunner.materialize)
so that which superstep loses its partitioning is deterministic; the
module-global counter only governs stray non-loop call sites (r6: the
counter made the extra state exchange land on random supersteps,
run to run).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

FLAT_EVERY = 3
_counter = itertools.count(1)


def flat_local_checkpoint(
    df: DataFrame, eager: bool = True, force_flat: bool | None = None
) -> DataFrame:
    flat = force_flat if force_flat is not None else (
        next(_counter) % FLAT_EVERY == 0
    )
    if not flat:
        return df.localCheckpoint(eager)
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


def materialize_if_derived(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` iff its analyzed plan contains work
    worth doing only once (aggregation/join/generation/...); plans that
    are already cheap to rescan (raw scans, local relations,
    checkpointed RDDs) are returned as-is. Callers that must evaluate
    their input more than once (e.g. a range-partition sampling pass
    followed by the real pass) use this so a derived input's pipeline
    runs exactly once (guide §1.2)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    derived = any(
        tok in plan
        for tok in ("Join", "Aggregate", "Generate", "Window", "Expand", "Union")
    )
    return df.localCheckpoint(True) if derived else df


def install() -> None:
    """Attach ``DataFrame.localCheckpointFlat``; idempotent."""
    if getattr(DataFrame, "localCheckpointFlat", None) is None:
        DataFrame.localCheckpointFlat = flat_local_checkpoint
