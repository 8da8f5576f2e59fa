"""Superstep runner — resumable iterate-to-fixpoint for DataFrame loops.

Spark has no native fixpoint operator; every iterative algorithm here
(PageRank, WCC/SCC, LPA, k-core) drives its loop through this runner so
that all of them share:

- **lineage truncation**: each superstep's state DataFrame is
  materialized via ``localCheckpoint(eager=True)`` so the logical plan
  does not grow with the iteration count (the reference's equivalent is
  its swap-buffer reuse, /root/reference/src/structural_properties.c:
  1429-1479 — reuse the memory, don't re-derive from scratch);
- **durable checkpoints**: every ``checkpoint_interval`` supersteps
  (and at convergence) the state lands in
  ``<dir>/<job>/iter=<k>/state.parquet`` plus a ``metrics.json`` with
  iteration number, convergence delta, rows per partition
  (per-partition lineage), and wall time — the north-rule resumability
  contract;
- **resume**: ``resume()`` returns the newest *complete* checkpoint
  (metrics.json is written after the parquet commit, so a killed write
  is never resumed into).

Usage inside an algorithm::

    runner = SuperstepRunner(spark, "pagerank", checkpoint_dir=...)
    state, start = runner.resume() or (init_state, 0)
    for i in range(start, max_iter):
        new_state = ...                       # lazy plan
        state = runner.materialize(new_state, i)
        delta = <one scalar agg over state>   # the only driver action
        runner.finish_iteration(i, delta)
        if delta < tol:
            runner.finalize(state, i, delta)  # durable final checkpoint
            break

At cluster scale the durable checkpoint is the unit of fault recovery
across driver restarts; localCheckpoint covers lineage truncation
within a run.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SuperstepMetrics:
    iteration: int
    delta: float
    wall_ms: float
    durable: bool = False
    rows: int | None = None
    partition_rows: list[int] | None = None
    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        d = self.delta
        return json.dumps(
            {
                "iteration": self.iteration,
                "delta": None if d != d else d,  # NaN → null for valid JSON
                "wall_ms": self.wall_ms,
                "durable": self.durable,
                "rows": self.rows,
                "partition_rows": self.partition_rows,
                **self.extra,
            }
        )


class SuperstepRunner:
    def __init__(
        self,
        spark: SparkSession,
        job_name: str,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 10,
        collect_partition_rows: bool = True,
    ):
        self.spark = spark
        self.job_name = job_name
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_interval = max(1, checkpoint_interval)
        self.collect_partition_rows = collect_partition_rows
        self.history: list[SuperstepMetrics] = []
        self._t0 = time.monotonic()
        self._iter_t0 = self._t0
        self._pending_dir: str | None = None
        self._pending_metrics: SuperstepMetrics | None = None

    # -------------- durable checkpoint layout --------------

    def _job_dir(self) -> str:
        assert self.checkpoint_dir is not None
        return os.path.join(self.checkpoint_dir, self.job_name)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self._job_dir(), f"iter={iteration:06d}")

    def resume(self) -> tuple[DataFrame, int] | None:
        """Newest *complete* checkpoint → (state, next_iteration).
        Complete iff metrics.json exists (written after the parquet)."""
        if self.checkpoint_dir is None or not os.path.isdir(self._job_dir()):
            return None
        complete = sorted(
            d
            for d in os.listdir(self._job_dir())
            if d.startswith("iter=")
            and os.path.exists(os.path.join(self._job_dir(), d, "metrics.json"))
        )
        if not complete:
            return None
        last = complete[-1]
        iteration = int(last.split("=")[1])
        state = self.spark.read.parquet(
            os.path.join(self._job_dir(), last, "state.parquet")
        )
        return state, iteration + 1

    # -------------- per-superstep protocol --------------

    def materialize(
        self, state: DataFrame, iteration: int, force_durable: bool = False
    ) -> DataFrame:
        """Cut lineage; on cadence also write the durable checkpoint.
        Call ``finish_iteration`` afterwards with the measured delta."""
        self._iter_t0 = time.monotonic()
        durable = self.checkpoint_dir is not None and (
            force_durable or (iteration + 1) % self.checkpoint_interval == 0
        )
        if durable:
            it_dir = self._iter_dir(iteration)
            if os.path.isdir(it_dir):
                shutil.rmtree(it_dir)
            state.write.mode("overwrite").parquet(os.path.join(it_dir, "state.parquet"))
            out = self.spark.read.parquet(os.path.join(it_dir, "state.parquet"))
            rows, part_rows = None, None
            if self.collect_partition_rows:
                per_part = (
                    out.groupBy(F.spark_partition_id().alias("pid"))
                    .count()
                    .orderBy("pid")
                    .collect()
                )
                part_rows = [int(r["count"]) for r in per_part]
                rows = sum(part_rows)
            self._pending_dir = it_dir
            self._pending_metrics = SuperstepMetrics(
                iteration=iteration,
                delta=float("nan"),
                wall_ms=0.0,
                durable=True,
                rows=rows,
                partition_rows=part_rows,
            )
        else:
            # lazy checkpoint: materialization happens inside the
            # caller's very next action (the convergence aggregate), so
            # each superstep costs ONE Spark job instead of two, while
            # still truncating lineage for every later use.
            out = state.localCheckpoint(eager=False)
            self._pending_dir = None
            self._pending_metrics = SuperstepMetrics(
                iteration=iteration, delta=float("nan"), wall_ms=0.0
            )
        return out

    def finish_iteration(
        self, iteration: int, delta: float, extra: dict | None = None
    ) -> None:
        """Record metrics; commits the durable checkpoint (metrics.json
        is the completion marker)."""
        m = self._pending_metrics or SuperstepMetrics(iteration, float("nan"), 0.0)
        m.delta = float(delta)
        m.wall_ms = (time.monotonic() - self._iter_t0) * 1000
        if extra:
            m.extra.update(extra)
        self.history.append(m)
        if self._pending_dir is not None:
            with open(os.path.join(self._pending_dir, "metrics.json"), "w") as f:
                f.write(m.to_json())
        self._pending_dir = None
        self._pending_metrics = None

    def finalize(self, state: DataFrame, iteration: int, delta: float) -> DataFrame:
        """Durably checkpoint the converged state (if configured)."""
        if self.checkpoint_dir is None:
            return state
        out = self.materialize(state, iteration, force_durable=True)
        self.finish_iteration(iteration, delta, extra={"converged": True})
        return out

    def total_wall_sec(self) -> float:
        return time.monotonic() - self._t0
