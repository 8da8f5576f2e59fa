"""PageRank — synchronous power iteration with igraph's exact
per-iteration semantics.

Semantics matched (reference = igraph_personalized_pagerank's matvec,
/root/reference/src/centrality.c:913-973, weighted variant :975-1035):

- contribution of vertex x: ``rank[x] / outstrength[x]`` where
  outstrength is the (weighted) out-degree; **negative weights are
  clamped to 0** with a warning (/root/reference/src/centrality.c:
  1451-1455);
- **dangling vertices** (outstrength 0) donate their *entire* rank to
  the reset distribution; non-dangling vertices donate ``(1-d)`` of
  theirs (/root/reference/src/centrality.c:926-939) — so the teleport
  scalar each superstep is ``sumfrom = (1-d)·(S - S_dangling) +
  S_dangling`` with S the total rank mass;
- new rank: ``d · Σ_{x→i} w(x,i)·rank[x]/outstrength[x] +
  sumfrom · reset[i]`` (uniform reset = 1/n)
  (/root/reference/src/centrality.c:941-970);
- directed graphs propagate along edge direction (the matvec pulls from
  IN-neighbors, /root/reference/src/centrality.c:1389); undirected
  graphs use every edge in both directions (IGRAPH_ALL);
- self-loops are excluded (loops excluded from degree,
  /root/reference/src/centrality.c:1414-1417);
- personalized reset vectors are normalized to sum 1 and must not be
  all-zero (/root/reference/src/centrality.c:1397-1406).

The reference's default solver (PRPACK, SCC-decomposed Gauss-Seidel to
1e-10, /root/reference/src/prpack/prpack_solver.cpp:76-100,393) is a
sequential in-memory strategy; the distributed-correct strategy is
synchronous (Jacobi) power iteration, which converges to the same
fixpoint — tests verify allclose(1e-6) against an exact dense linear
solve of the same system.

Scale design (100 TB / 10^12-doc target):
- the edge-size contribution table is normalized **once**, hash-
  partitioned by ``src`` and cached — supersteps shuffle only
  vertex-size rank rows, never the edge table;
- per-superstep driver traffic is ONE scalar aggregate row (delta +
  total mass + dangling mass fused into a single ``agg``);
- hub skew (a dst with 10^7 in-links) is handled by two-stage salted
  aggregation: messages first combine within ``(dst, salt)`` groups,
  then across salts — ``salt_buckets`` controls it (AQE alone cannot
  split a single hot *reduce* key);
- lineage is truncated every superstep and durably checkpointed on
  cadence via SuperstepRunner (resumable; north rule).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def pagerank(
    graph: LinkGraph,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 300,
    reset: DataFrame | None = None,
    weighted: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 20,
    salt_buckets: int = 0,
    runner: SuperstepRunner | None = None,
    norm: str = "max",
    bucket_edges: bool = False,
) -> DataFrame:
    """Return ``(id: long, rank: double)`` summing to 1.

    ``reset``: optional personalization DataFrame ``(id, reset)``;
    missing ids get 0. ``salt_buckets > 1`` enables two-stage salted
    aggregation for hub-skewed graphs. ``norm``: convergence test on
    the rank delta — "max" (max-norm) or "l1" (1-norm, PRPACK's
    criterion /root/reference/src/prpack/prpack_solver.cpp:393;
    scale-invariant in |V|, so use it for large graphs).
    ``bucket_edges``: materialize the contribution table as a
    bucketed+sorted table (plans/layout.py) so supersteps join it with
    NO edge-size exchange or sort — pays a one-time write, wins for
    long convergence runs / large graphs.
    """
    if norm not in ("max", "l1"):
        raise ValueError("norm must be 'max' or 'l1'")
    spark = graph.spark
    n = graph.vcount()
    if n == 0:
        raise ValueError("pagerank on empty graph")
    runner = runner or SuperstepRunner(
        spark,
        "pagerank",
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        collect_partition_rows=checkpoint_dir is not None,
        fingerprint=(
            f"pagerank|n={n}|damping={damping}|weighted={weighted}"
            f"|norm={norm}|personalized={reset is not None}"
        ),
    )

    # prep also runs AQE-free (same fixed shapes; see loop_conf)
    with runner.loop_conf():
        # loop shuffle partitions derived from the measured edge count
        # (memoized on the graph): at bench scale this collapses the
        # per-superstep task count by ~4-8x; at cluster scale it
        # saturates at the session's configured shuffle partitions
        runner.tune_loop_partitions(graph.ecount())
        # --- one-time edge prep (the only edge-size shuffle of the job) ---
        adj = graph.adjacency("out").filter(F.col("src") != F.col("dst"))
        if not weighted:
            adj = adj.withColumn("weight", F.lit(1.0))
            outs = adj.groupBy("src").agg(F.sum("weight").alias("outs"))
        else:
            # clamp negatives inline and fold the negative-weight probe into
            # the out-strength aggregate: ONE edge-size pass computes both
            # (r1 spent a separate edge-scan action on the probe), and the
            # materialized vertex-size `outs` is reused by contrib AND the
            # dangling-flag base below instead of being recomputed twice.
            clamped = F.greatest(F.col("weight"), F.lit(0.0))
            outs = (
                adj.groupBy("src")
                .agg(F.sum(clamped).alias("outs"), F.min("weight").alias("_minw"))
                .localCheckpointFlat(eager=True)
                # fresh exprIds: the LogicalRDD keeps the upstream attribute
                # ids, which would collide with adj's own `src` in the join
                .select(*(F.col(c).alias(c) for c in ["src", "outs", "_minw"]))
            )
            # the negative-weight probe rides along in the pre-loop agg0
            # action below (one fewer driver round trip in prep); the
            # clamping itself is unconditional, so nothing downstream
            # waits on the probe's value
            minw_df = outs.agg(F.min("_minw").alias("_minw"))
            outs = outs.drop("_minw")
            adj = adj.withColumn("weight", clamped)
        # localCheckpoint (not persist): materializes AND truncates the
        # plan to a LogicalRDD. With persist alone, every superstep's
        # Catalyst analysis re-walks the full ingest lineage (UDF
        # extraction, id minting) — measured 5-10x per-iteration overhead
        # on corpus-derived graphs.
        contrib = (
            adj.join(outs, "src")
            .filter(F.col("outs") > 0)
            .select("src", "dst", (F.col("weight") / F.col("outs")).alias("p"))
        )
        if bucket_edges and checkpoint_dir is not None:
            # durable resumable runs: the bucketed+sorted table IS the
            # cluster layout (a bucketed Iceberg/Hive table surviving
            # executor loss); its one-time write amortizes over a long
            # convergence run
            from xdata_igraph_spark.plans.layout import bucketize

            contrib = bucketize(contrib, ["src"], name="pr_contrib")
        else:
            # exchange-free edge side without the table write: a stock
            # eager localCheckpoint PRESERVES the hash partitioning (the
            # flat/severed wrap would drop it and re-exchange the edge
            # table every superstep), so the per-superstep join plan is
            # identical to the bucketed scan — measured r6: same plan
            # (2 Exchange / 3 Sort per superstep), ~2s less one-time prep
            # at bench scale, and the block-manager scan is faster than
            # re-reading parquet
            n_parts = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
            # sortWithinPartitions before the checkpoint: the LogicalRDD
            # keeps BOTH the hash partitioning and the sort order, so
            # every superstep's sort-merge join streams the edge side
            # with no per-superstep sort (one prep-time sort replaces
            # max_iter edge-size sorts; guide §2.4 — establish the
            # layout once and reuse it)
            contrib = (
                contrib.repartition(n_parts, "src")
                .sortWithinPartitions("src")
                .localCheckpoint(eager=True)
            )

        # --- vertex base: reset distribution + dangling flag ---
        verts = graph.vertices()
        out_ids = outs.filter(F.col("outs") > 0).select(F.col("src").alias("id"))
        base = verts.join(
            out_ids.withColumn("_nd", F.lit(True)), "id", "left"
        ).select("id", F.coalesce("_nd", F.lit(False)).alias("non_dangling"))

        if reset is not None:
            tot = reset.agg(F.sum("reset")).first()[0]
            if tot is None or tot <= 0:
                raise ValueError(
                    "reset vector must have positive sum "
                    "(igraph errors on all-zero reset, src/centrality.c:1397-1406)"
                )
            rdf = reset.select("id", (F.col("reset") / F.lit(float(tot))).alias("reset"))
            base = base.join(rdf, "id", "left").select(
                "id", "non_dangling", F.coalesce("reset", F.lit(0.0)).alias("reset")
            )
        else:
            base = base.withColumn("reset", F.lit(1.0 / n))
        # lazy: the pre-loop scalar aggregate below is the first action and
        # materializes the checkpoint as a side effect — one fewer prep job
        base = base.repartition("id").localCheckpointFlat(eager=False)

    resumed = runner.resume()
    if resumed is not None:
        state, start_iter = resumed
    else:
        state = base.withColumn("rank", F.lit(1.0 / n))
        start_iter = 0

    d = float(damping)
    with runner.loop_conf():
        # scalars for the upcoming superstep: total mass S, dangling
        # mass S_d (this first action also materializes `base`); the
        # weighted path's negative-weight probe is cross-joined in —
        # two single-row aggregates, ONE driver action
        agg_df = state.agg(
            F.sum("rank").alias("S"),
            F.sum(F.when(~F.col("non_dangling"), F.col("rank")).otherwise(0.0)).alias("Sd"),
        )
        if weighted:
            agg_df = agg_df.crossJoin(minw_df)
        agg0 = agg_df.first()
        S, Sd = float(agg0["S"]), float(agg0["Sd"])
        if weighted:
            minw = agg0["_minw"]
            if minw is not None and minw < 0:
                warnings.warn(
                    "negative weights clamped to 0 (igraph semantics, "
                    "src/centrality.c:1451-1455)"
                )

        for it in range(start_iter, max_iter):
            sumfrom = (1.0 - d) * (S - Sd) + Sd

            msgs = state.select(F.col("id").alias("src"), "rank").join(contrib, "src")
            if salt_buckets > 1:
                partial = (
                    msgs.withColumn(
                        "_salt", F.pmod(F.xxhash64("src", F.lit(it)), F.lit(salt_buckets))
                    )
                    .groupBy("dst", "_salt")
                    .agg(F.sum(F.col("rank") * F.col("p")).alias("acc"))
                )
                acc = partial.groupBy("dst").agg(F.sum("acc").alias("acc"))
            else:
                acc = msgs.groupBy("dst").agg(F.sum(F.col("rank") * F.col("p")).alias("acc"))

            new_state = (
                state.join(acc, state.id == acc.dst, "left")
                .select(
                    "id",
                    "non_dangling",
                    "reset",
                    F.col("rank").alias("_old"),
                    (
                        F.lit(d) * F.coalesce(F.col("acc"), F.lit(0.0))
                        + F.lit(sumfrom) * F.col("reset")
                    ).alias("rank"),
                )
            )
            # ONE action: convergence delta + next superstep's scalars
            new_state = runner.materialize(
                new_state.select("id", "non_dangling", "reset", "rank", "_old"), it
            )
            delta_expr = (
                F.max(F.abs(F.col("rank") - F.col("_old")))
                if norm == "max"
                else F.sum(F.abs(F.col("rank") - F.col("_old")))
            )
            stats = new_state.agg(
                delta_expr.alias("delta"),
                F.sum("rank").alias("S"),
                F.sum(
                    F.when(~F.col("non_dangling"), F.col("rank")).otherwise(0.0)
                ).alias("Sd"),
            ).first()
            delta, S, Sd = float(stats["delta"]), float(stats["S"]), float(stats["Sd"])
            runner.finish_iteration(it, delta, extra={"mass": S, "dangling_mass": Sd})
            state = new_state.drop("_old")
            if delta < tol:
                state = runner.finalize(state, it, delta)
                break
        else:
            if max_iter > start_iter and delta >= tol > 0:
                warnings.warn(
                    f"pagerank did not reach tol={tol} within max_iter={max_iter} "
                    f"(last delta={delta:.3e}) — result is the max_iter-th iterate "
                    "(igraph errors on non-convergence)",
                    RuntimeWarning,
                )

    return state.select("id", "rank")
