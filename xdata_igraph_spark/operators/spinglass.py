"""Spinglass community detection — Reichardt–Bornholdt Potts model.

Reference: igraph_community_spinglass
(/root/reference/src/clustertool.cpp:98, the RB implementation in
/root/reference/src/NetDataTypes.h + pottsmodel_2.cpp; Reichardt &
Bornholdt 2006).  The reference minimizes the RB Hamiltonian with the
configuration null model

    H(σ) = − Σ_{(i,j)∈E} w_ij δ(σ_i,σ_j)
           + γ Σ_{i<j} (k_i k_j / 2m) δ(σ_i,σ_j)

by sequential single-spin Metropolis updates under simulated annealing
(start temperature → stop temperature by a cooling factor).  At γ=1
minimizing H is equivalent to maximizing modularity, so the per-move
gain tables are exactly Louvain's (operators/louvain.py); only the
acceptance rule differs — stochastic Metropolis at temperature T
instead of greedy argmax.

Distributed variant: synchronous sweeps.  Each sweep builds the
(vertex, neighboring-spin) weight table and per-spin Σk totals (the
same two aggregates as a Louvain sweep), every vertex proposes its
best candidate spin, and the move is accepted when ΔH < 0 or with
probability exp(−ΔH/T) — the uniform draw is a seeded xxhash64 coin,
so runs are bit-reproducible at any parallelism.  The same
redrawn-parity half-split as Louvain/LPA damps synchronous
oscillation.  The temperature ladder multiplies T by ``cooling`` each
sweep from ``start_temp`` down to ``stop_temp``, after which sweeps
are pure greedy (T≈0) until a parity-pair fixpoint.

Like the reference (which restarts from random spins and is explicitly
nondeterministic across runs), the result is a local optimum; tests
assert recovery on planted structures and final-H quality, not exact
membership.  Proposals are restricted to spins present in the
neighborhood (plus the vertex's own), the standard sparse-graph
optimization — an isolated spin flip to a non-neighbor spin only ever
raises the edge term and is never the argmin proposal at low T.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import renumber_first_appearance


def spinglass_communities(
    graph: LinkGraph,
    spins: int = 25,
    gamma: float = 1.0,
    start_temp: float = 1.0,
    stop_temp: float = 0.01,
    cooling: float = 0.7,
    max_sweeps: int = 40,
    weighted: bool = True,
    seed: int = 42,
    check_connectivity: bool = True,
) -> DataFrame:
    """Spinglass communities → (id, label), labels dense 0..k-1 by
    first appearance in vertex-id order.

    ``spins``: number of initial random spin states (the reference's
    default 25); ``gamma``: null-model coupling (γ=1 ≡ modularity).
    The annealing ladder runs T = start_temp · cooling^t clamped at
    stop_temp; with the defaults that is ~11 tempered sweeps followed
    by greedy sweeps until a full parity pair passes with no move.

    The reference refuses unconnected graphs (community_spinglass
    checks connectivity up front: proposals only ever visit neighbor
    spins, so two components that hash-initialize onto the same spin
    could never be separated). We match: ``check_connectivity=True``
    (default) raises on an unconnected input; pass False only when the
    caller has already established connectivity (e.g. running per
    ``decompose()`` component — the reference's documented recipe).
    """
    if spins < 1:
        raise ValueError("spins must be >= 1")
    spark = graph.spark
    n = graph.vcount()
    if n == 0:
        return spark.createDataFrame([], "id long, label long")
    if check_connectivity:
        from xdata_igraph_spark.operators.components import is_connected

        if not is_connected(graph, mode="weak"):
            raise ValueError(
                "spinglass_communities cannot work with unconnected graphs "
                "(matching the reference); run it per wcc/decompose component"
            )

    e0 = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    nonloop = e0.select("src", "dst", "weight").filter(F.col("src") != F.col("dst"))
    und = (
        nonloop.select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
    )
    sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
    ).union(
        und.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), F.col("w").alias("weight")
        )
    )
    sym = sym.repartition("src").localCheckpointFlat(eager=True)
    m_tot = sym.agg(F.sum("weight")).first()[0]
    if not m_tot:
        return renumber_first_appearance(
            graph.vertices().withColumn("label", F.col("id"))
        )
    m2 = float(m_tot)  # sym carries each edge twice: Σweight == 2m

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k_i"))
    verts = (
        graph.vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce("k_i", F.lit(0.0)).alias("k_i"))
    )
    labels = verts.select(
        "id",
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit("init")), F.lit(spins))
        .alias("comm"),
        "k_i",
    )
    labels = labels.repartition("id").localCheckpointFlat(eager=True)

    zero_streak = 0
    for sweep in range(max_sweeps):
        temp = max(start_temp * (cooling ** sweep), stop_temp)
        tot = labels.groupBy("comm").agg(F.sum("k_i").alias("sigma_tot"))
        nbr = (
            sym.join(
                labels.select(F.col("id").alias("dst"), F.col("comm").alias("nc")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "nc")
            .agg(F.sum("weight").alias("k_ic"))
        )
        cur = labels.select("id", "comm", "k_i").join(tot, "comm").select(
            "id", "comm", "k_i", F.col("sigma_tot").alias("sig_own")
        )
        # per-spin energy gain of i sitting in spin s:
        #   g(s) = k_is − γ·k_i·(Σ'_s)/m2, Σ' excluding i itself;
        # ΔH(i: a→c) = g(a) − g(c).  Unlike Louvain's greedy argmax
        # (where overstating g(a) only *misses* improving moves), the
        # Metropolis probability needs the exact value, so g(a) keeps
        # its null-model term even when i has NO intra-spin neighbors
        # (k_ia = 0 — the common case with `spins` random initials).
        cand = (
            nbr.join(cur, "id")
            .join(tot.withColumnRenamed("comm", "nc"), "nc")
            .select(
                "id",
                "comm",
                "nc",
                "k_i",
                "sig_own",
                (
                    F.col("k_ic")
                    - F.lit(gamma)
                    * F.col("k_i")
                    * (
                        F.col("sigma_tot")
                        - F.when(
                            F.col("nc") == F.col("comm"), F.col("k_i")
                        ).otherwise(0.0)
                    )
                    / F.lit(m2)
                ).alias("gain"),
            )
        )
        best = cand.groupBy("id").agg(
            F.max_by(
                F.struct(F.col("nc").alias("c"), F.col("gain").alias("g")),
                F.struct(F.col("gain"), -F.col("nc")),
            ).alias("b"),
            F.max(F.when(F.col("nc") == F.col("comm"), F.col("gain"))).alias(
                "stay_raw"
            ),
            F.first("k_i").alias("k_i"),
            F.first("sig_own").alias("sig_own"),
        )
        stay_gain = F.coalesce(
            F.col("stay_raw"),
            -F.lit(gamma)
            * F.col("k_i")
            * (F.col("sig_own") - F.col("k_i"))
            / F.lit(m2),
        )
        dh = stay_gain - F.col("b.g")  # ΔH of the proposed move
        # Metropolis: accept if ΔH<0, else with prob exp(−ΔH/T); the
        # uniform draw is a per-(vertex, sweep) hash coin in [0,1)
        coin = (
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(seed), F.lit(sweep), F.lit("mh")),
                F.lit(1_000_000_007),
            ).cast("double")
            / 1_000_000_007.0
        )
        accept = (dh < -1e-12) | (
            (F.lit(temp) > F.lit(stop_temp) * 1.0001)
            & (coin < F.exp(-dh / F.lit(temp)))
        )
        moves = best.select(
            "id",
            F.col("b.c").alias("new_comm"),
            (
                accept
                # redrawn-parity half-split (see louvain._local_moves)
                & (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(sweep // 2)), F.lit(2))
                    == F.lit(sweep % 2)
                )
            ).alias("do_move"),
        )
        new_labels = (
            labels.join(moves, "id", "left")
            .select(
                "id",
                "k_i",
                F.col("comm").alias("_old"),
                F.when(F.coalesce("do_move", F.lit(False)), F.col("new_comm"))
                .otherwise(F.col("comm"))
                .alias("comm"),
            )
            .localCheckpointFlat(eager=False)
        )
        changed = new_labels.filter(F.col("comm") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        zero_streak = zero_streak + 1 if changed == 0 else 0
        # converged: a full same-seed parity pair without a move, AND
        # the ladder has reached the greedy floor (tempered sweeps
        # accept uphill moves, so a quiet tempered pair is luck, not a
        # fixpoint)
        if zero_streak >= 2 and sweep % 2 == 1 and temp <= stop_temp * 1.0001:
            break

    return renumber_first_appearance(labels.select("id", F.col("comm").alias("label")))
