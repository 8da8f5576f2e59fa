"""Newman's leading-eigenvector community detection.

Reference: igraph_community_leading_eigenvector
(/root/reference/src/community.c:1411-1700): recursive modularity
bisection — for the current community g, find the leading (largest
algebraic) eigenvector of the restricted modularity matrix

    B(g)_ij = A_ij − k_i k_j / 2m − δ_ij (k_i^g − k_i K_g / 2m)

(k_i = total degree, k_i^g = degree within g, K_g = Σ_{l∈g} k_l) and
split g by the eigenvector's sign pattern, keeping the split only when
its leading eigenvalue is positive and the modularity change
ΔQ = sᵀB(g)s / 4m is positive. The reference runs ARPACK per
community, one community at a time.

Spark-first design — **batch bisection**: every still-active community
power-iterates SIMULTANEOUSLY. The state is one (comm, id, x)
DataFrame; B(g)·x for every g at once is one within-community edge
join plus per-community aggregates (k·x, normalization), because the
B(g) blocks of different communities touch disjoint vertex sets. An
outer round therefore costs `power_iters` supersteps regardless of how
many communities are splitting — O(log k) rounds for k final
communities, the same superstep shape as PageRank.

Power iteration needs the largest-*algebraic* eigenvalue, so each
community iterates the shifted matrix B(g) + σ_g·I with a Gershgorin
bound σ_g ≥ |λ_min| computed per community (one aggregate); the
Rayleigh quotient of the converged vector then decides positivity.

Determinism: the start vector is a seeded hash in [-1, 1] per vertex
(ARPACK's random start makes the reference nondeterministic; a fixed
hash makes this reproducible run-to-run). Final labels are dense
0..k-1 by first appearance in vertex-id order, like LPA/Louvain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import renumber_first_appearance
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def leading_eigenvector_communities(
    graph: LinkGraph,
    weighted: bool = True,
    max_rounds: int = 8,
    power_iters: int = 60,
    tol: float = 1e-7,
    seed: int = 42,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Leading-eigenvector communities → (id, label).

    ``max_rounds`` bounds the bisection depth (≤ 2^max_rounds
    communities); ``power_iters`` bounds each round's power iteration.
    Direction is ignored (modularity is undirected in the reference).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "leading_eigenvector")

    e0 = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    # symmetric simple arcs, multi-edges collapsed, loops dropped
    # (igraph ignores loops for modularity's adjacency term)
    und = (
        e0.select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
            "weight",
        )
        .filter(F.col("a") != F.col("b"))
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

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    verts = (
        graph.vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce("k", F.lit(0.0)).alias("k"))
        .repartition("id")
        .localCheckpointFlat(eager=True)
    )
    m2 = verts.agg(F.sum("k")).first()[0] or 0.0
    if m2 <= 0:
        return renumber_first_appearance(
            graph.vertices().withColumn("label", F.col("id"))
        )

    # membership: (id, k, comm, active)
    state = verts.select(
        "id", "k", F.lit(0).cast("long").alias("comm"), F.lit(True).alias("active")
    ).localCheckpointFlat(eager=True)

    superstep = 0
    for _round in range(max_rounds):
        act = state.filter("active")
        if act.limit(1).count() == 0:
            break
        # within-community arcs among active communities (static per round)
        release_round = runner.protect_scope()
        cs = act.select(F.col("id").alias("src"), F.col("comm"))
        cd = act.select(F.col("id").alias("dst"), F.col("comm").alias("_cd"))
        wedges = (
            sym.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("comm") == F.col("_cd"))
            .select("src", "dst", "weight", "comm")
            .repartition("src")
            .localCheckpointFlat(eager=True)
        )
        # per-vertex within-community degree; per-community totals
        kg = wedges.groupBy(F.col("dst").alias("id"), "comm").agg(
            F.sum("weight").alias("kg")
        )
        base = (
            act.join(kg.drop("comm"), "id", "left")
            .select("id", "k", "comm", F.coalesce("kg", F.lit(0.0)).alias("kg"))
            .localCheckpointFlat(eager=True)
        )
        ctot = base.groupBy("comm").agg(F.sum("k").alias("ktot"))
        # Gershgorin shift: B_ii − R_i ≥ −2·k_i^g (the −k²/2m diagonal
        # and off-diagonal k_ik_j/2m masses cancel), so λmin ≥ −2·max kg
        # and σ = 2·max kg makes B+σI's top eigenvalue the algebraic max
        sigma = base.groupBy("comm").agg(
            (2.0 * F.max("kg")).alias("sigma")
        )
        cinfo = ctot.join(sigma, "comm").localCheckpointFlat(eager=True)

        # deterministic start vector in [-1, 1]
        x = base.select(
            "id",
            "k",
            "comm",
            "kg",
            (
                (F.abs(F.xxhash64(F.lit(seed), F.lit(_round), F.col("id"))) % 2000001)
                / 1000000.0
                - 1.0
            ).alias("x"),
        ).localCheckpointFlat(eager=True)
        # this round's wedges/base/cinfo/x are loop-static for the inner
        # power iteration: exempt them from the runner's generation
        # sweep; release_round() drops them once the round's successor
        # state is checkpointed (else every round's statics pile up)
        runner.reprotect()

        def matvec(xdf, shifted: bool):
            """y = B(g)·x (+ σ_g·x when shifted), per community."""
            msgs = (
                xdf.select(F.col("id").alias("src"), F.col("x"))
                .join(wedges, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("weight") * F.col("x")).alias("ax"))
            )
            kx = xdf.groupBy("comm").agg(F.sum(F.col("k") * F.col("x")).alias("kx"))
            j = (
                xdf.join(msgs, "id", "left")
                .join(kx, "comm")
                .join(cinfo, "comm")
            )
            y = (
                F.coalesce("ax", F.lit(0.0))
                - F.col("k") * F.col("kx") / m2
                - (F.col("kg") - F.col("k") * F.col("ktot") / m2) * F.col("x")
            )
            if shifted:
                y = y + F.col("sigma") * F.col("x")
            return j.select("id", "k", "comm", "kg", y.alias("x"))

        for _t in range(power_iters):
            y = matvec(x, shifted=True)
            # the all-ones vector is ALWAYS a 0-eigenvector of B(g)
            # (row sums vanish by construction); under the shift it
            # competes at σ with the leading λ1+σ and poisons the sign
            # pattern, so deflate it every iteration (eigenvectors of a
            # symmetric matrix are orthogonal — deflation is exact).
            # ||y−μ||² = Σy² − n·μ², one aggregate for both
            stats = y.groupBy("comm").agg(
                F.sum("x").alias("_s"),
                F.sum(F.col("x") * F.col("x")).alias("_ss"),
                F.count("*").alias("_n"),
            )
            x_new = y.join(stats, "comm").select(
                "id",
                "k",
                "comm",
                "kg",
                F.when(
                    F.sqrt(
                        F.greatest(
                            F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n"),
                            F.lit(0.0),
                        )
                    )
                    > 1e-300,
                    (F.col("x") - F.col("_s") / F.col("_n"))
                    / F.sqrt(
                        F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n")
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("x"),
            )
            x_new = runner.materialize(x_new, superstep)
            # delta is the per-iteration action; the shifted matrix is
            # diagonally dominant so x converges without sign flips and
            # early exit is safe
            delta = (
                x_new.join(x.select("id", F.col("x").alias("_px")), "id")
                .agg(F.max(F.abs(F.col("x") - F.col("_px"))))
                .first()[0]
            )
            runner.finish_iteration(superstep, float(delta or 0.0))
            superstep += 1
            x = x_new
            # 1e-7 on a unit vector: far below any sign-decision margin
            if delta is not None and delta < 1e-7:
                break

        # Rayleigh quotient λ = xᵀB(g)x per community (x is unit)
        bx = matvec(x, shifted=False).select(
            "id", F.col("x").alias("bx")
        )
        lam = (
            x.join(bx, "id")
            .groupBy("comm")
            .agg(F.sum(F.col("x") * F.col("bx")).alias("lam"))
        )
        # ΔQ = sᵀB(g)s / 4m with s = sign(x)
        s = x.select(
            "id", "k", "comm", "kg",
            F.when(F.col("x") >= 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("x"),
        )
        bs = matvec(s, shifted=False).select("id", F.col("x").alias("bs"))
        dq = (
            s.join(bs, "id")
            .groupBy("comm")
            .agg((F.sum(F.col("x") * F.col("bs")) / (2.0 * m2)).alias("dq"))
        )
        verdict = lam.join(dq, "comm").select(
            "comm",
            ((F.col("lam") > tol) & (F.col("dq") > tol)).alias("split"),
        )
        n_split = verdict.filter("split").count()
        if n_split == 0:
            state = state.withColumn("active", F.lit(False))
            state = state.localCheckpointFlat(eager=True)
            release_round()
            break
        side = s.select("id", (F.col("x") > 0).alias("pos"))
        new_state = (
            state.join(verdict, "comm", "left")
            .join(side, "id", "left")
            .select(
                "id",
                "k",
                F.when(
                    F.coalesce("split", F.lit(False)),
                    F.col("comm") * 2 + F.when(F.col("pos"), 1).otherwise(0),
                )
                .otherwise(F.col("comm") * 2)
                .alias("comm"),
                # a community that declined to split is final; splits stay
                # active for the next round
                (F.col("active") & F.coalesce("split", F.lit(False))).alias(
                    "active"
                ),
            )
        )
        state = new_state.localCheckpointFlat(eager=True)
        release_round()

    return renumber_first_appearance(
        state.select("id", F.col("comm").alias("label"))
    )
