"""SIR epidemic simulation — batched discrete-time compartment model.

Reference: igraph_sir (/root/reference/src/sir.c:107). The reference
runs a continuous-time Gillespie chain per simulation (one event at a
time — inherently sequential); the distributed re-expression is the
standard tau-leaping discretization: per step of length ``dt`` a
susceptible with k infected neighbors becomes infected with
probability 1 - exp(-beta*k*dt) and an infected recovers with
probability 1 - exp(-gamma*dt) (both exact marginals of the
reference's exponential clocks over a dt window; as dt → 0 the chain
converges to Gillespie). Edge directions are ignored exactly like the
reference (sir.c warns and symmetrizes).

Scale shape: ALL simulations advance together in ONE (sim, id)-keyed
state DataFrame — the same batching trick as the multi-source Brandes
betweenness — so a step is one join against the arc table plus one
aggregate regardless of ``no_sim``. Randomness is a deterministic
xxhash64 coin per (sim, id, step, seed): reproducible, no RNG state,
identical on any cluster size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph

S, I, R = 0, 1, 2


def sir(
    graph: LinkGraph,
    beta: float,
    gamma: float,
    no_sim: int = 8,
    dt: float = 0.25,
    max_steps: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Run ``no_sim`` SIR epidemics, each seeded with one hash-chosen
    infected vertex (the reference picks uniformly at random,
    sir.c:107) → census DataFrame ``(sim, step, time, NS, NI, NR)``,
    one row per simulation per step, ending when every simulation has
    no infected vertices left (or at ``max_steps``)."""
    if beta < 0 or gamma < 0:
        raise ValueError("beta and gamma must be non-negative")
    n = graph.vcount()
    if n == 0:
        return graph.spark.createDataFrame(
            [], "sim int, step int, time double, NS long, NI long, NR long"
        )
    spark = graph.spark

    arcs = (
        graph.symmetrized()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )

    sims = spark.range(no_sim).select(F.col("id").cast("int").alias("sim"))
    # patient zero: the vertex minimizing xxhash64(sim, id) — uniform
    # over the ACTUAL vertex set (ids need not be contiguous 0..n-1),
    # deterministic, one aggregate (no driver-side vertex list)
    grid = sims.crossJoin(graph.vertices())
    h0 = F.xxhash64(F.col("sim"), F.col("id"), F.lit(seed), F.lit("p0"))
    p0 = (
        grid.groupBy("sim")
        .agg(F.min_by(F.col("id"), F.struct(h0, F.col("id"))).alias("p0"))
    )
    state = (
        grid.join(F.broadcast(p0), "sim")
        .select(
            "sim", "id",
            F.when(F.col("id") == F.col("p0"), F.lit(I)).otherwise(F.lit(S)).alias("state"),
        )
        .localCheckpointFlat(eager=True)
    )

    p_rec = 1.0 - math.exp(-gamma * dt)
    rows: list[tuple] = []
    for step in range(max_steps + 1):
        census = {
            (int(r["sim"]), int(r["state"])): int(r["c"])
            for r in state.groupBy("sim", "state").agg(F.count("*").alias("c")).collect()
        }
        total_ni = 0
        for s_id in range(no_sim):
            ns, ni, nr = (census.get((s_id, c), 0) for c in (S, I, R))
            rows.append((s_id, step, step * dt, ns, ni, nr))
            total_ni += ni
        if total_ni == 0 or step == max_steps:
            break

        inf_neigh = (
            state.filter(F.col("state") == I)
            .select("sim", F.col("id").alias("src"))
            .join(arcs, "src")
            .groupBy("sim", F.col("dst").alias("id"))
            .agg(F.count("*").alias("k"))
        )
        coin = (
            F.pmod(
                F.xxhash64(F.col("sim"), F.col("id"), F.lit(step), F.lit(seed)),
                F.lit(1_000_000),
            )
            / 1_000_000.0
        )
        p_inf = 1.0 - F.exp(-F.lit(beta * dt) * F.col("k"))
        state = (
            state.join(inf_neigh, ["sim", "id"], "left")
            .fillna(0, subset=["k"])
            .select(
                "sim", "id",
                F.when(
                    (F.col("state") == S) & (F.col("k") > 0) & (coin < p_inf),
                    F.lit(I),
                )
                .when(
                    (F.col("state") == I) & (coin < F.lit(p_rec)), F.lit(R)
                )
                .otherwise(F.col("state"))
                .alias("state"),
            )
            .localCheckpointFlat(eager=True)
        )

    return spark.createDataFrame(
        rows, "sim int, step int, time double, NS long, NI long, NR long"
    )
