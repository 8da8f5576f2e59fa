"""Multilevel (Louvain) community detection.

Reference: igraph_community_multilevel
(/root/reference/src/community.c:2851-3010), Blondel et al. 2008: repeat
{local-move phase to a modularity local optimum; contract communities
into a supergraph} until modularity stops improving.

The reference's local-move phase is sequential (vertices visited in
order, each move immediately visible). The distributed variant here is
the standard synchronous adaptation (Wickramaarachchi et al., HPEC'14):

- every vertex simultaneously evaluates the modularity gain of adopting
  each neighboring community given the *current* assignment:
  ΔQ(i→c) ∝ k_{i,c} − k_i·Σtot(c)/(2m)   (after removing i from its own
  community's Σtot) and moves to the best strictly-positive-gain
  community (ties → smallest community label — deterministic);
- simultaneous moves can oscillate (two vertices swapping), so a sweep
  moves only half of the candidates — a seeded-hash split redrawn every
  other sweep (a static id-parity split permanently pins each colliding
  pair's loser and stalls at a poor optimum); sweeps stop at fixpoint
  or cap;
- then communities contract via the supergraph aggregate
  (LinkGraph.contract_vertices semantics: groupBy community pair,
  sum weights, self-loops = intra-community mass) and the next level
  runs on a graph whose size is the community count.

Per sweep: one edge-size join + two vertex-size aggregates — the same
message shape as LPA with weights. The level loop multiplies that by
O(log n) levels in practice.

The partition is deterministic for a given input; the exact communities
may differ from the reference's (its sequential visit order is itself
an arbitrary tie-break — igraph's own tests assert modularity quality,
not exact membership). Output labels are canonical: dense 0..k-1 by
first appearance in vertex-id order (same contract as LPA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import modularity, renumber_first_appearance


def _local_moves(
    edges: DataFrame,
    verts: DataFrame,
    m2: float,
    max_sweeps: int,
) -> DataFrame:
    """One Louvain level: synchronous parity-alternating local moves.

    ``edges``: symmetric weighted (src, dst, weight), no self-loops —
    plus per-vertex ``self_w`` loop mass carried on ``verts``
    (id, k_i, self_w). Returns (id, comm).
    """
    labels = verts.select("id", F.col("id").alias("comm"), "k_i")
    labels = labels.repartition("id").localCheckpointFlat(eager=True)

    zero_streak = 0
    for sweep in range(max_sweeps):
        # community totals under the current assignment
        tot = labels.groupBy("comm").agg(F.sum("k_i").alias("sigma_tot"))
        # weight from each vertex to each neighboring community
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("comm").alias("nc")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "nc")
            .agg(F.sum("weight").alias("k_ic"))
        )
        cur = labels.select("id", "comm", "k_i")
        # candidate gain: k_ic − k_i·Σtot'(c)/m2, where Σtot' removes i
        # from its own community (standard remove-then-insert form)
        cand = (
            nbr.join(cur, "id")
            .join(tot.withColumnRenamed("comm", "nc"), "nc")
            .select(
                "id",
                "comm",
                "nc",
                "k_i",
                (
                    F.col("k_ic")
                    - F.col("k_i")
                    * (
                        F.col("sigma_tot")
                        - F.when(F.col("nc") == F.col("comm"), F.col("k_i")).otherwise(
                            0.0
                        )
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
                "stay_gain"
            ),
        )
        moves = best.select(
            "id",
            F.col("b.c").alias("new_comm"),
            (
                (F.col("b.g") > F.coalesce(F.col("stay_gain"), F.lit(0.0)) + 1e-12)
                # symmetric-breaking half-split, REDRAWN every other
                # sweep (seeded hash): a static id%2 split permanently
                # pins each colliding pair's loser and stalls at a poor
                # optimum (karate: q 0.28 static vs 0.42 redrawn —
                # above igraph's sequential 0.4188)
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
        # local optimum = a full SAME-SEED parity cycle (both halves of
        # one hash draw) without a single move; the streak must end on
        # an odd sweep — sweeps 2k-1 and 2k use different seeds, and a
        # streak spanning them leaves ~25% of vertices (parity-
        # mismatched under both draws) never move-eligible
        zero_streak = zero_streak + 1 if changed == 0 else 0
        if zero_streak >= 2 and sweep % 2 == 1:
            break
    return labels.select("id", "comm")


def multilevel_communities(
    graph: LinkGraph,
    weighted: bool = True,
    max_levels: int = 5,
    max_sweeps: int = 12,
) -> DataFrame:
    """Louvain communities → (id, label), labels dense 0..k-1 by first
    appearance in vertex-id order. Direction is ignored like the
    reference (modularity is an undirected quantity there)."""
    e0 = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    # canonical undirected simple-ish form: collapse multi-edges,
    # keep self-loop mass separate
    und = (
        e0.select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
        .localCheckpointFlat(eager=True)
    )
    m_tot = und.agg(F.sum("w")).first()[0]
    if not m_tot:
        return renumber_first_appearance(
            graph.vertices().withColumn("label", F.col("id"))
        )
    m2 = 2.0 * float(m_tot)

    # membership of ORIGINAL vertices in the current level's supernodes
    membership = graph.vertices().select("id", F.col("id").alias("node"))
    membership = membership.localCheckpointFlat(eager=True)
    cur = und
    # baseline objective of the singleton partition: a level is adopted
    # only if it strictly improves, so a jointly-regressing synchronous
    # sweep can never make the RETURNED partition worse than its
    # predecessor (isolated moves are gated on ΔQ but simultaneous
    # accepted moves can interact)
    prev_q = modularity(
        graph,
        graph.vertices().select("id", F.col("id").alias("c")),
        weighted=weighted,
    )

    for _level in range(max_levels):
        nonloop = cur.filter(F.col("a") != F.col("b"))
        sym = nonloop.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
        ).union(
            nonloop.select(
                F.col("b").alias("src"), F.col("a").alias("dst"), F.col("w").alias("weight")
            )
        )
        sym = sym.repartition("src").localCheckpointFlat(eager=True)
        self_w = cur.filter(F.col("a") == F.col("b")).select(
            F.col("a").alias("id"), F.col("w").alias("self_w")
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("kd"))
        verts = (
            cur.select(F.col("a").alias("id"))
            .union(cur.select(F.col("b").alias("id")))
            .distinct()
            .join(deg, "id", "left")
            .join(self_w, "id", "left")
            .select(
                "id",
                (
                    F.coalesce("kd", F.lit(0.0)) + 2.0 * F.coalesce("self_w", F.lit(0.0))
                ).alias("k_i"),
            )
            .localCheckpointFlat(eager=True)
        )
        comm = _local_moves(sym, verts, m2, max_sweeps)
        # fold into original-vertex membership — adopted only below,
        # after the objective check, so a regressing level is discarded
        # rather than returned
        folded = (
            membership.join(
                comm.select(F.col("id").alias("node"), "comm"), "node", "left"
            )
            .select("id", F.coalesce("comm", F.col("node")).alias("node"))
            .localCheckpointFlat(eager=True)
        )
        q = modularity(
            graph, folded.select("id", F.col("node").alias("c")), weighted=weighted
        )
        if q <= prev_q + 1e-12:
            break
        membership = folded
        prev_q = q
        # contract to the supergraph for the next level
        ca = comm.select(F.col("id").alias("a"), F.col("comm").alias("ca"))
        cb = comm.select(F.col("id").alias("b"), F.col("comm").alias("cb"))
        cur = (
            cur.join(ca, "a")
            .join(cb, "b")
            .select(
                F.greatest("ca", "cb").alias("a"),
                F.least("ca", "cb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .localCheckpointFlat(eager=True)
        )
        n_nodes = cur.select(F.col("a").alias("x")).union(
            cur.select(F.col("b").alias("x"))
        ).distinct().count()
        if n_nodes <= 1:
            break

    return renumber_first_appearance(
        membership.select("id", F.col("node").alias("label"))
    )
