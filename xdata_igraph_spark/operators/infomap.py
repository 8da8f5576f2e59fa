"""Infomap community detection — the two-level map equation.

Reference: igraph_community_infomap (/root/reference/src/infomap.cc,
infomap_Greedy.cc; Rosvall & Bergstrom 2008). The reference's optimizer
is a sequential greedy walk with simulated-annealing-style restarts;
the distributed variant here reuses the synchronous local-move /
contract skeleton of Louvain (operators/louvain.py — the published
"RelaxMap" family shows map-equation local moves parallelize the same
way modularity's do), swapping the objective for the exact two-level
codelength.

Flow model: undirected link dynamics — the random walk's stationary
visit rate is exactly p_a = k_a / 2m (no power iteration needed), and
a module m's exit probability is its cut: q_m = cut(m) / 2m. Directed
input is symmetrized like the reference's undirected mode (its
directed mode runs PageRank-with-teleportation flow — implemented
below as ``infomap_communities_directed``).

Two-level codelength, expanded module-aggregate form (logs base 2,
f(x) = x·log2(x), f(0) = 0):

    L(M) = f(q) − 2·Σ_m f(q_m) + Σ_m f(q_m + p_m) − Σ_a f(p_a)

with q = Σ_m q_m and p_m = Σ_{a∈m} p_a. Every term is a per-module
aggregate; the last is partition-independent. A single vertex move
touches only its source and target modules plus the global q, so the
synchronous sweep evaluates the EXACT ΔL of each isolated move given
the current assignment — one edge-size join + module-size aggregates
per sweep, the same plan shape (and the same redrawn-parity oscillation
damping) as Louvain. Levels contract communities into supernodes whose
self-loops carry intra-module mass; the map equation is invariant under
that contraction, so the level loop is identical to Louvain's.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import renumber_first_appearance


def _f(col):
    """x·log2(x) with f(0) = 0 (entropy convention)."""
    return F.when(col > 0, col * F.log2(col)).otherwise(F.lit(0.0))


def _und_edges(graph: LinkGraph, weighted: bool) -> DataFrame:
    e0 = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    return (
        e0.select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
    )


def _require_full_membership(graph: LinkGraph, mem: DataFrame) -> None:
    """Raise if ``mem`` misses any vertex — inner-joining edges against
    a partial membership would silently drop mass and return a
    codelength that belongs to no partition of the graph."""
    missing = graph.vertices().join(mem, "id", "left_anti").limit(1).count()
    if missing:
        raise ValueError(
            "membership does not cover every vertex of the graph — a "
            "partial membership would silently drop edge/visit mass "
            "from the codelength"
        )


def codelength(
    graph: LinkGraph, membership: DataFrame, weighted: bool = True
) -> float:
    """Exact two-level map-equation codelength (bits per step) of a
    given partition — the quantity igraph_community_infomap reports as
    ``codelength``. ``membership``: (id, <label>) DataFrame covering
    every vertex (partial memberships raise)."""
    mem = membership.select(
        F.col(membership.columns[0]).alias("id"),
        F.col(membership.columns[1]).alias("comm"),
    )
    _require_full_membership(graph, mem)
    und = _und_edges(graph, weighted)
    m_tot = und.agg(F.sum("w")).first()[0]
    if not m_tot:
        return 0.0
    return _codelength_from_und(und, 2.0 * float(m_tot), mem)


def _codelength_from_und(und: DataFrame, m2: float, mem: DataFrame) -> float:
    """Codelength from an already-built canonical undirected edge table
    (the level loop reuses its level-0 checkpoint instead of rebuilding
    ``und`` from the graph every level)."""
    ca = mem.select(F.col("id").alias("a"), F.col("comm").alias("ca"))
    cb = mem.select(F.col("id").alias("b"), F.col("comm").alias("cb"))
    tagged = und.join(ca, "a").join(cb, "b")
    # per-module Σtot (loops count twice, igraph degree convention) and
    # intra mass I_m (each intra edge once, loops once): cut = Σtot − 2I
    half = tagged.select(F.col("ca").alias("comm"), F.col("w").alias("kw")).unionAll(
        tagged.select(F.col("cb").alias("comm"), F.col("w").alias("kw"))
    )
    tot = half.groupBy("comm").agg(F.sum("kw").alias("sigma"))
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.sum("w").alias("i_m"))
    )
    stats = tot.join(intra, "comm", "left").select(
        "comm",
        (F.col("sigma") / m2).alias("p_m"),
        (
            (F.col("sigma") - 2.0 * F.coalesce("i_m", F.lit(0.0))) / m2
        ).alias("q_m"),
    )
    agg = stats.agg(
        F.sum("q_m").alias("q"),
        F.sum(_f(F.col("q_m"))).alias("sfq"),
        F.sum(_f(F.col("q_m") + F.col("p_m"))).alias("sfp"),
    ).first()
    # −Σ_a f(p_a): per-vertex visit-rate entropy term
    pa = (
        und.select(F.col("a").alias("id"), F.col("w").alias("kw"))
        .unionAll(und.select(F.col("b").alias("id"), F.col("w").alias("kw")))
        .groupBy("id")
        .agg(F.sum("kw").alias("k"))
        .agg(F.sum(_f(F.col("k") / m2)))
        .first()[0]
    )
    q, sfq, sfp = float(agg["q"]), float(agg["sfq"]), float(agg["sfp"])
    fq = q * math.log2(q) if q > 0 else 0.0
    return fq - 2.0 * sfq + sfp - float(pa or 0.0)


def _infomap_moves(
    edges: DataFrame,
    verts: DataFrame,
    m2: float,
    max_sweeps: int,
) -> DataFrame:
    """One level of synchronous map-equation local moves.

    ``edges``: symmetric weighted (src, dst, weight) without loops;
    ``verts``: (id, k_i, self_w) with k_i including 2·self_w. Returns
    (id, comm). Same sweep mechanics as louvain._local_moves — only
    the gain expression differs (exact ΔL of the isolated move)."""
    labels = verts.select("id", F.col("id").alias("comm"), "k_i", "self_w")
    labels = labels.repartition("id").localCheckpointFlat(eager=True)

    zero_streak = 0
    for sweep in range(max_sweeps):
        # module stats under the current assignment
        tot = labels.groupBy("comm").agg(
            F.sum("k_i").alias("sigma"), F.sum("self_w").alias("loops")
        )
        lsrc = labels.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        ldst = labels.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        intra_nl = (
            edges.join(lsrc, "src")
            .join(ldst, "dst")
            .filter(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("comm"))
            .agg((F.sum("weight") / 2.0).alias("i_nl"))
        )
        mod = (
            tot.join(intra_nl, "comm", "left")
            .select(
                "comm",
                "sigma",
                (
                    F.coalesce("i_nl", F.lit(0.0)) + F.col("loops")
                ).alias("i_m"),
            )
            .withColumn("q_m", (F.col("sigma") - 2.0 * F.col("i_m")) / m2)
        )
        qsum = F.broadcast(mod.agg(F.sum("q_m").alias("q_all")))

        # weight from each vertex to each neighboring module
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("comm").alias("nc")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "nc")
            .agg(F.sum("weight").alias("k_ic"))
        )
        cur = labels.select("id", "comm", "k_i", "self_w")
        k_own = (
            nbr.join(cur.select("id", "comm"), "id")
            .filter(F.col("nc") == F.col("comm"))
            .select("id", F.col("k_ic").alias("k_ia"))
        )
        ma = mod.select(
            F.col("comm"),
            F.col("sigma").alias("sig_a"),
            F.col("i_m").alias("i_a"),
            F.col("q_m").alias("q_a"),
        )
        mc = mod.select(
            F.col("comm").alias("nc"),
            F.col("sigma").alias("sig_c"),
            F.col("i_m").alias("i_c"),
            F.col("q_m").alias("q_c"),
        )
        cand = (
            nbr.join(cur, "id")
            .filter(F.col("nc") != F.col("comm"))
            .join(ma, "comm")
            .join(mc, "nc")
            .join(k_own, "id", "left")
            .withColumn("k_ia", F.coalesce("k_ia", F.lit(0.0)))
            .crossJoin(qsum)
        )
        # exact post-move module terms (remove i from a, insert into c)
        qa_n = (
            F.col("sig_a")
            - F.col("k_i")
            - 2.0 * (F.col("i_a") - F.col("k_ia") - F.col("self_w"))
        ) / m2
        qc_n = (
            F.col("sig_c")
            + F.col("k_i")
            - 2.0 * (F.col("i_c") + F.col("k_ic") + F.col("self_w"))
        ) / m2
        pa_n = qa_n + (F.col("sig_a") - F.col("k_i")) / m2
        pc_n = qc_n + (F.col("sig_c") + F.col("k_i")) / m2
        pa_o = F.col("q_a") + F.col("sig_a") / m2
        pc_o = F.col("q_c") + F.col("sig_c") / m2
        q_new = F.col("q_all") + qa_n + qc_n - F.col("q_a") - F.col("q_c")
        dl = (
            (_f(q_new) - _f(F.col("q_all")))
            - 2.0 * (_f(qa_n) + _f(qc_n) - _f(F.col("q_a")) - _f(F.col("q_c")))
            + (_f(pa_n) + _f(pc_n) - _f(pa_o) - _f(pc_o))
        )
        cand = cand.select("id", "nc", dl.alias("dl"))
        best = cand.groupBy("id").agg(
            F.max_by(
                F.struct(F.col("nc").alias("c"), F.col("dl").alias("d")),
                F.struct(-F.col("dl"), -F.col("nc")),
            ).alias("b")
        )
        moves = best.select(
            "id",
            F.col("b.c").alias("new_comm"),
            (
                (F.col("b.d") < -1e-12)
                # redrawn-parity half-split — see louvain._local_moves
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
                "self_w",
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
        if zero_streak >= 2 and sweep % 2 == 1:
            break
    return labels.select("id", "comm")


def infomap_communities(
    graph: LinkGraph,
    weighted: bool = True,
    max_levels: int = 5,
    max_sweeps: int = 12,
) -> DataFrame:
    """Infomap communities → (id, label), labels dense 0..k-1 by first
    appearance in vertex-id order (the LPA/Louvain label contract).
    Accepts directed input but optimizes the undirected link-dynamics
    map equation (see module docstring)."""
    und = _und_edges(graph, weighted).localCheckpointFlat(eager=True)
    m_tot = und.agg(F.sum("w")).first()[0]
    if not m_tot:
        return renumber_first_appearance(
            graph.vertices().withColumn("label", F.col("id"))
        )
    m2 = 2.0 * float(m_tot)

    membership = graph.vertices().select("id", F.col("id").alias("node"))
    membership = membership.localCheckpointFlat(eager=True)
    cur = und
    # baseline L of the singleton partition, from the checkpointed und
    # (NOT codelength(graph, ...), which would rebuild the edge table
    # every level): a level is adopted only if it strictly shrinks L,
    # so jointly-regressing synchronous sweeps are discarded, never
    # returned
    prev_l = _codelength_from_und(
        und, m2, graph.vertices().select("id", F.col("id").alias("comm"))
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
            F.col("a").alias("id"), F.col("w").alias("sw")
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
                    F.coalesce("kd", F.lit(0.0)) + 2.0 * F.coalesce("sw", F.lit(0.0))
                ).alias("k_i"),
                F.coalesce("sw", F.lit(0.0)).alias("self_w"),
            )
            .localCheckpointFlat(eager=True)
        )
        comm = _infomap_moves(sym, verts, m2, max_sweeps)
        folded = (
            membership.join(
                comm.select(F.col("id").alias("node"), "comm"), "node", "left"
            )
            .select("id", F.coalesce("comm", F.col("node")).alias("node"))
            .localCheckpointFlat(eager=True)
        )
        cl = _codelength_from_und(
            und, m2, folded.select("id", F.col("node").alias("comm"))
        )
        if cl >= prev_l - 1e-12:
            break
        membership = folded
        prev_l = cl
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


# --------------------------------------------------------------------------
# Directed flow model (the reference's default for directed graphs):
# visit rates from PageRank with teleportation, recorded-teleportation
# exit flow.  infomap.cc builds the same Markov flow (Greedy::initiate
# seeds node rates from the PageRank vector); the map-equation algebra
# is identical, only p_a and q_m change:
#
#   p_a  = PageRank visit rate (damping d; dangling mass fully
#          redistributed — operators/pagerank.py's exact semantics)
#   f_ab = d * p_a * w_ab / s_a        (arc flow, a non-dangling)
#   tp_a = (1-d) * p_a + d * p_a * [s_a = 0]
#          (mass a spreads uniformly over ALL n vertices)
#   q_m  = P_m * (n - n_m)/n + E_m
#          P_m = sum tp_a,  E_m = sum of f_ab leaving m
#
#   L    = f(q) - 2 sum f(q_m) + sum f(q_m + p_m) - sum f(p_a)
#
# The expansion is partition-shape-independent, so the same single-move
# ΔL trick applies; the teleport term additionally shifts with the
# module's ORIGINAL-vertex count n_m, which supernodes carry as `cnt`.
# --------------------------------------------------------------------------


def _directed_flow(graph: LinkGraph, weighted: bool, damping: float):
    """Markov flow tables for the directed map equation.

    Returns ``(arcs, verts, n)``: ``arcs`` = (src, dst, f) with
    self-loops dropped (their flow never crosses a module boundary);
    ``verts`` = (id, p, tp, cnt=1) for every vertex."""
    from xdata_igraph_spark.operators.pagerank import pagerank

    p = pagerank(graph, damping=damping, weighted=weighted, norm="l1")
    e0 = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    e0 = e0.select("src", "dst", "weight").filter(F.col("src") != F.col("dst"))
    if not graph.directed:
        e0 = e0.union(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    s = e0.groupBy("src").agg(F.sum("weight").alias("s_out"))
    arcs = (
        e0.join(s, "src")
        .join(p.withColumnRenamed("id", "src"), "src")
        .select(
            "src",
            "dst",
            (F.lit(damping) * F.col("rank") * F.col("weight") / F.col("s_out")).alias(
                "f"
            ),
        )
    )
    verts = (
        p.join(s.withColumnRenamed("src", "id"), "id", "left")
        .select(
            "id",
            F.col("rank").alias("p"),
            (
                F.lit(1.0 - damping) * F.col("rank")
                + F.when(F.col("s_out").isNull(), F.lit(damping) * F.col("rank"))
                .otherwise(F.lit(0.0))
            ).alias("tp"),
            F.lit(1).cast("long").alias("cnt"),
        )
    )
    return arcs, verts, graph.vcount()


def codelength_directed(
    graph: LinkGraph,
    membership: DataFrame,
    weighted: bool = True,
    damping: float = 0.85,
) -> float:
    """Exact two-level directed map-equation codelength of a partition
    under PageRank flow with recorded teleportation.  ``membership``
    must cover every vertex (partial memberships raise)."""
    mem = membership.select(
        F.col(membership.columns[0]).alias("id"),
        F.col(membership.columns[1]).alias("comm"),
    )
    _require_full_membership(graph, mem)
    arcs, verts, n = _directed_flow(graph, weighted, damping)
    if n == 0:
        return 0.0
    return _codelength_from_flow(arcs, verts, n, mem)


def _codelength_from_flow(
    arcs: DataFrame, verts: DataFrame, n: int, mem: DataFrame
) -> float:
    """Codelength from already-built flow tables (the level loop reuses
    its level-0 checkpoints instead of re-running PageRank — the
    engine's most expensive primitive — once per level)."""
    v = verts.join(mem, "id")
    mod = v.groupBy("comm").agg(
        F.sum("p").alias("p_m"),
        F.sum("tp").alias("tp_m"),
        F.sum("cnt").alias("n_m"),
    )
    exits = (
        arcs.join(mem.select(F.col("id").alias("src"), F.col("comm").alias("cs")), "src")
        .join(
            mem.select(F.col("id").alias("dst"), F.col("comm").alias("cd")), "dst"
        )
        .filter(F.col("cs") != F.col("cd"))
        .groupBy(F.col("cs").alias("comm"))
        .agg(F.sum("f").alias("e_m"))
    )
    stats = mod.join(exits, "comm", "left").select(
        "comm",
        "p_m",
        (
            F.col("tp_m") * (F.lit(float(n)) - F.col("n_m")) / F.lit(float(n))
            + F.coalesce("e_m", F.lit(0.0))
        ).alias("q_m"),
    )
    agg = stats.agg(
        F.sum("q_m").alias("q"),
        F.sum(_f(F.col("q_m"))).alias("sfq"),
        F.sum(_f(F.col("q_m") + F.col("p_m"))).alias("sfp"),
    ).first()
    pa = verts.agg(F.sum(_f(F.col("p")))).first()[0]
    q, sfq, sfp = float(agg["q"]), float(agg["sfq"]), float(agg["sfp"])
    fq = q * math.log2(q) if q > 0 else 0.0
    return fq - 2.0 * sfq + sfp - float(pa or 0.0)


def _infomap_moves_directed(
    arcs: DataFrame,
    verts: DataFrame,
    n_total: int,
    max_sweeps: int,
) -> DataFrame:
    """One level of synchronous directed-flow local moves.

    ``arcs``: (src, dst, f) loop-free flow; ``verts``: (id, p, tp,
    cnt).  Returns (id, comm).  Mechanics mirror :func:`_infomap_moves`
    — the gain is the exact ΔL of the isolated move, which in the
    directed model needs BOTH the vertex→module and module→vertex flow
    plus the teleport-term shift from the module's original-vertex
    count."""
    nf = float(n_total)
    labels = verts.select("id", F.col("id").alias("comm"), "p", "tp", "cnt")
    labels = labels.repartition("id").localCheckpointFlat(eager=True)
    # static per level: total out-flow of each vertex (self-loops
    # already dropped from `arcs`)
    fout = arcs.groupBy(F.col("src").alias("id")).agg(F.sum("f").alias("f_out"))

    zero_streak = 0
    for sweep in range(max_sweeps):
        lsrc = labels.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        ldst = labels.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        tagged = arcs.join(lsrc, "src").join(ldst, "dst")
        exits = (
            tagged.filter(F.col("cs") != F.col("cd"))
            .groupBy(F.col("cs").alias("comm"))
            .agg(F.sum("f").alias("e_m"))
        )
        mod = (
            labels.groupBy("comm")
            .agg(
                F.sum("p").alias("p_m"),
                F.sum("tp").alias("tp_m"),
                F.sum("cnt").alias("n_m"),
            )
            .join(exits, "comm", "left")
            .withColumn("e_m", F.coalesce("e_m", F.lit(0.0)))
            .withColumn(
                "q_m",
                F.col("tp_m") * (F.lit(nf) - F.col("n_m")) / F.lit(nf)
                + F.col("e_m"),
            )
        )
        qsum = F.broadcast(mod.agg(F.sum("q_m").alias("q_all")))

        # vertex → neighboring-module flow, both directions
        toward = (
            arcs.join(ldst, "dst")
            .groupBy(F.col("src").alias("id"), F.col("cd").alias("nc"))
            .agg(F.sum("f").alias("fo"))
        )
        inward = (
            arcs.join(lsrc, "src")
            .groupBy(F.col("dst").alias("id"), F.col("cs").alias("nc"))
            .agg(F.sum("f").alias("fi"))
        )
        nbr = (
            toward.join(inward, ["id", "nc"], "full")
            .withColumn("fo", F.coalesce("fo", F.lit(0.0)))
            .withColumn("fi", F.coalesce("fi", F.lit(0.0)))
        )
        cur = labels.select("id", "comm", "p", "tp", "cnt")
        own = (
            nbr.join(cur.select("id", "comm"), "id")
            .filter(F.col("nc") == F.col("comm"))
            .select(
                "id", F.col("fo").alias("fo_own"), F.col("fi").alias("fi_own")
            )
        )
        ma = mod.select(
            "comm",
            F.col("p_m").alias("p_a"),
            F.col("tp_m").alias("tp_a"),
            F.col("n_m").alias("n_a"),
            F.col("e_m").alias("e_a"),
            F.col("q_m").alias("q_a"),
        )
        mc = mod.select(
            F.col("comm").alias("nc"),
            F.col("p_m").alias("p_c"),
            F.col("tp_m").alias("tp_c"),
            F.col("n_m").alias("n_c"),
            F.col("e_m").alias("e_c"),
            F.col("q_m").alias("q_c"),
        )
        cand = (
            nbr.join(cur, "id")
            .filter(F.col("nc") != F.col("comm"))
            .join(ma, "comm")
            .join(mc, "nc")
            .join(own, "id", "left")
            .join(fout, "id", "left")
            .withColumn("fo_own", F.coalesce("fo_own", F.lit(0.0)))
            .withColumn("fi_own", F.coalesce("fi_own", F.lit(0.0)))
            .withColumn("f_out", F.coalesce("f_out", F.lit(0.0)))
            .crossJoin(qsum)
        )
        # post-move exit flows and teleport terms (see module comment)
        ea_n = (
            F.col("e_a")
            - (F.col("f_out") - F.col("fo_own"))
            + F.col("fi_own")
        )
        ec_n = F.col("e_c") + (F.col("f_out") - F.col("fo")) - F.col("fi")
        qa_n = (
            (F.col("tp_a") - F.col("tp"))
            * (F.lit(nf) - (F.col("n_a") - F.col("cnt")))
            / F.lit(nf)
            + ea_n
        )
        qc_n = (
            (F.col("tp_c") + F.col("tp"))
            * (F.lit(nf) - (F.col("n_c") + F.col("cnt")))
            / F.lit(nf)
            + ec_n
        )
        pa_n = F.col("p_a") - F.col("p")
        pc_n = F.col("p_c") + F.col("p")
        q_new = F.col("q_all") + qa_n + qc_n - F.col("q_a") - F.col("q_c")
        dl = (
            (_f(q_new) - _f(F.col("q_all")))
            - 2.0 * (_f(qa_n) + _f(qc_n) - _f(F.col("q_a")) - _f(F.col("q_c")))
            + (
                _f(qa_n + pa_n)
                + _f(qc_n + pc_n)
                - _f(F.col("q_a") + F.col("p_a"))
                - _f(F.col("q_c") + F.col("p_c"))
            )
        )
        cand = cand.select("id", "nc", dl.alias("dl"))
        best = cand.groupBy("id").agg(
            F.max_by(
                F.struct(F.col("nc").alias("c"), F.col("dl").alias("d")),
                F.struct(-F.col("dl"), -F.col("nc")),
            ).alias("b")
        )
        moves = best.select(
            "id",
            F.col("b.c").alias("new_comm"),
            (
                (F.col("b.d") < -1e-12)
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
                "p",
                "tp",
                "cnt",
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
        if zero_streak >= 2 and sweep % 2 == 1:
            break
    return labels.select("id", "comm")


def infomap_communities_directed(
    graph: LinkGraph,
    weighted: bool = True,
    damping: float = 0.85,
    max_levels: int = 5,
    max_sweeps: int = 12,
) -> DataFrame:
    """Directed-flow Infomap → (id, label), dense first-appearance
    labels.  The flow model is the reference's directed default:
    PageRank visit rates (teleportation 1-damping, dangling mass fully
    redistributed) with recorded teleportation in the exit terms.
    Undirected input degrades to link dynamics with teleportation."""
    spark = graph.spark
    if graph.vcount() == 0:
        return spark.createDataFrame([], "id long, label long")
    arcs, verts, n = _directed_flow(graph, weighted, damping)
    arcs = arcs.localCheckpointFlat(eager=True)
    verts = verts.localCheckpointFlat(eager=True)
    # level-0 flow tables: every level's codelength is evaluated from
    # these (ONE PageRank solve total, not one per level)
    arcs0, verts0 = arcs, verts

    membership = graph.vertices().select("id", F.col("id").alias("node"))
    membership = membership.localCheckpointFlat(eager=True)
    # baseline L of the singleton partition; a level is adopted only if
    # it strictly shrinks L (see infomap_communities)
    prev_l = _codelength_from_flow(
        arcs0, verts0, n, graph.vertices().select("id", F.col("id").alias("comm"))
    )

    for _level in range(max_levels):
        comm = _infomap_moves_directed(arcs, verts, n, max_sweeps)
        folded = (
            membership.join(
                comm.select(F.col("id").alias("node"), "comm"), "node", "left"
            )
            .select("id", F.coalesce("comm", F.col("node")).alias("node"))
            .localCheckpointFlat(eager=True)
        )
        cl = _codelength_from_flow(
            arcs0, verts0, n, folded.select("id", F.col("node").alias("comm"))
        )
        if cl >= prev_l - 1e-12:
            break
        membership = folded
        prev_l = cl
        # contract: flows aggregate by module; intra flow becomes
        # irrelevant self-flow and is dropped; supernodes carry the
        # summed visit/teleport mass and ORIGINAL vertex count
        ca = comm.select(F.col("id").alias("src"), F.col("comm").alias("ca"))
        cb = comm.select(F.col("id").alias("dst"), F.col("comm").alias("cb"))
        arcs = (
            arcs.join(ca, "src")
            .join(cb, "dst")
            .filter(F.col("ca") != F.col("cb"))
            .groupBy(F.col("ca").alias("src"), F.col("cb").alias("dst"))
            .agg(F.sum("f").alias("f"))
            .localCheckpointFlat(eager=True)
        )
        verts = (
            verts.join(comm, "id")
            .groupBy(F.col("comm").alias("id"))
            .agg(
                F.sum("p").alias("p"),
                F.sum("tp").alias("tp"),
                F.sum("cnt").alias("cnt"),
            )
            .localCheckpointFlat(eager=True)
        )
        if verts.count() <= 1:
            break

    return renumber_first_appearance(
        membership.select("id", F.col("node").alias("label"))
    )
