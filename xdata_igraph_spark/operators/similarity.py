"""Vertex similarity — the reference's "join+agg" family
(/root/reference/src/cocitation.c): cocitation, bibliographic coupling,
Jaccard/Dice over neighbor sets.

All pure relational plans: a co-neighbor self-join plus aggregates —
no iteration, no Python. Skew note: the self-join fans out per shared
neighbor; at web scale the degree-capped orientation trick (as in
triangles) or a neighbor-count cutoff bounds hub fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def cocitation(graph: LinkGraph) -> DataFrame:
    """(a, b, n_common) — # vertices citing both a and b, a < b
    (igraph_cocitation, /root/reference/src/cocitation.c:39: row i =
    common *in*-neighbors with each other vertex)."""
    e = graph.edges.select("src", "dst").distinct()
    t1 = e.select(F.col("src").alias("k"), F.col("dst").alias("a"))
    t2 = e.select(F.col("src").alias("k"), F.col("dst").alias("b"))
    return (
        t1.join(t2, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )


def bibcoupling(graph: LinkGraph) -> DataFrame:
    """(a, b, n_common) — # common *out*-neighbors
    (igraph_bibcoupling, /root/reference/src/cocitation.c:75)."""
    e = graph.edges.select("src", "dst").distinct()
    t1 = e.select(F.col("dst").alias("k"), F.col("src").alias("a"))
    t2 = e.select(F.col("dst").alias("k"), F.col("src").alias("b"))
    return (
        t1.join(t2, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )


def _sym_simple(graph: LinkGraph) -> DataFrame:
    return (
        graph.symmetrized()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def jaccard_edge_pairs(graph: LinkGraph) -> DataFrame:
    """Jaccard similarity |N(a)∩N(b)| / |N(a)∪N(b)| for each connected
    pair a<b (igraph_similarity_jaccard over the edge list,
    /root/reference/src/cocitation.c:276,492). Neighborhoods are open
    (vertex itself excluded), directions ignored."""
    sym = _sym_simple(graph)
    pairs = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    t1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("k"))
    t2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("k"))
    common = (
        t1.join(t2, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(common, ["a", "b"], "left")
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            (
                F.coalesce("n_common", F.lit(0))
                / (F.col("deg_a") + F.col("deg_b") - F.coalesce("n_common", F.lit(0)))
            ).alias("jaccard"),
        )
    )


def assortativity_degree(graph: LinkGraph) -> float:
    """Degree assortativity (undirected form, excess degree = deg-1,
    /root/reference/src/assortativity.c): Pearson correlation of the
    endpoint degree pairs over all edges, both orientations counted."""
    sym = _sym_simple(graph)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        (F.count("*") - 1).cast("double").alias("x")
    )
    j = (
        sym.join(deg.withColumnRenamed("id", "src").withColumnRenamed("x", "xa"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("x", "xb"), "dst")
    )
    row = j.agg(
        F.count("*").alias("m"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum("xa").alias("sx"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
    ).first()
    m, sxy, sx, sxx = float(row["m"]), float(row["sxy"]), float(row["sx"]), float(row["sxx"])
    # symmetric: sums over xa == sums over xb
    num = sxy / m - (sx / m) ** 2
    den = sxx / m - (sx / m) ** 2
    return num / den if den else float("nan")


def assortativity(
    graph: LinkGraph,
    values: DataFrame,
    values2: DataFrame | None = None,
    directed: bool = True,
) -> float:
    """Assortativity for arbitrary numeric vertex values
    (igraph_assortativity, /root/reference/src/mixing.c:171, Newman
    PRE 67 026126 eq. 21/26): the Pearson correlation of the value
    pairs at edge endpoints.

    ``values`` is (id, value); for the directed form ``values2``
    optionally supplies the in-end values (defaults to ``values``).
    Undirected graphs (or directed=False) use the symmetric estimator
    — each edge counted once with the C's pooled moments, exactly
    matching mixing.c's undirected branch. One two-sided broadcast-able
    join + ONE scalar aggregate; no iteration."""
    directed = directed and graph.directed
    vcol = [c for c in values.columns if c != "id"][0]
    xs = values.select("id", F.col(vcol).cast("double").alias("_x"))
    if values2 is None:
        values2 = values
    v2col = [c for c in values2.columns if c != "id"][0]
    ys = values2.select("id", F.col(v2col).cast("double").alias("_y"))
    j = (
        graph.edges.select("src", "dst")
        .join(xs.withColumnRenamed("id", "src"), "src")
        .join(ys.withColumnRenamed("id", "dst"), "dst")
    )
    if not directed:
        # mixing.c:196-215: pooled endpoint moments over each edge once
        row = j.agg(
            F.count("*").alias("m"),
            F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
            F.sum(F.col("_x") + F.col("_y")).alias("sx"),
            F.sum(F.col("_x") * F.col("_x") + F.col("_y") * F.col("_y")).alias("sxx"),
        ).first()
        m = float(row["m"])
        if not m:
            return float("nan")
        num1 = float(row["sxy"]) / m
        num2 = (float(row["sx"]) / (2 * m)) ** 2
        den1 = float(row["sxx"]) / (2 * m)
        return (num1 - num2) / (den1 - num2) if den1 != num2 else float("nan")
    row = j.agg(
        F.count("*").alias("m"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    ).first()
    m = float(row["m"])
    if not m:
        return float("nan")
    sx, sy = float(row["sx"]), float(row["sy"])
    num = float(row["sxy"]) - sx * sy / m
    den = ((float(row["sxx"]) - sx * sx / m) * (float(row["syy"]) - sy * sy / m)) ** 0.5
    return num / den if den else float("nan")


def assortativity_nominal(
    graph: LinkGraph, types: DataFrame, directed: bool = True
) -> float:
    """Assortativity by vertex category (igraph_assortativity_nominal,
    /root/reference/src/mixing.c:61, Newman PRE 67 026126 eq. 2):
    r = (Σ_t e_tt − Σ_t a_t b_t) / (1 − Σ_t a_t b_t) over the mixing
    matrix of edge-endpoint type pairs. ``types`` is (id, type). The
    undirected branch's double-count-then-/4,/2 bookkeeping
    (mixing.c:118-140) is algebraically the directed formula over the
    symmetrized arc list, which is how it's computed here. Two
    broadcast-able type joins + two tiny per-type aggregates."""
    directed = directed and graph.directed
    tcol = [c for c in types.columns if c != "id"][0]
    ts = types.select("id", F.col(tcol).cast("long").alias("_t"))
    arcs = graph.edges.select("src", "dst")
    if not directed:
        arcs = arcs.unionAll(
            arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    typed = (
        arcs.join(ts.withColumnRenamed("id", "src").withColumnRenamed("_t", "_ft"), "src")
        .join(ts.withColumnRenamed("id", "dst").withColumnRenamed("_t", "_tt"), "dst")
    )
    row = typed.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("_ft") == F.col("_tt"), 1).otherwise(0)).alias("eii"),
    ).first()
    m = float(row["m"])
    if not m:
        return float("nan")
    sumeii = float(row["eii"]) / m
    ab = (
        typed.groupBy("_ft")
        .agg(F.count("*").alias("_a"))
        .join(
            typed.groupBy(F.col("_tt").alias("_ft")).agg(F.count("*").alias("_b")),
            "_ft",
            "outer",
        )
        .agg(
            F.sum(
                F.coalesce("_a", F.lit(0)) * F.coalesce("_b", F.lit(0))
            ).alias("sab")
        )
        .first()
    )
    sumaibi = float(ab["sab"]) / (m * m)
    return (sumeii - sumaibi) / (1.0 - sumaibi) if sumaibi != 1.0 else float("nan")


def jaccard_pairs(graph: LinkGraph, pairs: DataFrame) -> DataFrame:
    """(a, b, jaccard) — Jaccard neighbor-set similarity for CALLER
    -SPECIFIED vertex pairs (igraph_similarity_jaccard_pairs,
    /root/reference/src/cocitation.c:389): same open ALL-mode
    neighborhood statistic as :func:`jaccard_edge_pairs`, but
    restricted to the given (a, b) rows instead of connected pairs —
    the shape a dedup/LSH verify stage wants (candidates in, scores
    out), with cost ∝ Σ deg over the pair endpoints only, never a
    neighbor self-join fan-out. Pairs whose union is empty score 0
    (the reference's convention)."""
    adj = _sym_simple(graph)
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    p = pairs.select("a", "b")
    common = (
        p.join(adj.select(F.col("src").alias("a"), F.col("dst").alias("k")), "a")
        .join(adj.select(F.col("src").alias("b"), F.col("dst").alias("k")), ["b", "k"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        p.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "deg_a"), "a", "left")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "deg_b"), "b", "left")
        .join(common, ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.when(
                F.coalesce("deg_a", F.lit(0)) + F.coalesce("deg_b", F.lit(0)) > 0,
                F.coalesce("n_common", F.lit(0))
                / (
                    F.coalesce("deg_a", F.lit(0))
                    + F.coalesce("deg_b", F.lit(0))
                    - F.coalesce("n_common", F.lit(0))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def dice_edge_pairs(graph: LinkGraph) -> DataFrame:
    """Dice similarity 2·|N(a)∩N(b)| / (|N(a)|+|N(b)|) per connected
    pair a<b (igraph_similarity_dice,
    /root/reference/src/cocitation.c:571 — defined as 2J/(1+J), i.e.
    the same neighbor-set statistic as Jaccard)."""
    j = jaccard_edge_pairs(graph)
    return j.select(
        "a", "b", (2 * F.col("jaccard") / (1 + F.col("jaccard"))).alias("dice")
    )


def inverse_log_weighted(graph: LinkGraph, mode: str = "all") -> DataFrame:
    """(a, b, sim) — common neighbors weighted by 1/log(degree of the
    shared neighbor) (igraph_similarity_inverse_log_weighted,
    /root/reference/src/cocitation.c:109, Adamic/Adar). Pairs sharing
    at least one neighbor, a < b; the weighting degree is the shared
    vertex's ``mode``-degree (the reference uses the mode's opposite
    for directed: common IN-neighbors weighted by OUT-degree — here
    mode='all' reproduces the undirected form)."""
    adj = (
        graph.adjacency(mode)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = adj.groupBy(F.col("src").alias("k")).agg(F.count("*").alias("kdeg"))
    t1 = adj.select(F.col("dst").alias("k"), F.col("src").alias("a"))
    t2 = adj.select(F.col("dst").alias("k"), F.col("src").alias("b"))
    return (
        t1.join(t2, "k")
        .filter(F.col("a") < F.col("b"))
        .join(deg, "k")
        .groupBy("a", "b")
        .agg(
            F.sum(
                F.when(F.col("kdeg") > 1, 1.0 / F.log("kdeg")).otherwise(0.0)
            ).alias("sim")
        )
    )
