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
