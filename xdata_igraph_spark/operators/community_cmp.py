"""Community-structure comparison metrics — pure relational aggregates.

Reference: igraph_compare_communities
(/root/reference/src/community.c:3068-3131) with the VI metric of
Meila (2003), NMI of Danon et al (2005), split-join distance of
van Dongen (2000), Rand (1971) and adjusted Rand (Hubert & Arabie
1985) indices — helper formulas at community.c:3203 (entropy + mutual
information), :3370 (split-join row/col maxima), :3433-3520 (Rand,
including the frac-pairs adjustment form replicated verbatim here).

Distributed shape: one membership equi-join on vertex id, one
groupBy(c1, c2) confusion-matrix aggregate (rows ∝ distinct label
pairs, never n²), then row-/column-sum reductions crossJoined into a
single one-row result — every metric is a constant number of shuffles
over confusion-matrix-sized data and the whole computation is ONE
lazy plan, so the evaluation scales to partitions with billions of
vertices and millions of communities (the regime where the engine's
own LPA/Louvain output lives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METHODS = ("vi", "nmi", "split_join", "rand", "adjusted_rand")


def _memberships(m1: DataFrame, m2: DataFrame) -> DataFrame:
    """(id, c1, c2) — inner-joined membership vectors. Raises if the
    vertex domains differ (the reference errors on length mismatch)."""
    a = m1.select(F.col(m1.columns[0]).alias("id"), F.col(m1.columns[1]).alias("c1"))
    b = m2.select(F.col(m2.columns[0]).alias("id"), F.col(m2.columns[1]).alias("c2"))
    j = a.join(b, "id")
    n1, n2, nj = a.count(), b.count(), j.count()
    if not (n1 == n2 == nj):
        raise ValueError(
            f"community membership vectors cover different vertex sets "
            f"({n1} vs {n2} ids, {nj} shared)"
        )
    return j


def comparison_metrics(m1: DataFrame, m2: DataFrame) -> DataFrame:
    """One-row DataFrame (n, vi, nmi, split_join, rand, adjusted_rand)
    comparing two partitions given as (id, label) DataFrames.

    All five metrics come off a single confusion matrix in one lazy
    plan; natural log (the reference's ``log``) for the
    information-theoretic ones. NMI of two trivial partitions is 1
    and Rand indices need n ≥ 2 vertices (NULL below that), per the
    reference's conventions.
    """
    j = _memberships(m1, m2)
    conf = j.groupBy("c1", "c2").agg(F.count("*").alias("nij"))
    rows = conf.groupBy("c1").agg(
        F.sum("nij").alias("ai"), F.max("nij").alias("rowmax")
    )
    cols = conf.groupBy("c2").agg(
        F.sum("nij").alias("bj"), F.max("nij").alias("colmax")
    )

    nagg = j.agg(F.count("*").cast("double").alias("n"))
    rowagg = rows.crossJoin(nagg).agg(
        (-F.sum((F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n")))).alias("h1"),
        F.sum((F.col("ai") / F.col("n")) * (F.col("ai") - 1) / (F.col("n") - 1)).alias("frac1"),
        F.sum("rowmax").alias("summax1"),
    )
    colagg = cols.crossJoin(nagg).agg(
        (-F.sum((F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n")))).alias("h2"),
        F.sum((F.col("bj") / F.col("n")) * (F.col("bj") - 1) / (F.col("n") - 1)).alias("frac2"),
        F.sum("colmax").alias("summax2"),
    )
    # MI = Σ p_ij (ln p_ij − ln p_i − ln p_j) and the Rand pair term
    confagg = (
        conf.join(rows.select("c1", "ai"), "c1")
        .join(cols.select("c2", "bj"), "c2")
        .crossJoin(nagg)
        .agg(
            F.sum(
                (F.col("nij") / F.col("n"))
                * (
                    F.log(F.col("nij") / F.col("n"))
                    - F.log(F.col("ai") / F.col("n"))
                    - F.log(F.col("bj") / F.col("n"))
                )
            ).alias("mi"),
            F.sum(
                (F.col("nij") / F.col("n")) * (F.col("nij") - 1) / (F.col("n") - 1)
            ).alias("pairs_ij"),
        )
    )

    h1, h2, mi = F.col("h1"), F.col("h2"), F.col("mi")
    rand = F.lit(1.0) + 2.0 * F.col("pairs_ij") - F.col("frac1") - F.col("frac2")
    expected = F.col("frac1") * F.col("frac2") + (1 - F.col("frac1")) * (
        1 - F.col("frac2")
    )
    return (
        nagg.crossJoin(rowagg)
        .crossJoin(colagg)
        .crossJoin(confagg)
        .select(
            F.col("n").cast("long").alias("n"),
            (h1 + h2 - 2.0 * mi).alias("vi"),
            F.when((h1 == 0.0) & (h2 == 0.0), F.lit(1.0))
            .otherwise(2.0 * mi / (h1 + h2))
            .alias("nmi"),
            (2 * F.col("n") - F.col("summax1") - F.col("summax2"))
            .cast("long")
            .alias("split_join"),
            F.when(F.col("n") >= 2, rand).alias("rand"),
            F.when((F.col("n") >= 2) & (expected != 1.0), (rand - expected) / (1 - expected))
            .alias("adjusted_rand"),
        )
    )


def compare_communities(m1: DataFrame, m2: DataFrame, method: str = "vi") -> float:
    """Scalar distance/similarity between two partitions —
    igraph_compare_communities semantics (method ∈ vi | nmi |
    split_join | rand | adjusted_rand)."""
    if method not in _METHODS:
        raise ValueError(f"unknown comparison method {method!r}; use one of {_METHODS}")
    row = comparison_metrics(m1, m2).first()
    return float(row[method])


def split_join_distance(m1: DataFrame, m2: DataFrame) -> tuple[int, int]:
    """(distance12, distance21) — the two asymmetric projection
    distances of van Dongen (igraph_split_join_distance,
    /root/reference/src/community.c:3160)."""
    j = _memberships(m1, m2)
    n = j.count()
    conf = j.groupBy("c1", "c2").agg(F.count("*").alias("nij"))
    d12 = n - (
        conf.groupBy("c1").agg(F.max("nij").alias("m")).agg(F.sum("m")).first()[0] or 0
    )
    d21 = n - (
        conf.groupBy("c2").agg(F.max("nij").alias("m")).agg(F.sum("m")).first()[0] or 0
    )
    return int(d12), int(d21)
