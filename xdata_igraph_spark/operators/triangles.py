"""Triangle counting & transitivity — degree-ordered orientation + two
relational joins.

Reference semantics (/root/reference/src/triangles.c):
- edge directions are ignored and loops/multi-edges dropped before
  counting (igraph_i_trans4_al_simplify, src/triangles.c:399-428);
- the kernel orders vertices by degree and intersects higher-rank
  adjacency (src/triangles.c:95-160) — the classic degree-ordered
  orientation; we implement the same idea as a self-join: orient every
  undirected edge from the endpoint with smaller (degree, id) to the
  larger, build wedges with one join, close them with a second.
  Each triangle is produced exactly once.
- global transitivity = 6·T / Σ deg·(deg−1)
  (src/triangles.c:617-700); local transitivity(v) =
  triangles(v) / (deg(v)·(deg(v)−1)/2), with NaN-vs-0 selectable for
  degree<2 vertices (mode flag, src/triangles.c:60-64).

Scale design: orientation bounds the join fan-out by the graph's
degeneracy — a hub of degree 10^7 has all its edges pointed *into* it,
so it never explodes a wedge build (this is also the skew story: the
wedge join's hot keys are capped at O(sqrt(m)) degree). The oriented
edge table is computed once and reused by both joins; AQE handles
residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _simple_undirected(graph: LinkGraph) -> DataFrame:
    """Canonical simple undirected edges (a > b), loops/dups dropped.

    Materialized once per graph instance (graph._cache) — the simple
    edge set is the shared index of every triangle/transitivity/scan
    kernel, and a caller sequence like count_triangles → scan1 would
    otherwise re-run the dedup scan per kernel (guide §1.2: don't
    recompute what you can keep)."""
    got = graph._cache.get("simple_undirected")
    if got is not None:
        return got
    simple = (
        graph.edges_cached().select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    graph._cache["simple_undirected"] = simple
    return simple


def _oriented(graph: LinkGraph) -> DataFrame:
    """Orient each simple edge low→high by (degree, id) rank.

    Returns (lo, hi) where rank(lo) < rank(hi); rank is the lexicographic
    (degree, id) order the reference uses (igraph_vector_order1 rank
    array, /root/reference/src/triangles.c:100-107). Materialized once
    per graph instance (see _simple_undirected).
    """
    got = graph._cache.get("oriented")
    if got is not None:
        return got
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    e = simple.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    ori = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpointFlat(eager=True)
    graph._cache["oriented"] = ori
    return ori


def list_triangles(graph: LinkGraph) -> DataFrame:
    """Each triangle exactly once → (v1, v2, v3) with v1 oriented-lowest
    (igraph_list_triangles, /root/reference/src/triangles.c:567-573)."""
    ori = _oriented(graph)
    wedge = (
        ori.alias("e1")
        .join(ori.alias("e2"), F.col("e1.hi") == F.col("e2.lo"))
        .select(
            F.col("e1.lo").alias("v1"),
            F.col("e1.hi").alias("v2"),
            F.col("e2.hi").alias("v3"),
        )
    )
    closer = ori.select(F.col("lo").alias("v1"), F.col("hi").alias("v3"))
    tri = wedge.join(closer, ["v1", "v3"], "left_semi")
    return tri


def count_triangles(graph: LinkGraph) -> int:
    """Total number of triangles."""
    return list_triangles(graph).count()


def adjacent_triangles(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle count → (id, triangles), zeros included
    (igraph_adjacent_triangles, /root/reference/src/triangles.c:535-545)."""
    tri = list_triangles(graph)
    corners = (
        tri.select(F.col("v1").alias("id"))
        .union(tri.select(F.col("v2").alias("id")))
        .union(tri.select(F.col("v3").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices()
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def transitivity_undirected(graph: LinkGraph, nan_if_empty: bool = True) -> float:
    """Global clustering coefficient = 6·T / Σ deg(deg−1)
    (igraph_transitivity_undirected, /root/reference/src/triangles.c:617-700)."""
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    triples = deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1))).first()[0] or 0
    if triples == 0:
        return float("nan") if nan_if_empty else 0.0
    t = count_triangles(graph)
    return 6.0 * t / float(triples)


def transitivity_local_undirected(
    graph: LinkGraph, zero_if_undefined: bool = False
) -> DataFrame:
    """Per-vertex clustering coefficient → (id, transitivity)
    (igraph_transitivity_local_undirected,
    /root/reference/src/triangles.c:483-505). Degree<2 vertices get NaN
    (default) or 0 per the reference's mode flag
    (/root/reference/src/triangles.c:60-64)."""
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = adjacent_triangles(graph)
    undef = F.lit(0.0) if zero_if_undefined else F.lit(float("nan"))
    return (
        graph.vertices()
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("deg", F.lit(0)) < 2, undef
            )
            .otherwise(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1))
            )
            .alias("transitivity"),
        )
    )


def transitivity_barrat(graph: LinkGraph, mode: str = "nan") -> DataFrame:
    """Barrat weighted local clustering → (id, barrat)
    (igraph_transitivity_barrat, /root/reference/src/triangles.c:
    713-805): C_w(i) = Σ_{j,k adjacent neighbors of i} (w_ij + w_ik)
    / (s_i · (k_i − 1)); degree-<2 vertices get NaN (mode='nan',
    the reference's default) or 0 (mode='zero'). Multi-edges are
    collapsed by weight sum and loops dropped (the reference expects a
    simple graph; this matches simplify()).

    Relational plan: weighted symmetric adjacency joined with itself on
    the center (neighbor pairs j<k), closed against the edge set — the
    same wedge shape as triangle counting, weights riding along.
    """
    e = (
        graph.edges.select(
            F.greatest("src", "dst").alias("a"),
            F.least("src", "dst").alias("b"),
            "weight",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
        .localCheckpointFlat(eager=True)
    )
    sym = e.select(F.col("a").alias("i"), F.col("b").alias("j"), "w").union(
        e.select(F.col("b").alias("i"), F.col("a").alias("j"), "w")
    )
    stats = sym.groupBy(F.col("i").alias("id")).agg(
        F.sum("w").alias("s"), F.count("*").alias("k")
    )
    # adjacent neighbor pairs (j < k) of each center i
    left = sym.select("i", F.col("j").alias("nj"), F.col("w").alias("wj"))
    right = sym.select("i", F.col("j").alias("nk"), F.col("w").alias("wk"))
    wedges = left.join(right, "i").filter(F.col("nj") < F.col("nk"))
    closed = wedges.join(
        e.select(F.col("b").alias("nj"), F.col("a").alias("nk")),
        ["nj", "nk"],
        "left_semi",
    )
    tri = closed.groupBy(F.col("i").alias("id")).agg(
        F.sum(F.col("wj") + F.col("wk")).alias("tri_w")
    )
    denom = F.col("s") * (F.col("k") - 1)
    fallback = F.lit(float("nan")) if mode == "nan" else F.lit(0.0)
    return (
        graph.vertices()
        .join(stats, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(denom, F.lit(0.0)) > 0,
                F.coalesce("tri_w", F.lit(0.0)) / denom,
            )
            .otherwise(fallback)
            .alias("barrat"),
        )
    )


def motifs_randesu_3(graph: LinkGraph) -> DataFrame:
    """Undirected size-3 motif counts → (isoclass, count: double)
    (igraph_motifs_randesu with size=3 and cut_prob=0 — full
    enumeration; /root/reference/src/motifs.c:63-160). igraph's
    undirected 3-vertex isoclass order: 0 = empty, 1 = one edge
    (both disconnected → NaN, like the reference), 2 = path,
    3 = triangle.

    Closed form over existing aggregates — no triple enumeration:
    connected 2-edge triples = Σ_v C(deg_v, 2) − 3·triangles (each
    triangle holds three wedges), so the plan is one degree aggregate
    plus the standard oriented triangle count.
    """
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.col("a").alias("id"))
        .union(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    wedges_row = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).first()
    wedges = int(wedges_row["w"] or 0)
    tri = count_triangles(graph)
    spark = graph.spark
    return spark.createDataFrame(
        [
            (0, float("nan")),
            (1, float("nan")),
            (2, float(wedges - 3 * tri)),
            (3, float(tri)),
        ],
        "isoclass int, count double",
    )


def motifs_randesu_3_sample(
    graph: LinkGraph,
    cut_prob: tuple[float, float, float] = (0.0, 0.0, 0.0),
    seed: int = 42,
) -> DataFrame:
    """Sampled undirected size-3 motif counts → (isoclass, count)
    (igraph_motifs_randesu with nonzero cut_prob,
    /root/reference/src/motifs.c:269-346 — the RAND-ESU sampler of
    Wernicke's FANMOD).

    A deterministic ESU *instance*: every RNG draw of the reference
    becomes a seeded hash coin, and branch order is ascending id, so
    results are reproducible and the whole plan stays relational. The
    structural guarantees are ESU's own:

    - ``cut_prob == (0,0,0)`` enumerates every connected triple exactly
      once — counts equal :func:`motifs_randesu_3`;
    - any connected triple survives with probability exactly
      ``(1-p0)(1-p1)(1-p2)`` — coins are drawn per root (level 0), per
      first-extension branch (level 1), and per completion (level 2),
      on the triple's unique ESU decomposition (root = min vertex,
      first extension = min eligible neighbor). Divide counts by that
      product for an unbiased estimate of the full census.

    The level-0/1 coins prune whole subtrees BEFORE the joins run —
    at cut_prob=(0.9,0,0) the wedge build touches ~10% of the roots —
    which is the point of the sampler at 100-TB scale. Like the
    reference, counts are the raw sampled counts (not rescaled);
    isoclasses 0 and 1 (disconnected) are NaN.
    """
    p0, p1, p2 = (float(p) for p in cut_prob)
    if not all(0.0 <= p < 1.0 for p in (p0, p1, p2)):
        raise ValueError("cut probabilities must be in [0, 1)")

    simple = _simple_undirected(graph)  # (a > b) canonical
    sym = simple.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        simple.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )

    res = 1 << 24

    def keep(level: int, p_cut: float, *cols):
        if p_cut <= 0.0:
            return F.lit(True)
        h = F.abs(F.xxhash64(F.lit(seed), F.lit(level), *cols)) % res
        return (h / F.lit(float(res))) >= p_cut

    # root a = min vertex of the subgraph; ext = neighbors of a above it
    ext = (
        sym.filter(F.col("v") > F.col("u"))
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
        .filter(keep(0, p0, F.col("a")))
    )
    ext1 = ext.filter(keep(1, p1, F.col("a"), F.col("b")))

    # branch A: both b and c adjacent to a (c picked later: c > b)
    ext_c = ext.select("a", F.col("b").alias("c"))
    trip_a = (
        ext1.join(ext_c, "a")
        .filter(F.col("c") > F.col("b"))
        .filter(keep(2, p2, F.col("a"), F.col("b"), F.col("c")))
    )
    bc_edge = simple.select(
        F.col("a").alias("c"), F.col("b")  # canonical has a > b, so (c, b) with c > b
    )
    closed = trip_a.join(bc_edge, ["b", "c"], "left_semi")
    n_tri = closed.count()
    n_path_a = trip_a.count() - n_tri

    # branch B: c exclusive neighbor of b (c > a, c not adjacent to a)
    nbr_b = sym.select(F.col("u").alias("b"), F.col("v").alias("c"))
    trip_b = (
        ext1.join(nbr_b, "b")
        .filter((F.col("c") > F.col("a")) & (F.col("c") != F.col("b")))
        .join(ext_c, ["a", "c"], "left_anti")
        .filter(keep(2, p2, F.col("a"), F.col("b"), F.col("c")))
    )
    n_path_b = trip_b.count()

    spark = graph.spark
    return spark.createDataFrame(
        [
            (0, float("nan")),
            (1, float("nan")),
            (2, float(n_path_a + n_path_b)),
            (3, float(n_tri)),
        ],
        "isoclass int, count double",
    )
