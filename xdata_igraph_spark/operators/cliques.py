"""Clique enumeration — relational k-clique listing.

Reference: igraph_cliques (/root/reference/src/cliques.c:291),
igraph_maximal_cliques (:567), igraph_clique_number (:849). The
reference expands cliques vertex-by-vertex over in-memory adjacency
(recursive backtracking); the distributed equivalent is the standard
oriented-extension join plan (the same degree-ordered orientation the
triangle counter uses, /root/reference/src/triangles.c:101):

- orient the simple undirected graph a→b by ascending (degree, id) —
  every clique then has exactly one enumeration order, no duplicates;
- C₂ = oriented edges; C_{k+1} = C_k ⋈ oriented arcs from the last
  member, keeping candidates adjacent to ALL members (explode +
  equi-join + count == k−1 verification);
- per-level cost ∝ Σ cliques·degree — the output-size bound every
  clique lister pays; hub skew is capped by the orientation exactly
  like triangles (a vertex only extends toward higher-ranked
  neighbors).

Each level is joins + aggregates over DataFrames — no driver-side
recursion; ``clique_number`` loops levels until empty (≤ degeneracy+1
iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _oriented(graph: LinkGraph) -> DataFrame:
    """Simple undirected edges oriented by ascending (degree, id)."""
    und = (
        graph.symmetrized()
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    lower = F.struct("da", "a") < F.struct("db", "b")
    return (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(lower, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
        .localCheckpointFlat(eager=True)
    )


def cliques(
    graph: LinkGraph,
    min_size: int = 2,
    max_size: int = 0,
    max_level_rows: int = 50_000_000,
) -> DataFrame:
    """All cliques with min_size ≤ |C| ≤ max_size → (members:
    array<long> ascending by enumeration rank, size) —
    igraph_cliques semantics (max_size 0 = unbounded, loops/multi
    edges ignored; igraph also lists size-1 cliques when min_size ≤ 1:
    included here for parity).

    The k-clique count is worst-case exponential in the largest clique
    (a clique of size c contributes C(c, k) rows at every level k), so
    each level is row-count guarded: exceeding ``max_level_rows``
    raises instead of silently materializing an exponential
    intermediate (same spirit as flow.py's max_edges guard)."""
    arcs = _oriented(graph)
    spark = graph.spark
    out: list[DataFrame] = []
    if min_size <= 1:
        singles = graph.vertices().select(
            F.array(F.col("id")).alias("members"), F.lit(1).alias("size")
        )
        out.append(singles)
    level = arcs.select(
        F.array("lo", "hi").alias("members"), F.col("hi").alias("last")
    ).localCheckpointFlat(eager=True)
    k = 2
    while True:
        if max_size and k > max_size:
            break
        n_level = level.count()
        if n_level == 0:
            break
        if n_level > max_level_rows:
            raise ValueError(
                f"clique level {k} holds {n_level} cliques "
                f"(> max_level_rows={max_level_rows}); the graph's "
                "clique structure is too dense for full enumeration — "
                "bound max_size, or raise max_level_rows explicitly"
            )
        if k >= min_size:
            out.append(
                level.select(
                    F.sort_array("members").alias("members"), F.lit(k).alias("size")
                )
            )
        # extend: candidate w beyond `last`, adjacent to every member
        cand = level.join(
            arcs.select(F.col("lo").alias("last"), F.col("hi").alias("w")), "last"
        )
        checked = (
            cand.select("members", "w", F.explode("members").alias("m"))
            .join(
                arcs.select(F.col("lo").alias("m"), F.col("hi").alias("w")),
                ["m", "w"],
            )
            .groupBy("members", "w")
            .agg(F.count("*").alias("hits"))
            .filter(F.col("hits") == k)
        )
        level = checked.select(
            F.concat("members", F.array("w")).alias("members"),
            F.col("w").alias("last"),
        ).localCheckpointFlat(eager=True)
        k += 1
    if not out:
        return spark.createDataFrame([], "members array<bigint>, size int")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def maximal_cliques(
    graph: LinkGraph, min_size: int = 0, max_size: int = 0
) -> DataFrame:
    """Maximal cliques → (members, size) (igraph_maximal_cliques,
    /root/reference/src/cliques.c:567): a clique is maximal iff no
    vertex is adjacent to all of its members — one explode + adjacency
    join + count aggregate filters the full clique list.

    Enumerates ALL cliques first, so on graphs with a large maximum
    clique the intermediates are exponentially larger than the maximal
    output (the reference's Bron–Kerbosch never materializes them);
    the per-level guard in ``cliques`` turns that blowup into a
    descriptive error rather than a hung job."""
    allc = cliques(graph, min_size=max(min_size, 1), max_size=max_size)
    und = (
        graph.symmetrized()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ext = (
        allc.select("members", "size", F.explode("members").alias("m"))
        .join(und.select(F.col("src").alias("m"), F.col("dst").alias("w")), "m")
        .groupBy("members", "size", "w")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == F.col("size"))
        .select("members")
        .distinct()
    )
    return allc.join(ext, "members", "left_anti")


def clique_number(graph: LinkGraph) -> int:
    """Size of the largest clique (igraph_clique_number,
    /root/reference/src/cliques.c:849)."""
    row = (
        cliques(graph, min_size=1)
        .agg(F.max("size").alias("m"))
        .first()
    )
    return int(row["m"] or 0)


def largest_cliques(graph: LinkGraph) -> DataFrame:
    """Cliques of maximum size (igraph_largest_cliques,
    /root/reference/src/cliques.c:840) → (members, size)."""
    allc = cliques(graph, min_size=1)
    mx = allc.agg(F.max("size").alias("m")).first()["m"]
    return allc.filter(F.col("size") == F.lit(mx))


def independent_vertex_sets(
    graph: LinkGraph, min_size: int = 0, max_size: int = 0
) -> DataFrame:
    """Independent vertex sets (igraph_independent_vertex_sets,
    /root/reference/src/cliques.c:385) — the reference complements the
    graph and lists cliques; identically here (complementer carries
    the same documented O(n²) guard the reference's density pays)."""
    return cliques(
        graph.complementer(), min_size=max(min_size, 1), max_size=max_size
    )


def largest_independent_vertex_sets(graph: LinkGraph) -> DataFrame:
    """igraph_largest_independent_vertex_sets (cliques.c:418)."""
    return largest_cliques(graph.complementer())


def maximal_independent_vertex_sets(graph: LinkGraph) -> DataFrame:
    """igraph_maximal_independent_vertex_sets (cliques.c:613)."""
    return maximal_cliques(graph.complementer(), min_size=1)


def independence_number(graph: LinkGraph) -> int:
    """igraph_independence_number (cliques.c:684)."""
    return clique_number(graph.complementer())
