"""XDATA scan statistics — the fork's signature feature
(/root/reference/src/scan.c).

- scan-0: per-vertex degree/strength (igraph_local_scan_0,
  src/scan.c:37-65);
- scan-1: number of edges inside the *closed* 1-neighborhood N[v]
  (igraph_local_scan_1_ecount, src/scan.c:331). For a simple
  undirected graph this equals deg(v) + triangles(v): the edges
  incident to v plus the edges among its neighbors;
- "us/them" variants (src/scan.c:565-612,613-720): the neighborhood
  comes from the US graph, the counted edges from the THEM graph —
  two snapshots of the same vertex universe. In Spark two edge
  DataFrames and a join, the natural fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.triangles import (
    _simple_undirected,
    adjacent_triangles,
)


def scan0(graph: LinkGraph, weighted: bool = False) -> DataFrame:
    """(id, scan0) — degree (or strength) per vertex."""
    if weighted:
        return graph.strength("all").withColumnRenamed("strength", "scan0")
    return (
        graph.degrees("all", loops=False)
        .select("id", F.col("degree").cast("double").alias("scan0"))
    )


def scan1(graph: LinkGraph) -> DataFrame:
    """(id, scan1) — edges within the closed 1-neighborhood.

    Reference semantics (igraph_local_scan_1_ecount ALL mode,
    /root/reference/src/scan.c:172-236): every stored arc with both
    endpoints inside N[v] counts once, with multiplicity — a directed
    reciprocal pair a->b, b->a inside the neighborhood contributes 2.
    Undirected simple graphs take the deg(v) + triangles(v) fast path
    (same number, no neighborhood-pair materialization)."""
    if graph.directed:
        reached = _khop_closed(graph, 1, "all")
        return _count_arcs_within(
            graph, reached, graph.edges.select("src", "dst")
        ).withColumnRenamed("scan", "scan1")
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    tri = adjacent_triangles(graph)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce("degree", F.lit(0)) + F.col("triangles")).cast("long").alias("scan1"),
        )
    )


def _count_arcs_within(
    universe: LinkGraph, reached: DataFrame, arcs: DataFrame
) -> DataFrame:
    """(id, scan) — per-arc count of ``arcs`` rows (multiplicity and
    loops preserved, exactly as stored) whose BOTH endpoints fall in
    the neighborhood pair set ``reached`` (v, u). This is the
    reference's incidence-walk count after ALL-mode halving: each
    stored arc with both endpoints inside N contributes exactly 1
    (src/scan.c:785-805 — `dist <= k || marked[nei]`, then `/= 2`)."""
    pa = reached.select("v", F.col("u").alias("src"))
    pb = reached.select("v", F.col("u").alias("dst"))
    counts = (
        arcs.join(pa, "src")
        .join(pb, ["v", "dst"])
        .groupBy("v")
        .agg(F.count("*").alias("scan"))
    )
    verts = universe.vertices()
    return verts.join(counts, verts.id == counts.v, "left").select(
        "id", F.coalesce("scan", F.lit(0)).alias("scan")
    )


def scan0_them(us: LinkGraph, them: LinkGraph) -> DataFrame:
    """(id, scan0_them) — THEM-degree of every US vertex
    (igraph_local_scan_0_them, /root/reference/src/scan.c:565)."""
    them_deg = them.degrees("all", loops=False)
    return us.vertices().join(them_deg, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("scan0_them")
    )


def scan1_them(us: LinkGraph, them: LinkGraph) -> DataFrame:
    """(id, scan1_them) — THEM-edges with both endpoints inside the
    closed US 1-neighborhood of v (igraph_local_scan_1_ecount_them,
    /root/reference/src/scan.c:613).

    Relational plan: closed-neighborhood pairs P(v,u) from US, joined
    against the stored THEM arcs. Per-arc semantics like :func:`scan1`
    — every stored THEM arc with both endpoints in the closed US
    1-neighborhood counts once, with multiplicity (the reference's
    ALL-mode incidence walk halves its double count,
    src/scan.c:700-708).
    """
    us_sym = (
        us.symmetrized().select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    closed = us_sym.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
        us.vertices().select(F.col("id").alias("v"), F.col("id").alias("u"))
    )
    return _count_arcs_within(
        us, closed, them.edges.select("src", "dst")
    ).withColumnRenamed("scan", "scan1_them")


def _khop_closed(graph: LinkGraph, k: int, mode: str = "all") -> DataFrame:
    """Closed k-neighborhood pairs (v, u): u within ≤ k hops of v
    following ``mode`` edges — BFS layering, each round joins only the
    newest frontier."""
    if mode == "all" or not graph.directed:
        # canonical-pair build: ONE scan + ONE distinct instead of
        # symmetrize-union (two scans of the edge lineage) + distinct
        # over the doubled row set (see wcc)
        canon = (
            graph.edges.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        adj = canon.unionByName(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpointFlat(eager=True)
    else:
        adj = (
            graph.adjacency(mode)
            .select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpointFlat(eager=True)
        )
    self_pairs = graph.vertices().select(
        F.col("id").alias("v"), F.col("id").alias("u")
    )
    if k == 1:
        # closed 1-neighborhood directly: N[v] = {v} ∪ neighbors(v) —
        # adj already excludes loops, so the union is disjoint and no
        # BFS round, anti-join, or per-round checkpoint is needed
        return self_pairs.unionByName(
            adj.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        ).localCheckpointFlat(eager=True)
    reached = self_pairs.localCheckpointFlat(eager=True)
    frontier = reached
    for _ in range(k):
        nxt = (
            frontier.select("v", F.col("u").alias("src"))
            .join(adj, "src")
            .select("v", F.col("dst").alias("u"))
            .distinct()
            .join(reached, ["v", "u"], "left_anti")
            .localCheckpointFlat(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpointFlat(eager=True)
        frontier = nxt
    return reached


def scan_k_ecount(graph: LinkGraph, k: int, mode: str = "all") -> DataFrame:
    """(id, scan) — edges of the induced subgraph of the closed
    k-neighborhood (igraph_local_scan_k_ecount,
    /root/reference/src/scan.c:739-805: BFS to depth k along ``mode``
    arcs; the incidence walk counts every edge whose endpoints both
    land inside, then halves ALL-mode totals — net effect: **each
    stored arc counts once, with multiplicity**. A directed reciprocal
    pair a->b, b->a inside the neighborhood contributes 2; loops and
    parallel arcs count as stored).

    k=0 is scan0 (the reference dispatches identically,
    src/scan.c:757-759). The (v, u) neighborhood pair set is the
    scale bound: Σ_v |N_k(v)| — fine for k ≤ 2 on sparse graphs, the
    same practical limit the O(n·E) reference has.
    """
    if k < 0:
        raise ValueError("k must be non-negative in k-scan")
    if k == 0:
        return scan0(graph).select("id", F.col("scan0").cast("long").alias("scan"))
    reached = _khop_closed(graph, k, mode)
    return _count_arcs_within(graph, reached, graph.edges.select("src", "dst"))


def scan_k_ecount_them(
    us: LinkGraph, them: LinkGraph, k: int, mode: str = "all"
) -> DataFrame:
    """(id, scan) — THEM-arcs with both endpoints inside the closed
    US k-neighborhood (igraph_local_scan_k_ecount_them,
    /root/reference/src/scan.c:831-920): neighborhoods from US, per-arc
    counting on THEM (multiplicity preserved, like scan_k_ecount),
    same vertex universe."""
    if k < 0:
        raise ValueError("k must be non-negative in k-scan")
    if k == 0:
        return scan0_them(us, them).select(
            "id", F.col("scan0_them").cast("long").alias("scan")
        )
    reached = _khop_closed(us, k, mode)
    return _count_arcs_within(us, reached, them.edges.select("src", "dst"))
