"""Bipartite graph operators: projections and maximum matching.

Reference: igraph_bipartite_projection
(/root/reference/src/bipartite.c:265, with the edge-multiplicity
outputs of :158), igraph_maximum_bipartite_matching
(/root/reference/src/matching.c:219 — push-relabel/Hungarian hybrid).

Projection is the wedge join — for each type-1 vertex, every pair of
its type-0 neighbors gets a projected edge whose multiplicity is the
number of shared neighbors. That is one self-join keyed on the shared
endpoint: output ∝ Σ_w C(deg(w), 2), the inherent projection volume;
hub skew on the shared side is the classic quadratic risk and is why
``max_shared_degree`` lets callers cap it (a crawl-scale hub in the
shared layer projects to deg² pairs — the same reason standalone
n-gram Jaccard is documented test-scale in dedup.py).

Vertex ids stay ORIGINAL (the reference renumbers each projection
densely because it materializes new graph objects; a relational
surface keeps the natural key — document deviation, same contract as
subgraph_edges(delete_vertices=False)).

Maximum bipartite matching is augmenting-path search — inherently
sequential like maxflow; it runs driver-side, size-guarded, in the
flow.py style (Hopcroft–Karp, O(E·√V)).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _typed_edges(graph: LinkGraph, types: DataFrame) -> DataFrame:
    """(u, w) arcs with u of type false/0 and w of type true/1 —
    validates that every edge crosses the partition."""
    t = types.select(
        F.col(types.columns[0]).alias("id"),
        F.col(types.columns[1]).cast("boolean").alias("type"),
    )
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    j = (
        e.join(t.select(F.col("id").alias("src"), F.col("type").alias("ts")), "src", "left")
        .join(t.select(F.col("id").alias("dst"), F.col("type").alias("td")), "dst", "left")
    )
    # both validations in ONE aggregate pass over the joined edges
    # (separate .filter().count() actions would re-execute the join)
    chk = j.agg(
        F.count(F.when(F.col("ts").isNull() | F.col("td").isNull(), 1)).alias(
            "untyped"
        ),
        F.count(F.when(F.col("ts") == F.col("td"), 1)).alias("bad"),
    ).first()
    if chk["untyped"]:
        raise ValueError(
            "types does not cover every edge endpoint — an incomplete "
            "type vector would silently truncate the graph (the "
            "reference requires a full types vector)"
        )
    if chk["bad"]:
        raise ValueError(
            "edge joins two same-type vertices — graph is not bipartite "
            "under the given types (igraph_bipartite_projection errors too)"
        )
    return j.select(
        F.when(~F.col("ts"), F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(F.col("ts"), F.col("src")).otherwise(F.col("dst")).alias("w"),
    ).distinct()


def bipartite_projection(
    graph: LinkGraph,
    types: DataFrame,
    which: int = 0,
    max_shared_degree: int | None = None,
) -> DataFrame:
    """One-mode projection → (src, dst, multiplicity) with src < dst,
    original vertex ids, multiplicity = number of shared other-side
    neighbors (igraph_bipartite_projection's multiplicity vectors,
    /root/reference/src/bipartite.c:158).

    ``which``: 0 projects onto type-false vertices, 1 onto type-true.
    ``max_shared_degree``: optionally drop shared-side vertices with
    degree above the cap before the wedge join (hub-skew guard; the
    dropped hubs connect 'everything to everything' and usually carry
    no signal — same rationale as stopword shingles in dedup)."""
    if which not in (0, 1):
        raise ValueError("which must be 0 or 1")
    arcs = _typed_edges(graph, types)
    if which == 1:
        arcs = arcs.select(F.col("w").alias("u"), F.col("u").alias("w"))
    if max_shared_degree is not None:
        keep = (
            arcs.groupBy("w")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_shared_degree)
            .select("w")
        )
        arcs = arcs.join(keep, "w")
    a = arcs.select(F.col("u").alias("src"), "w")
    b = arcs.select(F.col("u").alias("dst"), "w")
    return (
        a.join(b, "w")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("multiplicity"))
    )


def maximum_bipartite_matching(
    graph: LinkGraph,
    types: DataFrame,
    max_edges: int = 5_000_000,
) -> tuple[int, DataFrame]:
    """(matching_size, matching (u, w)) — maximum-cardinality matching
    (igraph_maximum_bipartite_matching, /root/reference/src/
    matching.c:219; unweighted case). Hopcroft–Karp on the driver,
    guarded by ``max_edges`` exactly like flow.py's Edmonds–Karp (the
    reference's algorithm is equally sequential)."""
    arcs = _typed_edges(graph, types)
    m = arcs.count()
    if m > max_edges:
        raise ValueError(
            f"maximum_bipartite_matching runs driver-side (inherently "
            f"sequential augmenting paths, like the reference); refusing "
            f"|E|={m} > {max_edges}"
        )
    adj: dict[int, list[int]] = {}
    for r in arcs.toLocalIterator():
        adj.setdefault(int(r["u"]), []).append(int(r["w"]))
    for vs in adj.values():
        vs.sort()  # deterministic traversal order

    import sys

    if sys.getrecursionlimit() < 200_000:
        sys.setrecursionlimit(200_000)  # DFS depth ≤ augmenting path length

    INF = float("inf")
    match_u: dict[int, int | None] = {u: None for u in adj}
    match_w: dict[int, int | None] = {}

    def bfs() -> bool:
        dist = {}
        q = deque()
        for u in adj:
            if match_u[u] is None:
                dist[u] = 0
                q.append(u)
        found = False
        while q:
            u = q.popleft()
            for w in adj[u]:
                nu = match_w.get(w)
                if nu is None:
                    found = True
                elif nu not in dist:
                    dist[nu] = dist[u] + 1
                    q.append(nu)
        self_dist.clear()
        self_dist.update(dist)
        return found

    self_dist: dict[int, int] = {}

    def dfs(u: int) -> bool:
        for w in adj[u]:
            nu = match_w.get(w)
            if nu is None or (
                self_dist.get(nu) == self_dist.get(u, INF) + 1 and dfs(nu)
            ):
                match_u[u] = w
                match_w[w] = u
                return True
        self_dist[u] = INF
        return False

    size = 0
    while bfs():
        for u in adj:
            if match_u[u] is None and dfs(u):
                size += 1

    spark = graph.spark
    rows = [(u, w) for u, w in match_u.items() if w is not None]
    mdf = spark.createDataFrame(rows or [], "u long, w long")
    return size, mdf
