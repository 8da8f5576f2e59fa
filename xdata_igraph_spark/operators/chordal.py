"""Maximum cardinality search and chordality testing.

Reference: igraph_maximum_cardinality_search
(/root/reference/src/decomposition.c:56), igraph_is_chordal (:252).
MCS numbers vertices one at a time, always taking an unnumbered
vertex with the most numbered neighbors — a textbook sequential
greedy (every step depends on the previous step's update), exactly
like the reference's implementation; so, like
:func:`~xdata_igraph_spark.operators.paths.dfs` and the flow family,
this runs driver-side over collected adjacency, guarded by
``max_vertices``. The chordality certificate check (every vertex's
earlier-numbered neighborhood must be covered through its latest
earlier neighbor) follows Tarjan-Yannakakis 1984, the same test the
reference implements.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

from xdata_igraph_spark.graph import LinkGraph


def _collect_adjacency(graph: LinkGraph, max_vertices: int):
    n = graph.vcount()
    if n > max_vertices:
        raise ValueError(
            f"maximum cardinality search is sequential by definition; "
            f"refusing |V|={n} > {max_vertices}"
        )
    ids = sorted(int(r["id"]) for r in graph.vertices().collect())
    adj: dict[int, set[int]] = defaultdict(set)
    for r in graph.edges.select("src", "dst").collect():
        u, v = int(r["src"]), int(r["dst"])
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return ids, adj


def maximum_cardinality_search(
    graph: LinkGraph, root: int = 0, max_vertices: int = 100_000
) -> DataFrame:
    """MCS rank vector → (id, rank), matching the reference's
    ``alpha`` exactly: ranks count DOWN from n-1, so the first-visited
    vertex (``root``) gets rank n-1 and the last gets 0
    (igraph_maximum_cardinality_search, decomposition.c:133 assigns
    ``alpha(v) := i-1`` with i decreasing). Ties are broken toward the
    smallest vertex id (the reference's tie order is its bucket-list
    insertion order; any MCS order is a valid certificate, and
    smallest-id makes this one deterministic). Covers every component,
    like the reference."""
    ids, adj = _collect_adjacency(graph, max_vertices)
    if not ids:
        return graph.spark.createDataFrame([], "id long, rank long")
    numbered: dict[int, int] = {}
    weight = {v: 0 for v in ids}
    order: list[int] = []
    first = root if root in weight else ids[0]
    pick = first
    while len(order) < len(ids):
        numbered[pick] = len(order)
        order.append(pick)
        del weight[pick]
        for u in adj[pick]:
            if u in weight:
                weight[u] += 1
        if not weight:
            break
        best_w = max(weight.values())
        pick = min(v for v, w in weight.items() if w == best_w)
    n = len(order)
    return graph.spark.createDataFrame(
        [(int(v), int(n - 1 - i)) for i, v in enumerate(order)],
        "id long, rank long",
    )


def is_chordal(
    graph: LinkGraph, max_vertices: int = 100_000
) -> tuple[bool, list[tuple[int, int]]]:
    """(chordal?, fill_in edges) — igraph_is_chordal
    (decomposition.c:252): run MCS, then verify the perfect
    elimination order; the returned fill-in is the set of edges whose
    addition would make the graph chordal under this order (empty iff
    chordal), matching the reference's ``fillin`` output semantics."""
    ids, adj = _collect_adjacency(graph, max_vertices)
    rank_df = maximum_cardinality_search(graph, max_vertices=max_vertices)
    # process in INCREASING alpha = reverse MCS visit order, exactly
    # the reference's `w := alpham1(i)` loop (decomposition.c:340-410);
    # rank here is the reference's alpha (first visited = n-1)
    order = [
        int(r["id"]) for r in sorted(rank_df.collect(), key=lambda r: r["rank"])
    ]
    rank = {v: i for i, v in enumerate(order)}
    # Tarjan–Yannakakis FILL with follower pointers: walking each
    # lower-alpha neighbor's follower chain up to the current vertex
    # adds exactly the elimination-game fill edges, so (graph + fill)
    # IS chordal.
    f: dict[int, int] = {}
    index: dict[int, int] = {}
    fill: list[tuple[int, int]] = []
    for i, w in enumerate(order):
        f[w] = w
        index[w] = i
        nbrs_w = adj[w]
        for v in nbrs_w:
            if rank[v] >= i:
                continue
            x = v
            while index[x] < i:
                index[x] = i
                if x not in nbrs_w:
                    fill.append((min(x, w), max(x, w)))
                x = f[x]
            if f[x] == x:
                f[x] = w
    seen: set[tuple[int, int]] = set()
    fill_unique = [e for e in fill if not (e in seen or seen.add(e))]
    return (len(fill_unique) == 0, fill_unique)
