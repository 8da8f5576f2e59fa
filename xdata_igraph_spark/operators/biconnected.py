"""Articulation points, bridges, biconnected components.

Reference: igraph_articulation_points
(/root/reference/src/components.c:553), igraph_biconnected_components
(:623), igraph_bridges (not in this reference version — derived here
as the single-edge biconnected components, the standard definition).
The reference is a Hopcroft-Tarjan lowpoint DFS — inherently
sequential (lowpoints depend on the DFS stack), and sequential in the
reference too — so, like
:func:`~xdata_igraph_spark.operators.paths.dfs` and the flow family,
this runs an iterative (explicit-stack) DFS driver-side over
collected adjacency, guarded by ``max_edges``. The distributed-scale
alternative (Tarjan-Vishkin Euler-tour biconnectivity) is noted in
SURVEY.md as the upgrade path should component-level biconnectivity
ever need to run on the full link graph.

Directions are ignored (the reference likewise treats the graph as
undirected for biconnectivity).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

from xdata_igraph_spark.graph import LinkGraph


def _tarjan(graph: LinkGraph, max_edges: int):
    """One lowpoint DFS → (articulation set, bridge list, component
    edge lists). Multi-edges collapse to one undirected edge with a
    multiplicity; a doubled edge is never a bridge and forms its own
    biconnected component, like the reference's edge-keyed output."""
    if graph.ecount() > max_edges:
        raise ValueError(
            f"biconnectivity is a sequential DFS by definition "
            f"(Hopcroft-Tarjan in the reference); refusing "
            f"|E| > {max_edges}"
        )
    mult: dict[tuple[int, int], int] = defaultdict(int)
    for r in graph.edges.select("src", "dst").collect():
        u, v = int(r["src"]), int(r["dst"])
        if u != v:
            mult[(min(u, v), max(u, v))] += 1
    adj: dict[int, list[int]] = defaultdict(list)
    for (u, v), _ in sorted(mult.items()):
        adj[u].append(v)
        adj[v].append(u)
    ids = sorted(int(r["id"]) for r in graph.vertices().collect())

    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    parent: dict[int, int | None] = {}
    aps: set[int] = set()
    bridges: list[tuple[int, int]] = []
    comps: list[list[tuple[int, int]]] = []
    estack: list[tuple[int, int]] = []
    counter = 0

    for root in ids:
        if root in disc:
            continue
        parent[root] = None
        root_children = 0
        # explicit stack: (vertex, iterator index into adj[vertex])
        stack = [(root, 0)]
        disc[root] = low[root] = counter
        counter += 1
        while stack:
            v, i = stack[-1]
            if i < len(adj[v]):
                stack[-1] = (v, i + 1)
                w = adj[v][i]
                if w not in disc:
                    parent[w] = v
                    estack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = counter
                    counter += 1
                    if v == root:
                        root_children += 1
                    stack.append((w, 0))
                elif w != parent[v] and disc[w] < disc[v]:
                    # back edge (each undirected edge processed once)
                    estack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
                elif w == parent[v] and mult[(min(v, w), max(v, w))] > 1:
                    # parallel edge to the parent acts as a back edge
                    low[v] = min(low[v], disc[w])
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] >= disc[p]:
                        # p separates v's subtree: pop one component
                        comp: list[tuple[int, int]] = []
                        edge = (min(p, v), max(p, v))
                        while estack:
                            e = estack.pop()
                            comp.append(e)
                            if e == edge:
                                break
                        comps.append(comp)
                        if p != root:
                            aps.add(p)
                    if low[v] > disc[p] and mult[(min(p, v), max(p, v))] == 1:
                        bridges.append((min(p, v), max(p, v)))
        if root_children >= 2:
            aps.add(root)
    return aps, bridges, comps


def articulation_points(
    graph: LinkGraph, max_edges: int = 5_000_000
) -> DataFrame:
    """Cut vertices → (id) (igraph_articulation_points,
    components.c:553)."""
    aps, _, _ = _tarjan(graph, max_edges)
    return graph.spark.createDataFrame(
        [(int(v),) for v in sorted(aps)] or [], "id long"
    )


def bridges(graph: LinkGraph, max_edges: int = 5_000_000) -> DataFrame:
    """Cut edges → (src, dst) with src < dst; a multi-edge is never a
    bridge."""
    _, brs, _ = _tarjan(graph, max_edges)
    return graph.spark.createDataFrame(
        sorted(brs) or [], "src long, dst long"
    )


def biconnected_components(
    graph: LinkGraph, max_edges: int = 5_000_000
) -> DataFrame:
    """Edge-partition into biconnected components → (component, src,
    dst) (igraph_biconnected_components, components.c:623 — the
    reference likewise keys components by edge list; isolated vertices
    belong to no component). Component ids number the components in
    DFS completion order."""
    _, _, comps = _tarjan(graph, max_edges)
    rows = [
        (int(ci), int(u), int(v))
        for ci, comp in enumerate(comps)
        for (u, v) in sorted(set(comp))
    ]
    return graph.spark.createDataFrame(
        rows or [], "component long, src long, dst long"
    )
