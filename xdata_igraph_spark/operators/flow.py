"""s-t maximum flow / minimum cut.

Reference: igraph_maxflow (/root/reference/src/flow.c:398, a
push-relabel solver), igraph_st_mincut (:1105). Push-relabel is
inherently sequential (every push reads the instantly-updated excess
of its neighbor), and the reference itself is single-core — so, like
:func:`~xdata_igraph_spark.operators.paths.dfs`, this runs an
Edmonds–Karp loop driver-side over collected edges, guarded by
``max_edges``. The distributed pieces stay distributed: the edge
collection is one filtered scan, and the returned cut partition is a
DataFrame usable in further relational plans.

The flow VALUE and cut CAPACITY match the reference exactly (max-flow
min-cut is unique in value; the particular cut returned is the
source-side reachability cut of the final residual graph, the same one
igraph_st_mincut derives, src/flow.c:1105-1160).
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def maxflow_value(
    graph: LinkGraph,
    source: int,
    target: int,
    capacity_col: str = "weight",
    max_edges: int = 5_000_000,
) -> float:
    """Maximum s→t flow value (igraph_maxflow_value,
    /root/reference/src/flow.c:908). Directed graphs use arcs as
    stored; undirected edges are usable in both directions with the
    full capacity each way (the reference models an undirected edge as
    a reciprocal arc pair, src/flow.c:430-460)."""
    value, _, _ = _edmonds_karp(graph, source, target, capacity_col, max_edges)
    return value


def st_mincut(
    graph: LinkGraph,
    source: int,
    target: int,
    capacity_col: str = "weight",
    max_edges: int = 5_000_000,
) -> tuple[float, DataFrame, DataFrame]:
    """(cut_value, partition1, cut_edges) — igraph_st_mincut
    (/root/reference/src/flow.c:1105): partition1 = (id) vertices on
    the source side of the final residual reachability; cut_edges =
    (src, dst) saturated arcs crossing the cut."""
    value, side1, cut = _edmonds_karp(graph, source, target, capacity_col, max_edges)
    spark = graph.spark
    p1 = spark.createDataFrame([(int(v),) for v in sorted(side1)], "id long")
    ce = spark.createDataFrame(sorted(cut) or [], "src long, dst long")
    return value, p1, ce


def _edmonds_karp(
    graph: LinkGraph, source: int, target: int, capacity_col: str, max_edges: int
):
    m = graph.ecount()
    if m > max_edges:
        raise ValueError(
            f"maxflow is sequential by definition (push-relabel in the "
            f"reference); refusing |E|={m} > {max_edges}"
        )
    s, t = int(source), int(target)
    rows = graph.edges.select(
        "src", "dst", F.col(capacity_col).cast("double").alias("cap")
    ).collect()
    cap: dict[tuple[int, int], float] = defaultdict(float)
    adj: dict[int, set[int]] = defaultdict(set)
    for r in rows:
        u, v, c = int(r["src"]), int(r["dst"]), float(r["cap"])
        if u == v or c <= 0:
            continue
        cap[(u, v)] += c
        adj[u].add(v)
        adj[v].add(u)  # residual arc
        if not graph.directed:
            cap[(v, u)] += c
    flow: dict[tuple[int, int], float] = defaultdict(float)

    def residual(u, v):
        return cap[(u, v)] - flow[(u, v)]

    total = 0.0
    while True:
        # BFS for the shortest augmenting path
        parent = {s: None}
        q = deque([s])
        while q and t not in parent:
            u = q.popleft()
            for v in sorted(adj[u]):
                if v not in parent and residual(u, v) > 1e-12:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            break
        # bottleneck
        path = []
        v = t
        while parent[v] is not None:
            u = parent[v]
            path.append((u, v))
            v = u
        aug = min(residual(u, v) for u, v in path)
        for u, v in path:
            flow[(u, v)] += aug
            flow[(v, u)] -= aug
        total += aug
    # source-side residual reachability = partition 1
    side1 = {s}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in side1 and residual(u, v) > 1e-12:
                side1.add(v)
                q.append(v)
    cut = [
        (u, v)
        for (u, v), c in cap.items()
        if c > 0 and u in side1 and v not in side1
    ]
    return total, side1, cut
