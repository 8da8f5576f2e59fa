"""Feedback arc sets.

Reference: igraph_feedback_arc_set
(/root/reference/src/feedback_arc_set.c:44). Undirected graphs reduce
exactly to "everything outside a maximum-weight spanning forest"
(:112) — fully distributed here via the Borůvka machinery of
operators/mst.py on negated weights. Directed graphs are NP-hard; the
reference's default heuristic is Eades–Lin–Smyth (:191), a linear but
inherently sequential peel (every step reads the degrees the previous
removal just changed), so like dfs/maxflow it runs driver-side over
one guarded edge scan. The returned arc set stays a DataFrame.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def feedback_arc_set(
    graph: LinkGraph,
    algo: str = "eades",
    max_edges: int = 5_000_000,
) -> DataFrame:
    """(src, dst, weight) — arcs whose removal makes the graph acyclic
    (igraph_feedback_arc_set, /root/reference/src/feedback_arc_set.c:44
    with IGRAPH_FAS_APPROX_EADES; the exact-IP mode is out of scope
    like the reference's other exponential solvers).

    Undirected: the exact reduction (:112) — every edge NOT in a
    maximum-weight spanning forest (distributed Borůvka on negated
    weights; removal count = |E| − |V| + #components, the optimum).

    Directed: Eades–Lin–Smyth (:191) — repeatedly peel sinks (prepend
    to s2), then sources (append to s1), else the vertex maximizing
    out-strength − in-strength (append to s1); the FAS is every arc
    running backward in the concatenated order s1·s2, guaranteed
    ≤ |E|/2 − |V|/6 arcs in the unweighted case. The peel is the
    guarded driver-side part; the backward-arc selection is one
    distributed join against the broadcast position map."""
    if algo != "eades":
        raise ValueError(
            "algo must be 'eades' (IGRAPH_FAS_EXACT_IP is exponential and "
            "out of scope, matching the package's no-IP-solver policy)"
        )
    e = graph.edges.select("src", "dst", "weight")
    if not graph.directed:
        from xdata_igraph_spark.operators.mst import minimum_spanning_tree

        neg = LinkGraph(
            graph.edges.withColumn("weight", -F.col("weight")),
            directed=False,
            n=graph._n,
            vertices=graph._vertices,
        )
        forest = minimum_spanning_tree(neg).select("src", "dst")
        return e.join(forest, ["src", "dst"], "left_anti")

    m = graph.ecount()
    if m > max_edges:
        raise ValueError(
            f"Eades FAS is sequential by definition (each peel reads the "
            f"degrees the last one changed); refusing |E|={m} > {max_edges}"
        )
    rows = e.collect()
    outs: dict[int, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    ins: dict[int, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    nodes = {int(r["id"]) for r in graph.vertices().collect()}
    for r in rows:
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if u == v:
            continue  # loops are never part of a FAS in the reference
        outs[u][v] += w
        ins[v][u] += w
        nodes.add(u)
        nodes.add(v)

    import heapq

    outdeg = {v: sum(outs[v].values()) for v in nodes}
    indeg = {v: sum(ins[v].values()) for v in nodes}
    alive = set(nodes)
    # lazy heaps: stale entries are skipped on pop
    sinks = [v for v in nodes if outdeg[v] == 0]
    sources = [v for v in nodes if indeg[v] == 0 and outdeg[v] > 0]
    deltas = [(-(outdeg[v] - indeg[v]), v) for v in nodes]
    heapq.heapify(deltas)
    s1: list[int] = []
    s2: list[int] = []

    def remove(v: int) -> None:
        alive.discard(v)
        for t, w in outs[v].items():
            if t in alive:
                indeg[t] -= w
                if indeg[t] <= 1e-12 and outdeg[t] > 0:
                    sources.append(t)
                heapq.heappush(deltas, (-(outdeg[t] - indeg[t]), t))
        for s, w in ins[v].items():
            if s in alive:
                outdeg[s] -= w
                if outdeg[s] <= 1e-12:
                    sinks.append(s)
                heapq.heappush(deltas, (-(outdeg[s] - indeg[s]), s))

    while alive:
        progressed = True
        while progressed:
            progressed = False
            while sinks:
                v = sinks.pop()
                if v in alive and outdeg[v] <= 1e-12:
                    s2.append(v)
                    remove(v)
                    progressed = True
            while sources:
                v = sources.pop()
                if v in alive and indeg[v] <= 1e-12:
                    s1.append(v)
                    remove(v)
                    progressed = True
        if not alive:
            break
        while deltas:
            negd, v = heapq.heappop(deltas)
            if v in alive and abs(-negd - (outdeg[v] - indeg[v])) <= 1e-9:
                s1.append(v)
                remove(v)
                break

    order = s1 + list(reversed(s2))
    pos = {v: i for i, v in enumerate(order)}
    spark = graph.spark
    pos_df = spark.createDataFrame(list(pos.items()), "id long, pos long")
    return (
        e.filter(F.col("src") != F.col("dst"))
        .join(pos_df.select(F.col("id").alias("src"), F.col("pos").alias("_ps")), "src")
        .join(pos_df.select(F.col("id").alias("dst"), F.col("pos").alias("_pd")), "dst")
        .filter(F.col("_ps") > F.col("_pd"))
        .select("src", "dst", "weight")
    )
