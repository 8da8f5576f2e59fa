"""Edge-betweenness (Girvan-Newman) communities.

Reference: igraph_community_edge_betweenness
(/root/reference/src/community.c:312-470): repeatedly recompute edge
betweenness, remove the maximum edge, record the removal order; the
splits form a dendrogram that is cut at the maximum-modularity level
(modularity always evaluated on the ORIGINAL graph, like the
reference's igraph_community_eb_get_merges path).

Spark shape: the expensive inner kernel — a full edge-betweenness
sweep per removal — runs DISTRIBUTED (the batched-Brandes plan in
operators/centrality.py) on the current remaining graph; only the
one-row argmax is collected per removal, and the dendrogram replay
(union-find + exact incremental modularity over the once-collected
edge list, shared CommunityMerger engine) is driver-side. The loop
itself is inherently sequential — each removal depends on the
betweenness of the graph AFTER the previous removal — so total work
is O(E) betweenness sweeps; ``max_edges`` guards it to analysis-scale
graphs exactly like flow.py's Edmonds-Karp guard. At corpus scale use
multilevel_communities / label_propagation instead.

Determinism: max-betweenness ties break on the smallest (src, dst)
pair (the reference takes whichever maximum its scan hits first —
unspecified order; documented deviation, SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.centrality import edge_betweenness
from xdata_igraph_spark.operators.fastgreedy import (
    CommunityMerger,
    _collect_simple,
    _cut_at,
    _membership_df,
)


def community_edge_betweenness(
    graph: LinkGraph,
    max_edges: int = 10_000,
    return_details: bool = False,
):
    """Girvan-Newman communities → (id, label), dendrogram cut at max
    modularity on the original graph. Undirected semantics (directions
    ignored), loops dropped, multi-edges collapsed."""
    spark = graph.spark
    vertices, edges = _collect_simple(graph, weighted=False, max_edges=max_edges)

    remaining = {(u, v) for u, v, _ in edges}
    removal_order: list[tuple] = []
    eb_at_removal: list[float] = []
    while remaining:
        g_cur = LinkGraph.from_pairs(spark, sorted(remaining), directed=False)
        eb = edge_betweenness(g_cur, directed=False)
        top = (
            eb.orderBy(F.desc("betweenness"), F.asc("src"), F.asc("dst"))
            .limit(1)
            .collect()[0]
        )
        u, v = top["src"], top["dst"]
        key = (u, v) if u < v else (v, u)
        if key not in remaining:
            raise AssertionError(f"edge_betweenness returned unknown edge {key}")
        remaining.discard(key)
        removal_order.append(key)
        eb_at_removal.append(float(top["betweenness"]))

    # dendrogram: replay removals in reverse; every edge that joins two
    # different components is a merge, evaluated with exact modularity
    # on the original graph (CommunityMerger tracks full-graph
    # intra/strength under the union-find)
    cm = CommunityMerger(vertices, edges)
    best_q, best_level = cm.q, 0
    merge_seq: list[tuple] = []
    for u, v in reversed(removal_order):
        ru, rv = cm.find(u), cm.find(v)
        if ru == rv:
            continue
        cm.merge(ru, rv)
        merge_seq.append((u, v))
        if cm.q > best_q + 1e-12:
            best_q, best_level = cm.q, len(merge_seq)

    roots = _cut_at(vertices, edges, merge_seq[:best_level])
    out = _membership_df(spark, vertices, roots)
    if return_details:
        return out, {
            "modularity": best_q,
            "removed_edges": removal_order,
            "edge_betweenness": eb_at_removal,
        }
    return out
