"""Walktrap communities (Pons-Latapy random-walk distances).

Reference: igraph_community_walktrap
(/root/reference/src/walktrap.cpp:125, engine in
walktrap_communities.cpp) — t-step random-walk probability profiles,
Ward-style agglomeration of ADJACENT communities minimizing the
Pons-Latapy Δσ, dendrogram cut at maximum modularity (matching the
Python wrapper's ``as_clustering``).

Semantics matched to the reference:
- every vertex gets an implicit self-loop of weight equal to its mean
  incident edge weight (1.0 for isolated vertices) before the walk —
  walktrap_graph.cpp:183-187 — making the chain lazy enough to behave
  on bipartite-ish structure;
- walk length ``steps`` defaults to 4 (the reference's default);
- r²(C1,C2) = Σ_k (P^t_{C1·k} − P^t_{C2·k})² / d_k with d the
  self-loop-augmented degree; Δσ(C1,C2) =
  (|C1||C2| / (|C1|+|C2|)) · r² / n  (walktrap_communities.cpp:
  compute_delta_sigma); only adjacent pairs are merge candidates;
- min-Δσ ties break on the smallest (community, community) id pair
  (the reference's heap order is unspecified; documented deviation).

Like the reference this is a sequential heap algorithm over dense
P^t rows (the reference keeps "exact" probability vectors per
community and merges them pairwise); it runs driver-side over numpy
at guarded scale (``max_vertices``) — the distributed community
operators (Louvain / LPA / leading eigenvector) are the corpus-scale
paths. P^t is computed by t dense matmuls; memory is O(n²), the same
asymptotic the reference's exact mode pays.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.fastgreedy import (
    CommunityMerger,
    _collect_simple,
    _cut_at,
    _membership_df,
)


def community_walktrap(
    graph: LinkGraph,
    steps: int = 4,
    weighted: bool = False,
    max_vertices: int = 2000,
    return_details: bool = False,
):
    """Walktrap communities → (id, label), dendrogram cut at the
    maximum-modularity level."""
    import numpy as np

    spark = graph.spark
    n_v = graph.vertices().count()
    if n_v > max_vertices:
        raise ValueError(
            f"driver-side walktrap guarded at {max_vertices} vertices "
            f"(got {n_v}); use multilevel_communities / label_propagation "
            f"at scale"
        )
    vertices, edges = _collect_simple(
        graph, weighted=weighted, max_edges=max_vertices * max_vertices
    )
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}

    # adjacency + reference self-loops (mean incident weight; 1.0 if
    # isolated), then P = D^-1 A
    A = np.zeros((n, n))
    deg_cnt = np.zeros(n)
    for u, v, w in edges:
        A[idx[u], idx[v]] += w
        A[idx[v], idx[u]] += w
        deg_cnt[idx[u]] += 1
        deg_cnt[idx[v]] += 1
    tot_w = A.sum(axis=1)
    self_w = np.where(deg_cnt > 0, tot_w / np.maximum(deg_cnt, 1), 1.0)
    A[np.diag_indices(n)] += self_w
    d = A.sum(axis=1)
    P = A / d[:, None]
    Pt = np.linalg.matrix_power(P, steps)
    # scaled profiles: r² between profiles = squared euclidean distance
    Y = Pt / np.sqrt(d)[None, :]

    # modularity/adjacency bookkeeping shared with fastgreedy/GN
    cm = CommunityMerger(vertices, edges)
    centroid = {v: Y[idx[v]] for v in vertices}

    def dsigma(a, b):
        diff = centroid[a] - centroid[b]
        sa, sb = cm.size[a], cm.size[b]
        return (sa * sb / (sa + sb)) * float(diff @ diff) / n

    heap: list = []
    for a, nbrs in cm.cross.items():
        for b in nbrs:
            if a < b:
                heapq.heappush(heap, (dsigma(a, b), a, b))

    best_q, best_level = cm.q, 0
    merge_seq: list[tuple] = []
    while heap:
        ds, a, b = heapq.heappop(heap)
        ra, rb = cm.find(a), cm.find(b)
        if ra == rb:
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        if (a, b) != (lo, hi) or abs(ds - dsigma(lo, hi)) > 1e-12:
            heapq.heappush(heap, (dsigma(lo, hi), lo, hi))
            continue
        sa, sb = cm.size[lo], cm.size[hi]
        merged = (sa * centroid[lo] + sb * centroid[hi]) / (sa + sb)
        kept = cm.merge(lo, hi)
        gone = hi if kept == lo else lo
        centroid[kept] = merged
        del centroid[gone]
        merge_seq.append((a, b))
        if cm.q > best_q + 1e-12:
            best_q, best_level = cm.q, len(merge_seq)
        for nbr in cm.cross[kept]:
            x, y = (kept, nbr) if kept < nbr else (nbr, kept)
            heapq.heappush(heap, (dsigma(x, y), x, y))

    roots = _cut_at(vertices, edges, merge_seq[:best_level])
    out = _membership_df(spark, vertices, roots)
    if return_details:
        return out, {"modularity": best_q, "merges": merge_seq}
    return out
