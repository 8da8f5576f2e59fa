"""Greedy modularity agglomeration (CNM "fastgreedy") + the shared
dendrogram/merge engine used by the edge-betweenness communities.

Reference: igraph_community_fastgreedy
(/root/reference/src/fast_community.c:467), Clauset-Newman-Moore. The
reference is a sequential heap algorithm (merge the community pair
with the largest modularity gain, update the heap, repeat) — there is
no distributed formulation that preserves its greedy merge order, so
like the reference's other inherently sequential kernels (dfs,
maxflow/Edmonds-Karp, gomory_hu) this runs driver-side over a
once-collected edge list, size-guarded by ``max_edges``. The
distributed modularity-optimizing alternatives for cluster scale are
``multilevel_communities`` (Louvain), ``label_propagation`` and
``leading_eigenvector_communities`` — this operator exists for API
parity and for the small/medium graphs where users reach for the CNM
dendrogram.

Semantics matched:
- merge gain dQ(A,B) = cross(A,B)/m − 2·(d_A/2m)·(d_B/2m) on the
  simple undirected (optionally weighted) graph
  (src/fast_community.c:120-180);
- the full dendrogram is built and cut at the maximum-modularity
  level (matching the Python interface's
  ``VertexDendrogram.as_clustering``,
  interfaces/python/igraph/__init__.py fastgreedy wrapper);
- ties in the merge gain break deterministically on the smallest
  (community, community) id pair — the reference's order is
  heap-internal and unspecified; documented deviation (SURVEY.md §5).

Labels are renumbered 0..k−1 by first appearance in vertex-id order,
the same canonicalization every community operator here uses.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


class CommunityMerger:
    """Union-find + per-community full-graph edge/strength accounting
    with exact incremental modularity. Shared by fastgreedy (heap
    order) and edge-betweenness communities (dendrogram replay)."""

    def __init__(self, vertices, edges):
        # edges: list of (u, v, w) simple undirected, no loops
        self.parent = {v: v for v in vertices}
        self.size = {v: 1 for v in vertices}
        self.strength = {v: 0.0 for v in vertices}
        self.intra = {v: 0.0 for v in vertices}
        self.cross = {v: {} for v in vertices}
        m = 0.0
        for u, v, w in edges:
            m += w
            self.strength[u] += w
            self.strength[v] += w
            if u != v:
                self.cross[u][v] = self.cross[u].get(v, 0.0) + w
                self.cross[v][u] = self.cross[v].get(u, 0.0) + w
        self.m = m
        self.q = sum(
            -((s / (2.0 * m)) ** 2) for s in self.strength.values()
        ) if m else float("nan")
        self.merges = []  # (root_kept, root_absorbed) per merge

    def find(self, v):
        p = self.parent
        root = v
        while p[root] != root:
            root = p[root]
        while p[v] != root:
            p[v], v = root, p[v]
        return root

    def _contrib(self, c):
        return self.intra[c] / self.m - (self.strength[c] / (2.0 * self.m)) ** 2

    def gain(self, a, b):
        """dQ of merging roots a, b (0 if not adjacent)."""
        w = self.cross[a].get(b, 0.0)
        return w / self.m - 2.0 * (self.strength[a] / (2.0 * self.m)) * (
            self.strength[b] / (2.0 * self.m)
        )

    def merge(self, a, b):
        """Merge roots a and b (small-into-large); returns kept root."""
        if self.size[a] < self.size[b]:
            a, b = b, a
        w_ab = self.cross[a].pop(b, 0.0)
        self.cross[b].pop(a, None)
        self.q -= self._contrib(a) + self._contrib(b)
        self.parent[b] = a
        self.size[a] += self.size[b]
        self.strength[a] += self.strength[b]
        self.intra[a] += self.intra[b] + w_ab
        big, small = self.cross[a], self.cross[b]
        for nbr, w in small.items():
            big[nbr] = big.get(nbr, 0.0) + w
            d = self.cross[nbr]
            d[a] = d.get(a, 0.0) + w
            del d[b]
        self.cross[b] = {}
        self.q += self._contrib(a)
        self.merges.append((a, b))
        return a


def _collect_simple(graph: LinkGraph, weighted: bool, max_edges: int):
    e = graph.edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        (F.col("weight") if weighted else F.lit(1.0)).alias("w"),
    )
    e = e.groupBy("u", "v").agg(F.sum("w").alias("w"))
    n_edges = e.count()
    if n_edges > max_edges:
        raise ValueError(
            f"driver-side community dendrogram guarded at {max_edges} edges "
            f"(got {n_edges}); use multilevel_communities / "
            f"label_propagation / leading_eigenvector_communities at scale"
        )
    edges = [(r["u"], r["v"], r["w"]) for r in e.collect()]
    vertices = sorted(r["id"] for r in graph.vertices().collect())
    return vertices, edges


def _membership_df(spark, vertices, roots) -> DataFrame:
    """(id, label) with labels dense by first appearance in id order."""
    remap: dict = {}
    rows = []
    for v in vertices:
        r = roots[v]
        if r not in remap:
            remap[r] = len(remap)
        rows.append((v, remap[r]))
    return spark.createDataFrame(rows, "id long, label long")


def _cut_at(vertices, edges, merge_prefix):
    """Replay a merge prefix and return root-per-vertex."""
    cm = CommunityMerger(vertices, edges)
    for a, b in merge_prefix:
        ra, rb = cm.find(a), cm.find(b)
        if ra != rb:
            cm.merge(ra, rb)
    return {v: cm.find(v) for v in vertices}


def community_fastgreedy(
    graph: LinkGraph,
    weighted: bool = False,
    max_edges: int = 1_000_000,
    return_details: bool = False,
):
    """CNM greedy modularity communities → (id, label)
    (igraph_community_fastgreedy,
    /root/reference/src/fast_community.c:467), dendrogram cut at the
    maximum-modularity level."""
    spark = graph.spark
    vertices, edges = _collect_simple(graph, weighted, max_edges)
    cm = CommunityMerger(vertices, edges)

    heap: list = []
    for a, nbrs in cm.cross.items():
        for b in nbrs:
            if a < b:
                heapq.heappush(heap, (-cm.gain(a, b), a, b))

    best_q, best_level = cm.q, 0
    q_trace = [cm.q]
    while heap:
        ndq, a, b = heapq.heappop(heap)
        ra, rb = cm.find(a), cm.find(b)
        if ra == rb:
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        # lazy heap: entry must reflect the CURRENT gain of live roots
        if (a, b) != (lo, hi) or -ndq != cm.gain(lo, hi):
            cur = cm.gain(lo, hi)
            heapq.heappush(heap, (-cur, lo, hi))
            continue
        kept = cm.merge(lo, hi)
        q_trace.append(cm.q)
        if cm.q > best_q + 1e-12:
            best_q, best_level = cm.q, len(cm.merges)
        for nbr in cm.cross[kept]:
            x, y = (kept, nbr) if kept < nbr else (nbr, kept)
            heapq.heappush(heap, (-cm.gain(x, y), x, y))

    roots = _cut_at(vertices, edges, cm.merges[:best_level])
    out = _membership_df(spark, vertices, roots)
    if return_details:
        return out, {"modularity": best_q, "q_trace": q_trace,
                     "merges": list(cm.merges)}
    return out
