"""Cohesive blocking (Moody–White structural cohesion hierarchy) and
minimum-size vertex separators.

Reference: igraph_cohesive_blocks
(/root/reference/src/cohesive_blocks.c:202) and
igraph_minimum_size_separators (/root/reference/src/separators.c).
Both are sequential queue/recursion algorithms in the reference, so
they run guarded driver-side over the collected undirected edge list,
like the rest of the connectivity family (operators/flow.py).

- ``minimum_size_separators``: all vertex sets of size κ(G) whose
  removal disconnects the graph. Strategy: for every non-adjacent
  pair (s,t) with local connectivity κ(s,t) = κ(G), enumerate ALL
  minimum edge cuts of the vertex-split network (the closed-set
  enumeration shared with operators/stcuts.py) and map each cut's
  split edges back to vertex sets; dedupe. Every minimum separator
  separates some non-adjacent pair, so the union over pairs is the
  complete list (the reference reaches the same set through Even's
  pair-selection shortcut).
- ``cohesive_blocks``: the reference's exact queue procedure
  (cohesive_blocks.c:300-420): per candidate block find all minimum
  separators, remove their union, take the components (each extended
  with its neighboring separator vertices) plus the separator union
  itself as candidates, keep those whose max degree exceeds the
  parent's cohesion, then filter blocks whose (effective) ancestor is
  at least as cohesive and check-flagged blocks that are subsets of
  an equally-cohesive other block. Verified against the reference's
  own example outputs (examples/simple/cohesive_blocks.out), including
  the Moody–White Figure-2 graph and the science-camp graph.
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.stcuts import min_cut_edge_sets

_INF = float("inf")


def _collect_undirected(graph: LinkGraph, max_edges: int):
    rows = graph.edges.select("src", "dst").filter("src != dst").distinct()
    m = rows.count()
    if m > max_edges:
        raise ValueError(
            f"cohesive blocking is a sequential queue algorithm; refusing "
            f"|E|={m} > {max_edges}"
        )
    adj: dict[int, set[int]] = defaultdict(set)
    for r in rows.collect():
        u, v = int(r["src"]), int(r["dst"])
        adj[u].add(v)
        adj[v].add(u)
    verts = {int(r["id"]) for r in graph.vertices().collect()} | set(adj)
    return verts, adj


def _split_network(nodes, adj, s, t):
    """Vertex-split digraph for vertex cuts between non-adjacent s,t:
    v_in = 2v, v_out = 2v+1; split arcs cap 1, edge arcs cap ∞."""
    cap: dict[tuple[int, int], float] = defaultdict(float)
    nadj: dict[int, set[int]] = defaultdict(set)

    def add(u, v, c):
        cap[(u, v)] += c
        nadj[u].add(v)
        nadj[v].add(u)

    for v in nodes:
        if v != s and v != t:
            add(2 * v, 2 * v + 1, 1.0)
    for u in nodes:
        for v in adj[u]:
            if v not in nodes:
                continue
            uo = 2 * u + 1 if u not in (s, t) else 2 * u
            vi = 2 * v if v not in (s, t) else 2 * v
            add(uo, vi, _INF)
    return cap, nadj


def _pair_vertex_cuts(nodes, adj, s, t, max_cuts):
    """(κ(s,t), [frozenset vertex cuts]) for non-adjacent s, t."""
    cap, nadj = _split_network(nodes, adj, s, t)
    value, pairs = min_cut_edge_sets(cap, nadj, 2 * s, 2 * t, max_cuts)
    cuts = set()
    for _part, cedges in pairs:
        cut = frozenset(u // 2 for (u, v) in cedges if v == u + 1 and u % 2 == 0)
        cuts.add(cut)
    return value, cuts


def _local_vertex_connectivity(nodes, adj):
    """κ of the induced graph (driver-side): min κ(s,t) over
    non-adjacent pairs; complete graphs have κ = n − 1 by convention
    (igraph_vertex_connectivity, /root/reference/src/flow.c:2014)."""
    nodes = sorted(nodes)
    n = len(nodes)
    if n <= 1:
        return 0
    # disconnected?
    seen = {nodes[0]}
    q = deque([nodes[0]])
    nodeset = set(nodes)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v in nodeset and v not in seen:
                seen.add(v)
                q.append(v)
    if len(seen) < n:
        return 0
    best = n - 1
    for i, s in enumerate(nodes):
        for t in nodes[i + 1:]:
            if t in adj[s]:
                continue
            cap, nadj = _split_network(nodes, adj, s, t)
            from xdata_igraph_spark.operators.stcuts import _ek_flow

            val, _ = _ek_flow(cap, nadj, 2 * s, 2 * t)
            best = min(best, int(round(val)))
            if best == 0:
                return 0
    return best


def _all_min_separators(nodes, adj, k, max_cuts):
    """All vertex separators of size k of the induced graph."""
    nodes = sorted(nodes)
    seps: set[frozenset] = set()
    for i, s in enumerate(nodes):
        for t in nodes[i + 1:]:
            if t in adj[s]:
                continue
            value, cuts = _pair_vertex_cuts(nodes, adj, s, t, max_cuts)
            if int(round(value)) == k:
                seps.update(cuts)
            if len(seps) > max_cuts:
                raise ValueError(
                    f"more than {max_cuts} separators; raise max_cuts"
                )
    return seps


def minimum_size_separators(
    graph: LinkGraph,
    max_edges: int = 200_000,
    max_cuts: int = 100_000,
) -> DataFrame:
    """All minimum-size vertex separators → (sep_id, id)
    (igraph_minimum_size_separators,
    /root/reference/src/separators.c)."""
    verts, adj = _collect_undirected(graph, max_edges)
    k = _local_vertex_connectivity(verts, adj)
    if k == 0 or k >= len(verts) - 1:
        seps = []
    else:
        seps = sorted(_all_min_separators(verts, adj, k, max_cuts), key=sorted)
    rows = [
        (sid, int(v)) for sid, S in enumerate(seps) for v in sorted(S)
    ]
    return graph.spark.createDataFrame(rows or [], "sep_id long, id long")


def cohesive_blocks(
    graph: LinkGraph,
    max_edges: int = 200_000,
    max_cuts: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Cohesive block hierarchy → (blocks, info): blocks =
    (block_id, id) vertex membership, info = (block_id, cohesion,
    parent) with parent = -1 for the root
    (igraph_cohesive_blocks, /root/reference/src/cohesive_blocks.c:202).
    Undirected simple graphs, like the reference."""
    if graph.directed:
        raise ValueError("cohesive blocking only works on undirected graphs")
    verts, adj = _collect_undirected(graph, max_edges)

    def sub_adj(vs):
        return {v: adj[v] & vs for v in vs}

    # queue entries: (vertex frozenset, parent idx, cohesion, check flag)
    Q: list[list] = []
    root = frozenset(verts)
    Q.append([root, -1, _local_vertex_connectivity(root, sub_adj(root)), False])

    qptr = 0
    while qptr < len(Q):
        block, _parent, cohesion, check = Q[qptr]
        badj = sub_adj(block)
        k = _local_vertex_connectivity(block, badj)
        seps = (
            _all_min_separators(block, badj, k, max_cuts)
            if 0 < k < len(block) - 1
            else set()
        )
        if seps:
            marked = set().union(*seps)
            # components of block - marked, each extended by its
            # neighboring separator vertices (cohesive_blocks.c:78-130)
            compid: dict[int, int] = {}
            comps: list[set] = []
            for v in sorted(block):
                if v in marked or v in compid:
                    continue
                comp = {v}
                compid[v] = len(comps)
                q = deque([v])
                while q:
                    u = q.popleft()
                    for w in badj[u]:
                        if w in marked:
                            comp.add(w)
                        elif w not in compid:
                            compid[w] = len(comps)
                            comp.add(w)
                            q.append(w)
                comps.append(comp)
            addedsep = False
            if len(marked) != len(block):
                comps.append(set(marked))
                addedsep = True
            for comp in comps:
                cadj = sub_adj(frozenset(comp))
                maxdeg = max((len(cadj[v]) for v in comp), default=0)
                if maxdeg > k:
                    newk = _local_vertex_connectivity(frozenset(comp), cadj)
                    Q.append(
                        [frozenset(comp), qptr, newk, check or addedsep]
                    )
        Q[qptr][2] = k
        qptr += 1

    # --- filtering, exactly the reference's two passes ---
    nob = len(Q)
    removed = [False] * nob
    for i in range(1, nob):
        p = Q[i][1]
        while removed[p]:
            p = Q[p][1]
        if Q[p][2] >= Q[i][2]:
            removed[i] = True
    for i in range(1, nob):
        if not Q[i][3] or removed[i]:
            continue
        for j in range(1, nob):
            if j == i or not Q[j][3] or removed[j]:
                continue
            if Q[i][0] <= Q[j][0] and Q[j][2] >= Q[i][2]:
                removed[i] = True
                break

    blocks_rows, info_rows = [], []
    rewrite: dict[int, int] = {}
    resptr = 0
    for i in range(nob):
        if removed[i]:
            continue
        rewrite[i] = resptr
        p = Q[i][1]
        while p >= 0 and removed[p]:
            p = Q[p][1]
        pidx = rewrite[p] if p >= 0 else -1
        info_rows.append((resptr, int(Q[i][2]), pidx))
        for v in sorted(Q[i][0]):
            blocks_rows.append((resptr, int(v)))
        resptr += 1

    spark = graph.spark
    b = spark.createDataFrame(blocks_rows or [], "block_id long, id long")
    info = spark.createDataFrame(
        info_rows or [], "block_id long, cohesion long, parent long"
    )
    return b, info
