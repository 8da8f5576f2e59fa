"""Driver-side exact oracles for the flagship algorithms.

These are small, dense, *sequential* implementations of the reference's
documented semantics, used purely as test oracles (the reference's own
golden outputs pin them; python-igraph is not installed in this image).
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    n: int,
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    directed: bool = True,
    weights: list[float] | None = None,
    reset: list[float] | None = None,
) -> np.ndarray:
    """Exact PageRank fixpoint via dense linear solve, implementing
    igraph's iteration semantics (/root/reference/src/centrality.c:
    913-973): dangling vertices donate all mass to the reset
    distribution, negative weights clamp to 0, loops excluded.
    Verified against the reference's golden outputs
    (examples/simple/igraph_pagerank.out; python test structural.py:282).
    """
    W = np.zeros((n, n))
    for idx, (s, d_) in enumerate(edges):
        w = weights[idx] if weights is not None else 1.0
        w = max(float(w), 0.0)
        W[s, d_] += w
        if not directed and s != d_:
            W[d_, s] += w
    np.fill_diagonal(W, 0.0)
    outs = W.sum(axis=1)
    dang = (outs <= 0).astype(float)
    M = np.zeros((n, n))
    nz = outs > 0
    M[nz, :] = W[nz, :] / outs[nz, None]
    if reset is None:
        r = np.full(n, 1.0 / n)
    else:
        r = np.asarray(reset, float)
        if r.sum() <= 0:
            raise ValueError("all-zero reset")
        r = r / r.sum()
    d = damping
    A = np.eye(n) - d * M.T - d * np.outer(r, dang)
    x = np.linalg.solve(A, (1 - d) * r)
    return x / x.sum()


def wcc_oracle(n: int, edges: list[tuple[int, int]]) -> list[int]:
    """Union-find; numbering = rank of component's min vertex id
    (igraph scan-order numbering, /root/reference/src/components.c:119-145)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    roots = [find(i) for i in range(n)]
    order = {r: k for k, r in enumerate(sorted(set(roots)))}
    return [order[r] for r in roots]


def scc_oracle(n: int, edges: list[tuple[int, int]]) -> list[int]:
    """Tarjan SCC, canonically renumbered by min member id."""
    import sys

    sys.setrecursionlimit(max(10000, 10 * n))
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    index = [0]
    idx = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    comp = [-1] * n
    ncomp = [0]

    def strongconnect(v):
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                idx[node] = low[node] = index[0]
                index[0] += 1
                stack.append(node)
                on_stack[node] = True
            recurse = False
            for i in range(pi, len(adj[node])):
                w = adj[node][i]
                if idx[w] == -1:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[node] = min(low[node], idx[w])
            if recurse:
                continue
            if low[node] == idx[node]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = ncomp[0]
                    if w == node:
                        break
                ncomp[0] += 1
            work.pop()
            if work:
                pnode, _ = work[-1]
                low[pnode] = min(low[pnode], low[node])

    for v in range(n):
        if idx[v] == -1:
            strongconnect(v)
    # canonical renumber by min member id
    minid: dict[int, int] = {}
    for v in range(n):
        minid[comp[v]] = min(minid.get(comp[v], v), v)
    order = {c: k for k, (c, _) in enumerate(sorted(minid.items(), key=lambda kv: kv[1]))}
    return [order[comp[v]] for v in range(n)]


def triangles_oracle(n: int, edges: list[tuple[int, int]]) -> tuple[int, list[int]]:
    """(total triangles, per-vertex counts) on the simplified
    undirected graph (directions ignored, loops/multi dropped —
    /root/reference/src/triangles.c:399-428)."""
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    per = [0] * n
    total = 0
    for v in range(n):
        for u in nbrs[v]:
            if u <= v:
                continue
            common = nbrs[v] & nbrs[u]
            for w in common:
                if w > u:
                    total += 1
                    per[v] += 1
                    per[u] += 1
                    per[w] += 1
    return total, per


def gnm_edges(
    n: int, m: int, directed: bool, seed: int = 42
) -> list[tuple[int, int]]:
    """Deterministic simple G(n,m) via seeded numpy sampling (the
    reference's reproducibility discipline: same seed ⇒ same graph,
    interfaces/python/igraph/test/rng.py:35-41)."""
    rng = np.random.default_rng(seed)
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int]] = []
    while len(out) < m:
        s = int(rng.integers(0, n))
        d = int(rng.integers(0, n))
        if s == d:
            continue
        key = (s, d) if directed else (min(s, d), max(s, d))
        if key in seen:
            continue
        seen.add(key)
        out.append(key)
    return out
