"""Enumerate (s,t) edge cuts — all minimal cuts and all minimum cuts.

Reference: igraph_all_st_cuts (/root/reference/src/st-cuts.c:976) and
igraph_all_st_mincuts (:1290), both implementing the Provan–Shier
listing paradigm (Algorithmica 15, 1996). Directed graphs only, like
the reference.

Semantic contract (verified against the reference's own example
outputs, examples/simple/igraph_all_st_cuts.out / _mincuts.out):

- ``all_st_cuts`` lists every inclusion-minimal (s,t) edge cut C
  exactly once. A cut is minimal iff (a) the head of every crossing
  edge reaches t once C is removed and (b) the tail of every crossing
  edge stays reachable from s once C is removed; the enumeration
  walks the cannot-reach-t closures (bijective with minimal cuts) and
  reports each partition the way the reference does: as
  Reach_s(G − C), the source-reachable side (the Provan–Shier S set).
- ``all_st_mincuts`` lists every minimum-capacity cut exactly once:
  the cuts are the closed sets of the residual-graph SCC condensation
  (Picard–Queyranne), enumerated as forward-residual closures of
  {source component} ∪ a subset of the ACTIVE components (those
  touching positive flow) — inactive components enter only when
  closedness forces them, which is how the reference's pivot keeps
  duplicate edge sets out (st-cuts.c:1371-1396 active-marking);
  partitions are reported as Reach_s(G − C) like all_st_cuts.

Both enumerations are inherently sequential output-listing algorithms
(the reference's recursion carries a marked stack through the whole
tree), so they run driver-side over the collected network, guarded by
``max_edges``/``max_cuts`` like the rest of the flow family
(operators/flow.py). The collected data is the edge list; results
return as DataFrames keyed by cut id for further relational use.
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.flow import _collect_network


def _reaches_within(radj, t, allowed):
    """Vertices that reach t by a path inside ``allowed`` (t included)."""
    if t not in allowed:
        return set()
    seen = {t}
    q = deque([t])
    while q:
        v = q.popleft()
        for u in radj[v]:
            if u in allowed and u not in seen:
                seen.add(u)
                q.append(u)
    return seen


def _forward_reach(adj, roots, blocked_edges=None):
    seen = set(roots)
    q = deque(roots)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if blocked_edges is not None and (u, v) in blocked_edges:
                continue
            if v not in seen:
                seen.add(v)
                q.append(v)
    return seen


def all_st_cuts(
    graph: LinkGraph,
    source: int,
    target: int,
    max_edges: int = 100_000,
    max_cuts: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """All minimal (s,t) edge cuts → (partitions, cuts) DataFrames:
    partitions = (cut_id, id) source-side vertex sets, cuts =
    (cut_id, src, dst) crossing edges. igraph_all_st_cuts
    (/root/reference/src/st-cuts.c:976)."""
    if not graph.directed:
        raise ValueError("listing all s-t cuts requires a directed graph")
    source, target = int(source), int(target)
    if source == target:
        raise ValueError("source and target must differ")

    rows = graph.edges.select("src", "dst").filter("src != dst").distinct()
    m = rows.count()
    if m > max_edges:
        raise ValueError(
            f"all_st_cuts is a sequential listing algorithm; refusing "
            f"|E|={m} > {max_edges}"
        )
    edges = [(int(r["src"]), int(r["dst"])) for r in rows.collect()]
    # the full vertex set matters: an isolated vertex cannot reach t,
    # so rule (a) forces it to the source side (like the reference)
    verts = {int(r["id"]) for r in graph.vertices().collect()}
    verts.add(source)
    verts.add(target)
    adj = defaultdict(set)
    radj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        radj[v].add(u)
    allv = frozenset(verts)

    results: list[tuple[frozenset, frozenset]] = []

    def close(inn: set, out: set):
        """Apply rule (a): vertices that cannot reach t outside ``inn``
        must join ``inn``. Returns False on contradiction."""
        while True:
            allowed = allv - inn
            reach = _reaches_within(radj, target, allowed)
            move = allowed - reach
            if not move:
                return True
            if move & out or target in move:
                return False
            inn |= move

    def emit(inn: frozenset):
        cut = [(u, v) for u, v in edges if u in inn and v not in inn]
        cutset = frozenset(cut)
        # rule (b): every cut edge's tail reachable from s in G - cut
        tails = {u for u, _ in cut}
        reach_s = _forward_reach(adj, [source], blocked_edges=cutset)
        if tails <= reach_s:
            # the reference reports the SOURCE-REACHABLE canonical
            # partition Reach_s(G - C) (the Provan-Shier S set), not
            # the cannot-reach-t closure the recursion tracks; both
            # generate the same crossing edge set C
            results.append((frozenset(reach_s), cutset))
            if len(results) > max_cuts:
                raise ValueError(
                    f"all_st_cuts: more than {max_cuts} cuts; raise max_cuts"
                )

    order = sorted(verts - {source, target})
    stack = [({source}, {target}, order)]
    while stack:
        inn, out, free = stack.pop()
        if not close(inn, out):
            continue
        rest = [v for v in free if v not in inn and v not in out]
        if not rest:
            emit(frozenset(inn))
            continue
        v = rest[0]
        stack.append((set(inn) | {v}, out, rest[1:]))
        stack.append((set(inn), out | {v}, rest[1:]))

    results.sort(key=lambda pc: sorted(pc[0]))
    return _as_dataframes(graph.spark, results)


def _as_dataframes(spark, part_cut_pairs):
    prows, crows = [], []
    for cid, (X, C) in enumerate(part_cut_pairs):
        for v in sorted(X):
            prows.append((cid, int(v)))
        for u, v in sorted(C):
            crows.append((cid, int(u), int(v)))
    p = spark.createDataFrame(prows or [], "cut_id long, id long")
    c = spark.createDataFrame(crows or [], "cut_id long, src long, dst long")
    return p, c


def _ek_flow(cap, adj, s: int, t: int):
    """Edmonds–Karp returning (value, flow dict) — same augmenting
    scheme as flow.py's _ek_solve, kept separate because the cut
    enumeration needs the final flow, not just the cut."""
    flow: dict[tuple[int, int], float] = defaultdict(float)

    def residual(u, v):
        return cap[(u, v)] - flow[(u, v)]

    total = 0.0
    while True:
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
    return total, flow


def _tarjan_scc(verts, adj):
    """Iterative Tarjan → comp id per vertex (0..k-1)."""
    index = {}
    low = {}
    comp = {}
    stack = []
    onstack = set()
    counter = [0]
    ncomp = [0]
    for root in verts:
        if root in index:
            continue
        work = [(root, iter(sorted(adj[root])))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        onstack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    onstack.add(w)
                    work.append((w, iter(sorted(adj[w]))))
                    advanced = True
                    break
                elif w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp[w] = ncomp[0]
                    if w == v:
                        break
                ncomp[0] += 1
    return comp, ncomp[0]


def all_st_mincuts(
    graph: LinkGraph,
    source: int,
    target: int,
    capacity_col: str = "weight",
    max_edges: int = 5_000_000,
    max_cuts: int = 100_000,
) -> tuple[float, DataFrame, DataFrame]:
    """All minimum (s,t) cuts → (value, partitions, cuts) —
    igraph_all_st_mincuts (/root/reference/src/st-cuts.c:1290)."""
    if not graph.directed:
        raise ValueError("listing all s-t mincuts requires a directed graph")
    source, target = int(source), int(target)
    if source == target:
        raise ValueError("source and target must differ")

    cap, adj0 = _collect_network(graph, capacity_col, max_edges)
    value, out = min_cut_edge_sets(cap, adj0, source, target, max_cuts)
    p, c = _as_dataframes(graph.spark, out)
    return value, p, c


def min_cut_edge_sets(cap, adj0, source, target, max_cuts=100_000):
    """Core enumeration over a prepared (cap, adj) network → (value,
    [(partition frozenset, cut-edge frozenset)...]). Shared by
    all_st_mincuts and minimum_size_separators (operators/cohesive.py),
    which runs it on vertex-split networks."""
    value, flow = _ek_flow(cap, adj0, source, target)

    verts = set([source, target])
    for (u, v), c in cap.items():
        if c > 0:
            verts.add(u)
            verts.add(v)

    # residual digraph: forward where unsaturated, backward where flowed
    radj_f = defaultdict(set)
    for (u, v), c in cap.items():
        if c <= 0:
            continue
        if c - flow[(u, v)] > 1e-9:
            radj_f[u].add(v)
        if flow[(u, v)] > 1e-9:
            radj_f[v].add(u)

    comp, ncomp = _tarjan_scc(sorted(verts), radj_f)
    cadj = defaultdict(set)
    for u in verts:
        for v in radj_f[u]:
            if comp[u] != comp[v]:
                cadj[comp[u]].add(comp[v])
    s_comp, t_comp = comp[source], comp[target]
    active = set()
    for (u, v), c in cap.items():
        if c > 0 and flow[(u, v)] > 1e-9:
            active.add(comp[u])
            active.add(comp[v])
    active.discard(s_comp)
    active.discard(t_comp)

    # enumerate canonical closed sets: forward-residual closures of
    # {s_comp} ∪ A for A ⊆ active components, excluding t_comp
    base = frozenset(_forward_reach(cadj, [s_comp]))
    if t_comp in base:
        raise AssertionError("flow not maximal: t residual-reachable")
    found = {base}
    order = sorted(active)

    def rec(X: frozenset, i: int):
        if len(found) > max_cuts:
            raise ValueError(
                f"all_st_mincuts: more than {max_cuts} cuts; raise max_cuts"
            )
        for j in range(i, len(order)):
            a = order[j]
            if a in X:
                continue
            X2 = frozenset(X | _forward_reach(cadj, [a]))
            if t_comp in X2 or X2 in found:
                continue
            found.add(X2)
            rec(X2, j + 1)

    rec(base, 0)

    edges = sorted({(u, v) for (u, v), c in cap.items() if c > 0})
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    pairs = {}
    for X in found:
        vset = {v for v in verts if comp[v] in X}
        C = frozenset((u, v) for u, v in edges if u in vset and v not in vset)
        # canonical partition, like all_st_cuts: Reach_s(G - C)
        P = frozenset(_forward_reach(adj, [source], blocked_edges=C))
        pairs[C] = P
    out = sorted(((P, C) for C, P in pairs.items()), key=lambda pc: sorted(pc[0]))
    return value, out
