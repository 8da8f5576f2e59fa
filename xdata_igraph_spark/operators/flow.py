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


def _collect_network(graph: LinkGraph, capacity_col: str, max_edges: int):
    """One guarded scan → (cap, adj) residual-network dicts, reusable
    across many s-t solves (the connectivity loops below run |V|-ish
    maxflows over the same network)."""
    m = graph.ecount()
    if m > max_edges:
        raise ValueError(
            f"maxflow is sequential by definition (push-relabel in the "
            f"reference); refusing |E|={m} > {max_edges}"
        )
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
    return cap, adj


def _ek_solve(cap, adj, s: int, t: int):
    """Edmonds–Karp on prepared (cap, adj) → (value, side1, cut)."""
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


def _edmonds_karp(
    graph: LinkGraph, source: int, target: int, capacity_col: str, max_edges: int
):
    cap, adj = _collect_network(graph, capacity_col, max_edges)
    return _ek_solve(cap, adj, int(source), int(target))


def mincut_value(
    graph: LinkGraph,
    capacity_col: str = "weight",
    max_edges: int = 5_000_000,
) -> float:
    """Global minimum cut value (igraph_mincut_value,
    /root/reference/src/flow.c:1568). Any global cut separates vertex
    v0 from SOME other vertex, so the minimum over maxflow(v0, t) for
    all t (both directions when directed — the reference does the same
    two sweeps) is the global minimum; the network is collected once
    and the |V|-1 (or 2|V|-2) solves run on it in memory.

    Returns inf for graphs with < 2 vertices (nothing to cut), 0 for
    disconnected inputs (via the flow itself)."""
    cap, adj = _collect_network(graph, capacity_col, max_edges)
    ids = sorted(
        {v for v, _ in cap} | {v for _, v in cap}
        | {r["id"] for r in graph.vertices().collect()}
    )
    if len(ids) < 2:
        return float("inf")
    v0 = ids[0]
    best = float("inf")
    for t in ids[1:]:
        best = min(best, _ek_solve(cap, adj, v0, t)[0])
        if graph.directed:
            best = min(best, _ek_solve(cap, adj, t, v0)[0])
        if best == 0.0:
            break
    return best


def edge_connectivity(
    graph: LinkGraph,
    max_edges: int = 5_000_000,
) -> int:
    """Edge connectivity λ (igraph_edge_connectivity,
    /root/reference/src/flow.c:2103): the global mincut with unit
    capacities — minimum number of edges whose removal disconnects the
    graph (strong-disconnects, when directed)."""
    unit = LinkGraph(
        graph.edges.select("src", "dst").withColumn("weight", F.lit(1.0)),
        directed=graph.directed,
        n=graph.vcount(),
    )
    val = mincut_value(unit, max_edges=max_edges)
    return 0 if val == float("inf") else int(round(val))


def gomory_hu_tree(
    graph: LinkGraph,
    capacity_col: str = "weight",
    max_edges: int = 5_000_000,
) -> DataFrame:
    """Gomory–Hu tree → (src, dst, weight) tree edges.

    igraph_gomory_hu_tree (/root/reference/src/flow.c:1868): a tree on
    the same vertex set whose minimum edge weight on the path between
    u and v equals the u-v minimum cut value in the input. Undirected
    only (the reference errors on directed input likewise).

    Gusfield's variant: n-1 maxflow solves on the ORIGINAL network (no
    contractions), updating tree parents by source-side membership.
    The network is collected once (guarded) and the solves run on it
    in memory, like :func:`mincut_value`.
    """
    if graph.directed:
        raise ValueError(
            "Gomory-Hu trees are defined for undirected graphs "
            "(igraph_gomory_hu_tree errors likewise)"
        )
    spark = graph.spark
    cap, adj = _collect_network(graph, capacity_col, max_edges)
    ids = sorted(
        {v for v, _ in cap} | {v for _, v in cap}
        | {r["id"] for r in graph.vertices().collect()}
    )
    if len(ids) < 2:
        return spark.createDataFrame([], "src long, dst long, weight double")
    parent = {v: ids[0] for v in ids[1:]}
    flow_to_parent: dict[int, float] = {}
    for i, s in enumerate(ids[1:], start=1):
        t = parent[s]
        val, side1, _ = _ek_solve(cap, adj, s, t)
        flow_to_parent[s] = val
        for v in ids[i + 1:]:
            if v in side1 and parent[v] == t:
                parent[v] = s
    rows = [(int(s), int(parent[s]), float(flow_to_parent[s])) for s in ids[1:]]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def vertex_connectivity(
    graph: LinkGraph,
    max_edges: int = 1_000_000,
    max_vertices: int = 300,
) -> int:
    """Vertex connectivity κ (igraph_vertex_connectivity,
    /root/reference/src/flow.c:2014): minimum number of vertices whose
    removal disconnects the graph; n-1 for complete graphs (no vertex
    cut exists — the reference's convention).

    Computed on the standard vertex-split network (v → v_in, v_out
    with a unit arc) by minimizing unit maxflow over NON-ADJACENT
    pairs. Brute-force over pairs (the reference's Even–Tarjan pivots
    are a constant-factor refinement) — driver-side and additionally
    guarded by ``max_vertices``."""
    n = graph.vcount()
    if n > max_vertices:
        raise ValueError(
            f"vertex_connectivity enumerates vertex pairs driver-side; "
            f"refusing |V|={n} > {max_vertices}"
        )
    if n < 2:
        return 0
    arcs = {
        (int(r["src"]), int(r["dst"]))
        for r in graph.edges.select("src", "dst").collect()
        if r["src"] != r["dst"]
    }
    if graph.ecount() > max_edges:
        raise ValueError(f"refusing |E| > {max_edges}")
    if not graph.directed:
        arcs |= {(v, u) for u, v in arcs}
    ids = sorted({r["id"] for r in graph.vertices().collect()})
    # split network: v_in = 2v, v_out = 2v+1; v_in→v_out cap 1,
    # arc (u,v) becomes u_out→v_in cap inf
    INF = float(len(ids) + 1)
    cap: dict[tuple[int, int], float] = defaultdict(float)
    adj: dict[int, set[int]] = defaultdict(set)

    def add(u, v, c):
        cap[(u, v)] += c
        adj[u].add(v)
        adj[v].add(u)

    for v in ids:
        add(2 * v, 2 * v + 1, 1.0)
    for u, v in arcs:
        add(2 * u + 1, 2 * v, INF)
    best = None
    for s in ids:
        for t in ids:
            if s == t or (s, t) in arcs:
                continue
            val = _ek_solve(cap, adj, 2 * s + 1, 2 * t)[0]
            best = val if best is None else min(best, val)
            if best == 0.0:
                return 0
    if best is None:
        return n - 1  # complete graph: every pair adjacent
    return int(round(best))


def edge_disjoint_paths(
    graph: LinkGraph,
    source: int,
    target: int,
    max_edges: int = 5_000_000,
) -> int:
    """Maximum number of pairwise edge-disjoint s→t paths
    (igraph_edge_disjoint_paths, /root/reference/src/flow.c:2177):
    by Menger's theorem, the unit-capacity maximum flow — each edge
    row contributes capacity 1, so multi-edges count separately,
    exactly like the reference's NULL-capacity maxflow."""
    if source == target:
        raise ValueError("source == target is not defined (reference errors)")
    unit = LinkGraph(
        graph.edges.select("src", "dst").withColumn("weight", F.lit(1.0)),
        directed=graph.directed,
        n=graph._n,
    )
    return int(round(maxflow_value(unit, source, target, max_edges=max_edges)))


def st_edge_connectivity(
    graph: LinkGraph,
    source: int,
    target: int,
    max_edges: int = 5_000_000,
) -> int:
    """igraph_st_edge_connectivity (/root/reference/src/flow.c:2086) —
    identical to :func:`edge_disjoint_paths` by Menger."""
    return edge_disjoint_paths(graph, source, target, max_edges=max_edges)


def _split_solve(
    graph: LinkGraph,
    source: int,
    target: int,
    max_edges: int,
    drop_st_arc: bool,
) -> float:
    """Unit vertex-capacity s-t flow on the standard vertex-split
    network (v → v_in=2v, v_out=2v+1; internal unit arc; graph arc
    (u,v) → u_out→v_in with infinite capacity). Source side enters at
    s_out, sink at t_in, so the endpoints' own capacities don't bind."""
    if graph.ecount() > max_edges:
        raise ValueError(f"refusing |E| > {max_edges}")
    arcs = {
        (int(r["src"]), int(r["dst"]))
        for r in graph.edges.select("src", "dst").collect()
        if r["src"] != r["dst"]
    }
    if not graph.directed:
        arcs |= {(v, u) for u, v in arcs}
    if drop_st_arc:
        arcs.discard((source, target))
        if not graph.directed:
            arcs.discard((target, source))
    ids = sorted({r["id"] for r in graph.vertices().collect()})
    INF = float(len(ids) + 1)
    cap: dict[tuple[int, int], float] = defaultdict(float)
    adj: dict[int, set[int]] = defaultdict(set)

    def add(u, v, c):
        cap[(u, v)] += c
        adj[u].add(v)
        adj[v].add(u)

    for v in ids:
        add(2 * v, 2 * v + 1, 1.0)
    for u, v in arcs:
        add(2 * u + 1, 2 * v, INF)
    return _ek_solve(cap, adj, 2 * source + 1, 2 * target)[0]


def st_vertex_connectivity(
    graph: LinkGraph,
    source: int,
    target: int,
    neighbors: str = "error",
    max_edges: int = 1_000_000,
) -> int:
    """Minimum vertex cut separating s from t
    (igraph_st_vertex_connectivity, /root/reference/src/flow.c:1900).
    ``neighbors`` handles adjacent endpoints like the reference's
    IGRAPH_VCONN_NEI_* switch: "error" raises, "infinity" returns a
    large value (no cut exists), "ignore" computes on the remaining
    arcs."""
    if source == target:
        raise ValueError("source == target is not defined (reference errors)")
    if neighbors not in ("error", "infinity", "ignore"):
        raise ValueError(f"bad neighbors mode {neighbors!r}")
    adjacent = graph.are_connected(source, target)
    if adjacent and neighbors == "error":
        raise ValueError("source and target are adjacent — no vertex cut")
    if adjacent and neighbors == "infinity":
        return 2**31 - 1
    return int(round(_split_solve(graph, source, target, max_edges, adjacent)))


def vertex_disjoint_paths(
    graph: LinkGraph,
    source: int,
    target: int,
    max_edges: int = 1_000_000,
) -> int:
    """Maximum number of internally vertex-disjoint s→t paths
    (igraph_vertex_disjoint_paths, /root/reference/src/flow.c:2218):
    s-t vertex connectivity with direct s-t edges removed, plus one if
    any such edge existed (the reference adds exactly 1 regardless of
    multiplicity)."""
    if source == target:
        raise ValueError("source == target is not defined (reference errors)")
    adjacent = graph.are_connected(source, target)
    base = int(round(_split_solve(graph, source, target, max_edges, adjacent)))
    return base + (1 if adjacent else 0)


def adhesion(graph: LinkGraph, max_edges: int = 5_000_000) -> int:
    """igraph_adhesion (/root/reference/src/flow.c:2311) — synonym of
    :func:`edge_connectivity`."""
    return edge_connectivity(graph, max_edges=max_edges)


def cohesion(graph: LinkGraph, max_edges: int = 1_000_000) -> int:
    """igraph_cohesion (/root/reference/src/flow.c:2344) — synonym of
    :func:`vertex_connectivity`."""
    return vertex_connectivity(graph, max_edges=max_edges)


def dominator_tree(
    graph: LinkGraph,
    root: int,
    mode: str = "out",
    max_edges: int = 5_000_000,
) -> tuple[DataFrame, DataFrame]:
    """(dom, leftout) — immediate dominators of every vertex reachable
    from ``root`` (igraph_dominator_tree,
    /root/reference/src/st-cuts.c:388): v = idom(w) iff v dominates w
    and every other dominator of w dominates v; the (idom(w), w) arcs
    form the dominator tree.

    ``dom`` is (id, idom) with idom = -1 for the root (the reference's
    convention); ``leftout`` is (id) — vertices unreachable from the
    root, excluded from ``dom`` (the reference stores NaN for them).
    ``mode='in'`` reverses every arc first (st-cuts.c's IGRAPH_IN).

    The reference runs sequential Lengauer–Tarjan; dominators are an
    inherently ordered DFS computation, so like :func:`maxflow_value`
    this solves driver-side over one guarded edge scan — here with the
    Cooper–Harvey–Kennedy iterative algorithm over reverse postorder
    (same O(E·d) behavior on reducible flowgraphs, simpler state). The
    scan and the returned tables stay distributed."""
    if mode not in ("out", "in"):
        raise ValueError(f"mode must be 'out' or 'in' (got {mode!r})")
    m = graph.ecount()
    if m > max_edges:
        raise ValueError(
            f"dominator_tree is sequential by definition (Lengauer–Tarjan "
            f"in the reference); refusing |E|={m} > {max_edges}"
        )
    rows = graph.edges.select("src", "dst").collect()
    succ: dict[int, list[int]] = defaultdict(list)
    pred: dict[int, list[int]] = defaultdict(list)
    for r in rows:
        u, v = int(r["src"]), int(r["dst"])
        if mode == "in":
            u, v = v, u
        succ[u].append(v)
        pred[v].append(u)
        if not graph.directed:
            succ[v].append(u)
            pred[u].append(v)
    root = int(root)

    # iterative DFS postorder from root
    post: list[int] = []
    state: dict[int, int] = {root: 0}
    stack: list[int] = [root]
    while stack:
        u = stack[-1]
        kids = succ.get(u, [])
        i = state[u]
        while i < len(kids) and kids[i] in state:
            i += 1
        state[u] = i + 1
        if i < len(kids):
            w = kids[i]
            state[w] = 0
            stack.append(w)
        else:
            stack.pop()
            post.append(u)
    number = {v: i for i, v in enumerate(post)}  # postorder index
    rpo = list(reversed(post))

    idom: dict[int, int] = {root: root}

    def intersect(a: int, b: int) -> int:
        while a != b:
            while number[a] < number[b]:
                a = idom[a]
            while number[b] < number[a]:
                b = idom[b]
        return a

    changed = True
    while changed:
        changed = False
        for w in rpo:
            if w == root:
                continue
            new = None
            for p in pred.get(w, []):
                if p in idom:
                    new = p if new is None else intersect(p, new)
            if new is not None and idom.get(w) != new:
                idom[w] = new
                changed = True

    spark = graph.spark
    dom_rows = sorted(
        (v, -1 if v == root else idom[v]) for v in idom
    )
    reached = set(idom)
    all_ids = [int(r["id"]) for r in graph.vertices().collect()]
    left = sorted(v for v in all_ids if v not in reached)
    dom = spark.createDataFrame(dom_rows, "id long, idom long")
    leftout = spark.createDataFrame([(v,) for v in left] or [], "id long")
    return dom, leftout
