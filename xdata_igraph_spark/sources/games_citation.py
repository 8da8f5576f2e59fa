"""Citation / aging / trait random-graph games.

Reference: /root/reference/src/games.c — igraph_growing_random_game
(:1302), igraph_callaway_traits_game (:1385),
igraph_establishment_game (:1468), igraph_recent_degree_game (:1558),
igraph_barabasi_aging_game (:1716), igraph_recent_degree_aging_game
(:1872), igraph_preference_game (:2193),
igraph_asymmetric_preference_game (:2447), igraph_lastcit_game
(:3017), igraph_cited_type_game (:3151),
igraph_citing_cited_type_game (:3242), igraph_static_fitness_game
(:3507), igraph_correlated_game (:3889),
igraph_correlated_pair_game (:4107).

These are sequential growth processes in the reference (one vertex
per time step, attachment weights updated after each step), so they
are generated driver-side with a seeded numpy RNG at fixture scale —
the same documented approach as `barabasi` in sources/generators.py.
Step dynamics mirror the reference exactly: within one time step all
draws use the weights as they stood at the step's start (the
reference defers its psumtree updates to the end of the step), and
weight formulas are transcribed per function below. The RNG stream
differs from the C library's (MT19937 draws in different order), so
parity is distributional, not bitwise — pytest checks the structural
invariants and closed-form expectations each game guarantees.

The two preference (blockmodel) games and the correlated-G(n,p) pair
are NOT growth processes; they stay vectorized (one numpy pass over
the type-block probabilities / edge coins) and scale to fixture sizes
trivially; their natural 100-TB expression is the same hash-coin
blockwise GNP used by `sources/generators.py:gnp`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from xdata_igraph_spark.graph import LinkGraph

_MAX_NODES = 200_000


def _graph(spark: SparkSession, edges, n: int, directed: bool) -> LinkGraph:
    rows = [(int(a), int(b), 1.0) for a, b in edges]
    df = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    return LinkGraph(df, directed=directed, n=n)


def _check_n(n: int):
    if n < 0:
        raise ValueError("invalid number of vertices")
    if n > _MAX_NODES:
        raise ValueError(
            f"citation games are sequential growth processes (fixture "
            f"generators); refusing n={n} > {_MAX_NODES}"
        )


def _types_from_dist(rng, n, type_dist):
    d = np.asarray(type_dist, dtype=float)
    return rng.choice(len(d), size=n, p=d / d.sum())


def growing_random_game(
    spark, n: int, m: int, directed: bool = True,
    citation: bool = False, seed: int = 42,
) -> LinkGraph:
    """games.c:1302 — per step add one vertex + m edges; citation mode
    sources every edge at the newest vertex."""
    _check_n(n)
    if m < 0:
        raise ValueError("invalid number of edges per step")
    rng = np.random.default_rng(seed)
    edges = []
    for i in range(1, n):
        for _ in range(m):
            if citation:
                edges.append((i, int(rng.integers(0, i))))
            else:
                edges.append(
                    (int(rng.integers(0, i + 1)), int(rng.integers(1, i + 1)))
                )
    return _graph(spark, edges, n, directed)


def callaway_traits_game(
    spark, nodes: int, types: int, edges_per_step: int,
    type_dist, pref_matrix, directed: bool = False, seed: int = 42,
) -> tuple[LinkGraph, np.ndarray]:
    """games.c:1385 — each step: uniformly pick two existing vertices,
    connect with probability pref[type1][type2]. Returns (graph,
    node_types)."""
    _check_n(nodes)
    rng = np.random.default_rng(seed)
    pref = np.asarray(pref_matrix, dtype=float)
    t = _types_from_dist(rng, nodes, type_dist)
    edges = []
    for i in range(1, nodes):
        for _ in range(edges_per_step):
            n1 = int(rng.integers(0, i + 1))
            n2 = int(rng.integers(0, i + 1))
            if rng.random() < pref[t[n1], t[n2]]:
                edges.append((n1, n2))
    return _graph(spark, edges, nodes, directed), t


def establishment_game(
    spark, nodes: int, types: int, k: int,
    type_dist, pref_matrix, directed: bool = False, seed: int = 42,
) -> tuple[LinkGraph, np.ndarray]:
    """games.c:1468 — each new vertex tries k distinct earlier
    vertices, connecting with probability pref[type_new][type_old]."""
    _check_n(nodes)
    rng = np.random.default_rng(seed)
    pref = np.asarray(pref_matrix, dtype=float)
    t = _types_from_dist(rng, nodes, type_dist)
    edges = []
    for i in range(k, nodes):
        pot = rng.choice(i, size=k, replace=False)
        for v in pot:
            if rng.random() < pref[t[i], t[v]]:
                edges.append((i, int(v)))
    return _graph(spark, edges, nodes, directed), t


def _growth_attachment(rng, n, m_of, weight_fn, post_step=None):
    """Shared growth loop: step i draws m_of(i) targets from existing
    vertices with the step-start weights (the reference's deferred
    psumtree update), then lets weight_fn see the updated state."""
    edges = []
    for i in range(1, n):
        m = m_of(i)
        w = weight_fn(i)
        tot = w.sum()
        if tot <= 0:
            raise ValueError(
                "attachment weights sum to zero — raise zero_appeal"
            )
        p = w / tot
        targets = rng.choice(i, size=m, replace=True, p=p)
        for to in targets:
            edges.append((i, int(to)))
        if post_step is not None:
            post_step(i, targets)
    return edges


def recent_degree_game(
    spark, n: int, power: float, window: int, m: int = 1,
    outseq=None, outpref: bool = False, zero_appeal: float = 1.0,
    directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:1558 — attachment ∝ (edges gained in the last `window`
    steps)^power + zero_appeal."""
    _check_n(n)
    rng = np.random.default_rng(seed)
    recent = np.zeros(n)
    gained: list[list[int]] = [[] for _ in range(n)]  # per step

    def m_of(i):
        return int(outseq[i]) if outseq is not None else m

    def weight_fn(i):
        if i - 1 - window >= 0:
            for v in gained[i - 1 - window]:
                recent[v] -= 1
            gained[i - 1 - window] = []
        return np.power(recent[:i], power) + zero_appeal

    def post_step(i, targets):
        for to in targets:
            recent[to] += 1
            gained[i - 1].append(int(to))
        if outpref:
            recent[i] += len(targets)
            gained[i - 1].extend([i] * len(targets))

    edges = _growth_attachment(rng, n, m_of, weight_fn, post_step)
    return _graph(spark, edges, n, directed)


def barabasi_aging_game(
    spark, nodes: int, m: int = 1, outseq=None, outpref: bool = False,
    pa_exp: float = 1.0, aging_exp: float = -1.0, aging_bin: int = 1,
    zero_deg_appeal: float = 1.0, zero_age_appeal: float = 0.0,
    deg_coef: float = 1.0, age_coef: float = 1.0,
    directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:1716 — attachment ∝ (deg_coef·deg^pa_exp +
    zero_deg_appeal)·(age_coef·(age+1)^aging_exp + zero_age_appeal),
    age = (i − v) // (nodes // aging_bin + 1)."""
    _check_n(nodes)
    if aging_bin <= 0:
        raise ValueError("invalid aging bin")
    rng = np.random.default_rng(seed)
    binwidth = nodes // aging_bin + 1
    deg = np.zeros(nodes)

    def m_of(i):
        return int(outseq[i]) if outseq is not None else m

    def weight_fn(i):
        ids = np.arange(i)
        age = (i - 1 - ids) // binwidth  # age as of the step start
        return (deg_coef * np.power(deg[:i], pa_exp) + zero_deg_appeal) * (
            age_coef * np.power(age + 1.0, aging_exp) + zero_age_appeal
        )

    def post_step(i, targets):
        for to in targets:
            deg[to] += 1
        if outpref:
            deg[i] += len(targets)

    edges = _growth_attachment(rng, nodes, m_of, weight_fn, post_step)
    return _graph(spark, edges, nodes, directed)


def recent_degree_aging_game(
    spark, nodes: int, m: int = 1, outseq=None, outpref: bool = False,
    pa_exp: float = 1.0, aging_exp: float = -1.0, aging_bin: int = 1,
    time_window: int = 10, zero_appeal: float = 1.0,
    directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:1872 — attachment ∝ (recent_deg^pa_exp + zero_appeal)
    · (age+1)^aging_exp, recent over the last time_window steps."""
    _check_n(nodes)
    if aging_bin <= 0:
        raise ValueError("invalid aging bin")
    rng = np.random.default_rng(seed)
    binwidth = nodes // aging_bin + 1
    recent = np.zeros(nodes)
    gained: list[list[int]] = [[] for _ in range(nodes)]

    def m_of(i):
        return int(outseq[i]) if outseq is not None else m

    def weight_fn(i):
        if i - 1 - time_window >= 0:
            for v in gained[i - 1 - time_window]:
                recent[v] -= 1
            gained[i - 1 - time_window] = []
        ids = np.arange(i)
        age = (i - 1 - ids) // binwidth
        return (np.power(recent[:i], pa_exp) + zero_appeal) * np.power(
            age + 1.0, aging_exp
        )

    def post_step(i, targets):
        for to in targets:
            recent[to] += 1
            gained[i - 1].append(int(to))
        if outpref:
            recent[i] += len(targets)
            gained[i - 1].extend([i] * len(targets))

    edges = _growth_attachment(rng, nodes, m_of, weight_fn, post_step)
    return _graph(spark, edges, nodes, directed)


def lastcit_game(
    spark, nodes: int, edges_per_node: int, pagebins: int,
    preference, directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:3017 — citation attractiveness by age of LAST citation:
    weight(v) = preference[(i − last_cited_step(v)) // binwidth]
    (clamped to the last aging bin), never-cited vertices use
    preference[pagebins] (the final entry, required positive)."""
    _check_n(nodes)
    pref = np.asarray(preference, dtype=float)
    if len(pref) != pagebins + 1:
        raise ValueError("preference vector must have pagebins + 1 entries")
    if pagebins <= 1:
        raise ValueError("at least two age bins are needed")
    if pref[pagebins] <= 0:
        raise ValueError("last preference entry must be positive")
    rng = np.random.default_rng(seed)
    binwidth = nodes // pagebins + 1
    lastcit = np.full(nodes, -1)
    edges = []
    for i in range(1, nodes):
        ids = np.arange(i)
        never = lastcit[:i] < 0
        binidx = np.minimum((i - 1 - lastcit[:i]) // binwidth, pagebins - 1)
        w = np.where(never, pref[pagebins], pref[binidx])
        if w.sum() <= 0:
            raise ValueError("citation weights sum to zero")
        p = w / w.sum()
        targets = rng.choice(i, size=edges_per_node, replace=True, p=p)
        for to in targets:
            edges.append((i, int(to)))
            lastcit[to] = i
    return _graph(spark, edges, nodes, directed)


def cited_type_game(
    spark, nodes: int, types, pref, edges_per_step: int = 1,
    directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:3151 — citation weight of a vertex is pref[type[v]]."""
    _check_n(nodes)
    t = np.asarray(types, dtype=int)
    pr = np.asarray(pref, dtype=float)
    rng = np.random.default_rng(seed)
    edges = []
    for i in range(1, nodes):
        w = pr[t[:i]]
        if w.sum() <= 0:
            raise ValueError("citation weights sum to zero")
        p = w / w.sum()
        targets = rng.choice(i, size=edges_per_step, replace=True, p=p)
        edges.extend((i, int(to)) for to in targets)
    return _graph(spark, edges, nodes, directed)


def citing_cited_type_game(
    spark, nodes: int, types, pref, edges_per_step: int = 1,
    directed: bool = True, seed: int = 42,
) -> LinkGraph:
    """games.c:3242 — like cited_type_game but the weight depends on
    the CITING vertex's type too: pref[type[i]][type[v]]."""
    _check_n(nodes)
    t = np.asarray(types, dtype=int)
    pr = np.asarray(pref, dtype=float)
    rng = np.random.default_rng(seed)
    edges = []
    for i in range(1, nodes):
        w = pr[t[i], t[:i]]
        if w.sum() <= 0:
            raise ValueError("citation weights sum to zero")
        p = w / w.sum()
        targets = rng.choice(i, size=edges_per_step, replace=True, p=p)
        edges.extend((i, int(to)) for to in targets)
    return _graph(spark, edges, nodes, directed)


def preference_game(
    spark, nodes: int, types: int, type_dist=None,
    fixed_sizes: bool = False, pref_matrix=None,
    directed: bool = False, loops: bool = False, seed: int = 42,
) -> tuple[LinkGraph, np.ndarray]:
    """games.c:2193 — blockmodel G(n,p): vertices get types (sampled
    from type_dist, or fixed counts when fixed_sizes), every (ordered)
    pair connects independently with pref_matrix[t_u][t_v]."""
    _check_n(nodes)
    pref = np.asarray(pref_matrix, dtype=float)
    rng = np.random.default_rng(seed)
    if fixed_sizes:
        counts = (
            [int(x) for x in type_dist]
            if type_dist is not None
            else None
        )
        if counts is not None:
            if sum(counts) != nodes:
                raise ValueError("group sizes must sum to the vertex count")
            t = np.repeat(np.arange(types), counts)
        else:
            per = -(-nodes // types)
            t = np.repeat(np.arange(types), per)[:nodes]
    else:
        d = (
            np.asarray(type_dist, dtype=float)
            if type_dist is not None
            else np.ones(types)
        )
        t = rng.choice(types, size=nodes, p=d / d.sum())
    ij = np.arange(nodes)
    A, B = np.meshgrid(ij, ij, indexing="ij")
    mask = A != B if not loops else np.ones((nodes, nodes), bool)
    if not directed:
        mask &= A <= B if loops else A < B
    probs = pref[t[A], t[B]]
    coins = rng.random((nodes, nodes))
    keep = mask & (coins < probs)
    us, vs = np.nonzero(keep)
    return _graph(spark, zip(us, vs), nodes, directed), t


def asymmetric_preference_game(
    spark, nodes: int, types: int, type_dist_matrix=None,
    pref_matrix=None, loops: bool = False, seed: int = 42,
) -> tuple[LinkGraph, np.ndarray, np.ndarray]:
    """games.c:2447 — directed blockmodel with separate in/out types:
    each vertex draws an (in_type, out_type) pair from the joint
    type_dist_matrix[in][out]; arc u→v appears with probability
    pref_matrix[out_type(u)][in_type(v)]. Returns (graph, in_types,
    out_types)."""
    _check_n(nodes)
    pref = np.asarray(pref_matrix, dtype=float)
    rng = np.random.default_rng(seed)
    d = (
        np.asarray(type_dist_matrix, dtype=float)
        if type_dist_matrix is not None
        else np.ones((types, types))
    )
    flat = rng.choice(types * types, size=nodes, p=(d / d.sum()).ravel())
    t_in, t_out = flat // types, flat % types
    ij = np.arange(nodes)
    A, B = np.meshgrid(ij, ij, indexing="ij")
    mask = np.ones((nodes, nodes), bool) if loops else A != B
    probs = pref[t_out[A], t_in[B]]
    keep = mask & (rng.random((nodes, nodes)) < probs)
    us, vs = np.nonzero(keep)
    return _graph(spark, zip(us, vs), nodes, True), t_in, t_out


def static_fitness_game(
    spark, no_of_edges: int, fitness_out, fitness_in=None,
    loops: bool = False, multiple: bool = False, seed: int = 42,
) -> LinkGraph:
    """games.c:3507 — sample no_of_edges edges with P(u→v) ∝
    fitness_out[u]·fitness_in[v] (undirected when fitness_in is None:
    ∝ f[u]·f[v]); rejection keeps the graph simple unless
    multiple/loops allow otherwise."""
    fout = np.asarray(fitness_out, dtype=float)
    n = len(fout)
    _check_n(n)
    directed = fitness_in is not None
    fin = np.asarray(fitness_in, dtype=float) if directed else fout
    if (fout < 0).any() or (fin < 0).any():
        raise ValueError("fitness scores must be non-negative")
    rng = np.random.default_rng(seed)
    po = fout / fout.sum()
    pi = fin / fin.sum()
    edges = set() if not multiple else []
    out = []
    tries = 0
    max_tries = 100 * max(no_of_edges, 1) + 1000
    while len(out) < no_of_edges:
        tries += 1
        if tries > max_tries:
            raise ValueError(
                "static_fitness_game: rejection sampling stalled — too "
                "many edges requested for the fitness distribution"
            )
        u = int(rng.choice(n, p=po))
        v = int(rng.choice(n, p=pi))
        if u == v and not loops:
            continue
        key = (u, v) if directed else (min(u, v), max(u, v))
        if not multiple:
            if key in edges:
                continue
            edges.add(key)
        out.append(key)
    return _graph(spark, out, n, directed)


def correlated_game(
    graph: LinkGraph,
    corr: float,
    p: float,
    permutation=None,
    seed: int = 42,
) -> LinkGraph:
    """games.c:3889 — a G(n,p) sample correlated with an existing
    G(n,p) instance: existing edges survive with q = p + corr·(1−p),
    missing pairs appear with (1−q)·p/(1−p); optional vertex
    permutation applied to the result."""
    if not -1 <= corr <= 1:
        raise ValueError("correlation must be in [-1, 1]")
    if not 0 < p < 1:
        raise ValueError("edge probability must be in (0, 1)")
    spark = graph.spark
    n = graph.vcount()
    _check_n(n)
    directed = graph.directed
    old = {
        (int(r["src"]), int(r["dst"]))
        for r in graph.edges.select("src", "dst").collect()
        if r["src"] != r["dst"]
    }
    if not directed:
        old = {(min(a, b), max(a, b)) for a, b in old}
    rng = np.random.default_rng(seed)
    q = p + corr * (1 - p)
    p_add = (1 - q) * (p / (1 - p))
    new = set()
    for e in old:
        if rng.random() < q:
            new.add(e)
    pairs = (
        ((a, b) for a in range(n) for b in range(n) if a != b)
        if directed
        else ((a, b) for a in range(n) for b in range(a + 1, n))
    )
    for e in pairs:
        if e not in old and rng.random() < p_add:
            new.add(e)
    if permutation is not None:
        perm = list(permutation)
        new = {(perm[a], perm[b]) for a, b in new}
        if not directed:
            new = {(min(a, b), max(a, b)) for a, b in new}
    return _graph(spark, sorted(new), n, directed)


def correlated_pair_game(
    spark, n: int, corr: float, p: float,
    directed: bool = False, permutation=None, seed: int = 42,
) -> tuple[LinkGraph, LinkGraph]:
    """games.c:4107 — a correlated pair: G1 ~ G(n,p), G2 correlated
    with G1."""
    from xdata_igraph_spark.sources.generators import gnp

    g1 = gnp(spark, n, p, directed=directed, seed=seed)
    g2 = correlated_game(g1, corr, p, permutation=permutation, seed=seed + 1)
    return g1, g2
