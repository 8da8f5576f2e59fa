"""Shortest paths, traversal orders, and path-derived metrics.

Reference semantics:
- ``igraph_shortest_paths`` (/root/reference/src/
  structural_properties.c:406): per-source BFS hop counts; modes
  OUT/IN/ALL; unreachable = infinity.
- ``igraph_shortest_paths_dijkstra`` (:4134) / ``_bellman_ford``
  (:5122): weighted distances. The distributed-correct strategy for
  both is iterative relaxation (Bellman-Ford): each superstep relaxes
  every edge once — ``dist' = min(dist, min over in-edges (dist[u] +
  w))`` — converging in at most |V|-1 supersteps, O(diameter) in
  practice. Dijkstra's priority queue is inherently sequential; at
  nonnegative weights both compute identical distances.
- ``igraph_topological_sorting`` (:3216): repeated removal of
  zero-in-degree vertices (Kahn); ``igraph_is_dag`` (:3308) = the peel
  exhausts all vertices.
- ``igraph_diameter`` (:60) / ``igraph_average_path_length`` (:199) /
  ``igraph_eccentricity``: derived from all-pairs BFS — O(|V|·|E|)
  work; exposed here for test/sample scale with a ``sources`` cap, the
  same practical restriction the single-node reference has at web
  scale.

Scale notes: the frontier BFS shuffles only frontier-size message sets
per superstep against a once-shuffled cached edge table; multi-source
BFS batches all sources into one loop (state is (id, source, dist) —
the standard "landmark" scheme), so k sources cost one loop, not k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def _edges_for_mode(graph: LinkGraph, mode: str) -> DataFrame:
    e = graph.edges.select("src", "dst", "weight")
    if not graph.directed or mode == "all":
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        ).distinct()
    elif mode == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    elif mode != "out":
        raise ValueError(f"bad mode {mode!r}")
    return e.repartition("src").localCheckpointFlat(eager=True)


def shortest_paths(
    graph: LinkGraph,
    sources: list[int] | DataFrame | None = None,
    mode: str = "out",
    weighted: bool = False,
    max_iter: int = 200,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Multi-source shortest paths → (source, id, dist).

    Unweighted: BFS hop counts (igraph_shortest_paths). Weighted:
    Bellman-Ford relaxation over ``weight`` (equals Dijkstra's result
    for nonnegative weights). Unreachable pairs are absent from the
    output (the reference returns IGRAPH_INFINITY; a left join against
    the vertex table reintroduces them if needed).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "sssp")
    edges = _edges_for_mode(graph, mode)
    if weighted:
        neg = edges.filter(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError(
                "negative weights unsupported (igraph_shortest_paths_dijkstra "
                "errors likewise; Bellman-Ford cycles unbounded)"
            )
    else:
        edges = edges.withColumn("weight", F.lit(1.0))

    if sources is None:
        src_df = graph.vertices().select(F.col("id").alias("source"))
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame(
            [(int(s),) for s in sources], "source long"
        )

    # state rows exist only for reached (source, id) pairs
    state = src_df.select(
        "source", F.col("source").alias("id"), F.lit(0.0).alias("dist")
    ).repartition("id").localCheckpointFlat(eager=True)

    for it in range(max_iter):
        relaxed = (
            state.select("source", F.col("id").alias("src"), "dist")
            .join(edges, "src")
            .groupBy("source", "dst")
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        new_state = (
            state.withColumnRenamed("dist", "_old")
            .join(relaxed, ["source", "id"], "full")
            .select(
                "source",
                "id",
                F.least(
                    F.coalesce("_old", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                "_old",
            )
        )
        new_state = runner.materialize(new_state, it)
        changed = new_state.filter(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        ).count()
        runner.finish_iteration(it, float(changed))
        state = new_state.drop("_old")
        if changed == 0:
            break
    else:
        # mirrors igraph's convergence-failure error: Bellman-Ford can
        # legitimately need |V|-1 rounds; silently returning non-minimal
        # distances would be wrong (ADVICE r1)
        import warnings

        warnings.warn(
            f"shortest_paths did not converge within max_iter={max_iter} "
            f"supersteps ({changed} distances still improving); distances "
            "may be non-minimal — raise max_iter",
            RuntimeWarning,
        )

    return state.select("source", "id", "dist")


def johnson_all_pairs(
    graph: LinkGraph,
    sources: list[int] | DataFrame | None = None,
    max_iter: int = 200,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """All-pairs shortest paths with negative weights → (source, id, dist).

    igraph_shortest_paths_johnson (/root/reference/src/
    structural_properties.c:5289): negative edge weights are allowed as
    long as no negative cycle exists. Directed graphs only — an
    undirected negative edge IS a negative cycle (u-v-u), the same
    precondition the reference enforces.

    Plan: one vertex-keyed Bellman-Ford from a virtual source (state is
    |V| potentials h, all starting at 0 — NOT per-source state) detects
    negative cycles and yields the reweighting w' = w + h(u) - h(v) >= 0;
    the per-source relaxation then runs on the nonnegative arcs via
    :func:`shortest_paths` and distances are unshifted with
    d(u,v) = d'(u,v) - h(u) + h(v). The expensive per-source stage sees
    only nonnegative weights, so its frontier shrinks monotonically —
    the whole point of Johnson's reweighting at scale.
    """
    spark = graph.spark
    arcs = graph.edges.select("src", "dst", F.col("weight").cast("double"))
    if not graph.directed:
        neg = arcs.filter(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError(
                "negative weight on an undirected edge is a negative "
                "cycle (igraph_shortest_paths_johnson errors likewise)"
            )
        return shortest_paths(
            graph, sources, mode="all", weighted=True,
            max_iter=max_iter, runner=runner,
        )

    n = graph.vcount()
    arcs = arcs.repartition("src").localCheckpointFlat(eager=True)
    # potentials: h(v) = min(0, min over in-arcs (h(u) + w)) — the
    # Bellman-Ford of a virtual source with 0-weight arcs to every vertex
    h = graph.vertices().select("id", F.lit(0.0).alias("h"))
    h = h.repartition("id").localCheckpointFlat(eager=True)
    pot_runner = SuperstepRunner(spark, "johnson_potentials")
    rounds = min(max_iter, n + 1)
    converged = False
    for it in range(rounds):
        relaxed = (
            h.select(F.col("id").alias("src"), "h")
            .join(arcs, "src")
            .groupBy("dst")
            .agg(F.min(F.col("h") + F.col("weight")).alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        new_h = (
            h.withColumnRenamed("h", "_old")
            .join(relaxed, "id", "left")
            .select(
                "id",
                F.least(F.col("_old"), F.coalesce("cand", F.col("_old"))).alias("h"),
                "_old",
            )
        )
        new_h = pot_runner.materialize(new_h, it)
        changed = new_h.filter(F.col("h") < F.col("_old")).count()
        pot_runner.finish_iteration(it, float(changed))
        h = new_h.drop("_old")
        if changed == 0:
            converged = True
            break
        if it >= n:
            # a potential still improving after |V| rounds can only be
            # walking a negative cycle (IGRAPH_ENEGLOOP)
            raise ValueError("negative cycle detected (igraph errors likewise)")
    if not converged:
        # max_iter cut the potential loop short (including max_iter=0,
        # which never enters the loop): reweighting with unconverged
        # potentials leaves genuinely negative arcs that the
        # w+h(u)-h(v) clamp would silently zero
        raise ValueError(
            f"Johnson potentials did not converge within max_iter="
            f"{max_iter} (< |V|+1={n + 1}); raise max_iter"
        )

    h_src = h.select(F.col("id").alias("src"), F.col("h").alias("_h_src"))
    h_dst = h.select(F.col("id").alias("dst"), F.col("h").alias("_h_dst"))
    reweighted = (
        arcs.join(h_src, "src")
        .join(h_dst, "dst")
        .select(
            "src", "dst",
            # clamp: w' is >= 0 up to float rounding on tight triangles
            F.greatest(
                F.col("weight") + F.col("_h_src") - F.col("_h_dst"), F.lit(0.0)
            ).alias("weight"),
        )
    )
    g2 = LinkGraph(reweighted, directed=True, n=n)
    d = shortest_paths(
        g2, sources, mode="out", weighted=True, max_iter=max_iter, runner=runner
    )
    return (
        d.join(h.select(F.col("id").alias("source"), F.col("h").alias("_h_src")),
               "source")
        .join(h.select("id", F.col("h").alias("_h_dst")), "id")
        .select(
            "source", "id",
            (F.col("dist") - F.col("_h_src") + F.col("_h_dst")).alias("dist"),
        )
    )


def distances_from(
    graph: LinkGraph, source: int, mode: str = "out", weighted: bool = False
) -> DataFrame:
    """Single-source convenience wrapper → (id, dist)."""
    return shortest_paths(graph, [source], mode=mode, weighted=weighted).select(
        "id", "dist"
    )


def average_path_length(
    graph: LinkGraph, directed: bool | None = None
) -> float:
    """igraph_average_path_length (/root/reference/src/
    structural_properties.c:199): mean finite pairwise distance,
    self-pairs excluded. All-pairs BFS — test/sample scale."""
    mode = "out" if (directed if directed is not None else graph.directed) else "all"
    d = shortest_paths(graph, None, mode=mode).filter(F.col("source") != F.col("id"))
    row = d.agg(F.avg("dist").alias("apl")).first()
    return float(row["apl"]) if row["apl"] is not None else float("nan")


def eccentricity(graph: LinkGraph, mode: str = "all") -> DataFrame:
    """Per-vertex eccentricity → (id, eccentricity): max finite
    distance from the vertex (igraph computes over reachable vertices
    only)."""
    d = shortest_paths(graph, None, mode=mode)
    return d.groupBy(F.col("source").alias("id")).agg(
        F.max("dist").alias("eccentricity")
    )


def diameter(graph: LinkGraph, directed: bool | None = None) -> float:
    """igraph_diameter (/root/reference/src/structural_properties.c:60):
    longest finite shortest path (unconnected pairs ignored)."""
    mode = "out" if (directed if directed is not None else graph.directed) else "all"
    d = shortest_paths(graph, None, mode=mode).filter(F.col("source") != F.col("id"))
    row = d.agg(F.max("dist")).first()
    return float(row[0]) if row[0] is not None else float("nan")


def radius(graph: LinkGraph, mode: str = "all") -> float:
    ecc = eccentricity(graph, mode=mode)
    row = ecc.agg(F.min("eccentricity")).first()
    return float(row[0]) if row[0] is not None else float("nan")


def topological_sorting(
    graph: LinkGraph, mode: str = "out", max_iter: int = 10_000
) -> DataFrame:
    """Kahn topological order → (id, layer, order)
    (igraph_topological_sorting, /root/reference/src/
    structural_properties.c:3216). ``layer`` is the peel round (all
    zero-in-degree vertices of round k); ``order`` is a deterministic
    valid topological total order (layer, then id). igraph's Kahn FIFO
    enqueues newly-freed vertices in edge-removal order, which can
    interleave layers differently — the layer partition is identical,
    the presentation order is a documented deviation (same contract as
    the LPA/SCC numbering). Raises on cycles like the reference errors
    on non-DAGs."""
    if mode not in ("out", "in"):
        raise ValueError("mode must be 'out' or 'in'")
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if mode == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    e = e.localCheckpointFlat(eager=True)
    remaining = graph.vertices().localCheckpointFlat(eager=True)
    layers: list[DataFrame] = []
    layer_no = 0
    while True:
        n_rem = remaining.count()
        if n_rem == 0:
            break
        with_in = e.select(F.col("dst").alias("id")).distinct()
        zero_in = remaining.join(with_in, "id", "left_anti").localCheckpointFlat(True)
        n_zero = zero_in.count()
        if n_zero == 0:
            raise ValueError("graph has a cycle; topological sort undefined "
                             "(igraph_is_dag false)")
        layers.append(zero_in.withColumn("layer", F.lit(layer_no).cast("long")))
        remaining = remaining.join(zero_in, "id", "left_anti").localCheckpointFlat(True)
        e = e.join(zero_in.withColumnRenamed("id", "src"), "src", "left_anti").localCheckpointFlat(True)
        layer_no += 1
        if layer_no > max_iter:  # pragma: no cover
            raise RuntimeError("topological sort did not terminate")
    if not layers:
        # empty graph: the reference returns an empty order
        return graph.spark.createDataFrame([], "id long, layer long, order long")
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df)
    # total order via range-partition + prefix offsets (plans/ids.py) —
    # never a single-partition window over all vertices
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    return zip_dense_ids(out, ["layer", "id"], out_col="order").select(
        "id", "layer", "order"
    )


def is_dag(graph: LinkGraph) -> bool:
    """igraph_is_dag (/root/reference/src/structural_properties.c:3308)."""
    try:
        topological_sorting(graph)
        return True
    except ValueError:
        return False


def shortest_paths_with_parents(
    graph: LinkGraph,
    sources: list[int] | DataFrame,
    mode: str = "out",
    weighted: bool = False,
    max_iter: int = 200,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Multi-source shortest paths with predecessor pointers →
    (source, id, dist, parent); parent is NULL at the source itself.

    Same relaxation loop as ``shortest_paths`` with the predecessor
    carried through the min-aggregate as a (dist, parent) struct —
    lexicographic struct ordering makes the tie-break deterministic
    (smallest predecessor id among equally-short ones; igraph returns
    one arbitrary shortest path, /root/reference/src/
    structural_properties.c:567 — documented deviation: ours is the
    canonical minimum-parent path).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "sssp_parents")
    edges = _edges_for_mode(graph, mode)
    if weighted:
        neg = edges.filter(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError("negative weights unsupported")
    else:
        edges = edges.withColumn("weight", F.lit(1.0))

    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "source long")

    state = src_df.select(
        "source",
        F.col("source").alias("id"),
        F.lit(0.0).alias("dist"),
        F.lit(None).cast("long").alias("parent"),
    ).repartition("id").localCheckpointFlat(eager=True)

    for it in range(max_iter):
        relaxed = (
            state.select("source", F.col("id").alias("src"), "dist")
            .join(edges, "src")
            .groupBy("source", "dst")
            .agg(
                F.min(
                    F.struct(
                        (F.col("dist") + F.col("weight")).alias("d"),
                        F.col("src").alias("p"),
                    )
                ).alias("cand")
            )
            .select(
                "source",
                F.col("dst").alias("id"),
                F.col("cand.d").alias("cand_d"),
                F.col("cand.p").alias("cand_p"),
            )
        )
        new_state = (
            state.withColumnRenamed("dist", "_old")
            .join(relaxed, ["source", "id"], "full")
            .select(
                "source",
                "id",
                F.when(
                    F.col("cand_d")
                    < F.coalesce("_old", F.lit(float("inf"))),
                    F.col("cand_d"),
                )
                .otherwise(F.col("_old"))
                .alias("dist"),
                F.when(
                    F.col("cand_d")
                    < F.coalesce("_old", F.lit(float("inf"))),
                    F.col("cand_p"),
                )
                .otherwise(F.col("parent"))
                .alias("parent"),
                "_old",
            )
        )
        new_state = runner.materialize(new_state, it)
        changed = new_state.filter(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        ).count()
        runner.finish_iteration(it, float(changed))
        state = new_state.drop("_old")
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"shortest_paths_with_parents hit max_iter={max_iter} before "
            "fixpoint; distances may be non-minimal",
            RuntimeWarning,
        )
    return state.select("source", "id", "dist", "parent")


def get_shortest_paths(
    graph: LinkGraph,
    source: int,
    to: list[int] | DataFrame | None = None,
    mode: str = "out",
    weighted: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """One shortest path per reachable target → (source, target, dist,
    path: array<long> source..target) (igraph_get_shortest_paths,
    /root/reference/src/structural_properties.c:567; example
    examples/simple/igraph_get_shortest_paths.c). Unreachable targets
    are absent (the reference returns an empty path).

    Backtrack is an iterative parent join: O(path length) supersteps,
    each a vertex-size equi-join — the path column itself is the only
    per-row growth, so memory is Σ path lengths (cap |targets|·diameter).
    """
    spark = graph.spark
    st = shortest_paths_with_parents(
        graph, [source], mode=mode, weighted=weighted, max_iter=max_iter
    )
    if to is not None:
        if isinstance(to, DataFrame):
            tgt = to.select(F.col(to.columns[0]).alias("id"))
        else:
            tgt = spark.createDataFrame([(int(t),) for t in to], "id long")
        st_t = st.join(tgt, "id", "left_semi")
    else:
        st_t = st
    # walk: (target, dist, cur, path); prepend parent(cur) until source
    parents = st.select("id", "parent").localCheckpointFlat(eager=True)
    walk = st_t.select(
        F.col("id").alias("target"),
        "dist",
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("path"),
    ).localCheckpointFlat(eager=True)
    done = walk.filter(F.col("cur") == F.lit(int(source)))
    active = walk.filter(F.col("cur") != F.lit(int(source)))
    for _ in range(max_iter):
        if active.isEmpty():
            break
        stepped = (
            active.join(parents.withColumnRenamed("id", "cur"), "cur")
            .select(
                "target",
                "dist",
                F.col("parent").alias("cur"),
                F.concat(F.array(F.col("parent")), F.col("path")).alias("path"),
            )
            .localCheckpointFlat(eager=True)
        )
        done = done.unionByName(
            stepped.filter(F.col("cur") == F.lit(int(source)))
        ).localCheckpointFlat(eager=True)
        active = stepped.filter(F.col("cur") != F.lit(int(source)))
    return done.select(
        F.lit(int(source)).alias("source"), "target", "dist", "path"
    )


def closeness(
    graph: LinkGraph,
    sources: list[int] | DataFrame | None = None,
    mode: str = "out",
    normalized: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """Closeness centrality → (id, closeness) (igraph_closeness,
    /root/reference/src/centrality.c:2418,2733-2740).

    Per source vertex: total = Σ dist(reachable) + n·(n − reached)
    (unreachable pairs charged n, "always longer than the longest
    geodesic"); closeness = (n−1)/total, divided by (n−1) again when
    ``normalized=False`` — exactly the reference's formula.

    One aggregate over the existing multi-source BFS; cost O(|sources|
    · supersteps), so cap ``sources`` at web scale (the reference's own
    API takes a vertex selector for the same reason).
    """
    n = graph.vcount()
    d = shortest_paths(graph, sources, mode=mode, max_iter=max_iter)
    agg = d.groupBy(F.col("source").alias("id")).agg(
        F.sum("dist").alias("sum_d"), F.count("*").alias("reached")
    )
    total = F.col("sum_d") + F.lit(float(n)) * (F.lit(n) - F.col("reached"))
    c = (F.lit(float(n - 1)) / total) if normalized else (F.lit(1.0) / total)
    return agg.select("id", c.alias("closeness"))


def path_length_hist(graph: LinkGraph, directed: bool | None = None) -> DataFrame:
    """Histogram of finite shortest-path lengths → (dist: double,
    npairs: long) (igraph_path_length_hist, /root/reference/src/
    structural_properties.c:293): directed graphs count ordered pairs,
    undirected unordered; self-pairs excluded. All-pairs BFS —
    test/sample scale like the reference's O(n·E)."""
    use_directed = directed if directed is not None else graph.directed
    mode = "out" if use_directed else "all"
    d = shortest_paths(graph, None, mode=mode).filter(F.col("source") != F.col("id"))
    if not use_directed:
        d = d.filter(F.col("source") < F.col("id"))
    return d.groupBy("dist").agg(F.count("*").alias("npairs"))


def girth(graph: LinkGraph, sources: list[int] | DataFrame | None = None) -> float:
    """Length of the shortest cycle (igraph_girth, /root/reference/src/
    structural_properties.c:3660); infinity for forests. Undirected
    semantics like the reference (direction ignored); self-loops and
    multi-edges are simplified away first (the reference requires a
    simple graph).

    Method: BFS from every root with parent pointers; every non-tree
    edge (u,v) — parent(u)≠v and parent(v)≠u — reached from root r
    closes a walk of length d(u)+d(v)+1 containing a cycle, and a root
    ON the shortest cycle attains equality, so the min over roots and
    non-tree edges is exact. ``sources`` restricts the roots for an
    upper-bound estimate at scale.
    """
    g = graph.to_undirected() if graph.directed else graph
    g = g.simplify(remove_loops=True, remove_multiple=True)
    st = shortest_paths_with_parents(g, sources if sources is not None else g.vertices(), mode="all")
    e = g.symmetrized().select("src", "dst").filter(F.col("src") != F.col("dst"))
    du = st.select("source", F.col("id").alias("src"), F.col("dist").alias("du"),
                   F.col("parent").alias("pu"))
    dv = st.select("source", F.col("id").alias("dst"), F.col("dist").alias("dv"),
                   F.col("parent").alias("pv"))
    cand = (
        e.join(du, "src")
        .join(dv, ["source", "dst"])
        .filter(
            (F.coalesce(F.col("pu"), F.lit(-1)) != F.col("dst"))
            & (F.coalesce(F.col("pv"), F.lit(-1)) != F.col("src"))
        )
        .select((F.col("du") + F.col("dv") + 1).alias("clen"))
    )
    row = cand.agg(F.min("clen")).first()
    return float(row[0]) if row[0] is not None else float("inf")


def bfs(graph: LinkGraph, root: int, mode: str = "out") -> DataFrame:
    """BFS from ``root`` → (id, dist, parent, order)
    (igraph_bfs, /root/reference/src/visitors.c:33): layers, parents,
    and a deterministic visit order — rank by (dist, id). igraph's
    queue emits same-layer vertices in adjacency-discovery order, which
    can interleave differently; the layer partition and parent tree are
    equivalent (same deviation contract as topological_sorting). The
    reference's callback visitor becomes the returned DataFrame —
    downstream transformations replace callbacks.
    """
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    st = shortest_paths_with_parents(graph, [int(root)], mode=mode)
    out = st.select("id", F.col("dist").cast("long").alias("dist"), "parent")
    return zip_dense_ids(out, ["dist", "id"], out_col="order")


def dfs(graph: LinkGraph, root: int, mode: str = "out",
        max_edges: int = 5_000_000) -> DataFrame:
    """DFS from ``root`` → (id, order, parent, dist)
    (igraph_dfs, /root/reference/src/visitors.c:349). Depth-first
    order is inherently sequential (the stack IS the result), so the
    traversal runs driver-side over a collected adjacency — exactly
    what the single-node reference does — guarded by ``max_edges``.
    Neighbors are visited in ascending id order (deterministic; the
    reference follows its adjacency-list order).
    """
    m = graph.ecount()
    if m > max_edges:
        raise ValueError(
            f"dfs is sequential by definition; refusing |E|={m} > "
            f"{max_edges} (raise max_edges explicitly if intended)"
        )
    adj_rows = (
        graph.adjacency(mode)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .collect()
    )
    from collections import defaultdict

    adj: dict[int, list[int]] = defaultdict(list)
    for r in adj_rows:
        adj[r["src"]].append(r["dst"])
    for k in adj:
        adj[k].sort(reverse=True)  # stack pops smallest first
    seen = {int(root)}
    rows = []
    stack: list[tuple[int, int | None, int]] = [(int(root), None, 0)]
    order = 0
    while stack:
        v, parent, dist = stack.pop()
        rows.append((v, order, parent, dist))
        order += 1
        for w in adj.get(v, []):
            if w not in seen:
                seen.add(w)
                stack.append((w, v, dist + 1))
    return graph.spark.createDataFrame(
        rows, "id long, order long, parent long, dist long"
    )


def unfold_tree(
    graph: LinkGraph,
    roots: list[int],
    mode: str = "out",
) -> tuple[DataFrame, DataFrame]:
    """Unfold a graph into a tree/forest by replicating re-reached
    vertices (igraph_unfold_tree, /root/reference/src/
    structural_properties.c:5456-5584): BFS from ``roots``; the first
    arc reaching a vertex stays a tree edge, every further arc replaces
    its already-seen endpoint with a fresh copy (ids n, n+1, …).

    Returns ``(tree_edges, vertex_index)``: tree edges keep the
    original arc orientation with the re-reached endpoint swapped for
    its copy; ``vertex_index`` maps every output vertex to the original
    (identity for 0..n-1 — the reference pre-fills identity the same
    way — plus one row per copy).

    Deviations (documented): copy ids are minted in the deterministic
    order (root-rank, source dist, source id, arc) rather than the
    reference's queue-emission order (same tree shape, relabeled
    copies); parallel arcs are collapsed (simple-graph fixtures);
    overlapping root regions follow plain multi-source BFS (the
    reference's own TODO at :5497 leaves multi-root semantics open).
    Unreached arcs are dropped rather than emitted as (0,0) rows.

    Scale shape: one BFS (superstep loop) + two joins + one dense-id
    minting pass — all edge-partitioned, no driver-side traversal.
    """
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    spark = graph.spark
    n = graph.vcount()
    root_rows = [(int(r), i) for i, r in enumerate(roots)]
    roots_df = spark.createDataFrame(root_rows, "source long, rootrank int")

    st = shortest_paths_with_parents(graph, [r for r, _ in root_rows], mode=mode)
    # claim each vertex for its best (rootrank, dist) root — matches the
    # reference exactly when roots claim disjoint regions
    claimed = (
        st.join(roots_df, "source")
        .groupBy("id")
        .agg(
            F.min(F.struct("rootrank", "dist", "parent")).alias("c")
        )
        .select(
            "id",
            F.col("c.rootrank").alias("rootrank"),
            F.col("c.dist").alias("dist"),
            F.col("c.parent").alias("parent"),
        )
        .localCheckpointFlat(eager=True)
    )

    use_all = mode == "all" or not graph.directed
    if mode == "in" and graph.directed:
        arcs = graph.edges.select(F.col("dst").alias("f"), F.col("src").alias("t"))
    else:
        arcs = graph.edges.select(F.col("src").alias("f"), F.col("dst").alias("t"))
    arcs = arcs.filter(F.col("f") != F.col("t")).distinct()

    fm = claimed.select(
        F.col("id").alias("f"), F.col("rootrank").alias("rk_f"),
        F.col("dist").alias("d_f"),
    )
    tm = claimed.select(
        F.col("id").alias("t"), F.col("rootrank").alias("rk_t"),
        F.col("dist").alias("d_t"), F.col("parent").alias("p_t"),
    )
    e = arcs.join(fm, "f").join(tm, "t")  # drops arcs with unreached ends
    if use_all:
        # traversal source = endpoint dequeued first: min (rootrank, dist, id)
        f_first = F.struct("rk_f", "d_f", "f") < F.struct("rk_t", "d_t", "t")
        pm = claimed.select(F.col("id").alias("f"), F.col("parent").alias("p_f"))
        e = e.join(pm, "f")
        src_v = F.when(f_first, F.col("f")).otherwise(F.col("t"))
        nei_v = F.when(f_first, F.col("t")).otherwise(F.col("f"))
        nei_par = F.when(f_first, F.col("p_t")).otherwise(F.col("p_f"))
    else:
        src_v, nei_v, nei_par = F.col("f"), F.col("t"), F.col("p_t")
    e = e.select(
        "f", "t",
        src_v.alias("a"), nei_v.alias("b"), (nei_par == src_v).alias("is_par"),
    )
    # one tree arc per reached non-root vertex: its parent arc; when both
    # orientations exist (reciprocal pair) prefer the (parent → child) one
    ranked = e.filter(F.col("is_par")).withColumn(
        "_pref", (F.col("f") == F.col("a")).cast("int")
    )
    tree = (
        ranked.groupBy("a", "b")
        .agg(F.max(F.struct("_pref", "f", "t")).alias("w"))
        .select(F.col("w.f").alias("f"), F.col("w.t").alias("t"))
    )
    nontree = e.join(tree, ["f", "t"], "left_anti")

    am = claimed.select(
        F.col("id").alias("a"), F.col("rootrank").alias("rk_a"),
        F.col("dist").alias("d_a"),
    )
    copies = zip_dense_ids(
        nontree.join(am, "a").select("f", "t", "b", "rk_a", "d_a", "a"),
        ["rk_a", "d_a", "a", "f", "t"],
        out_col="copy",
        start=n,
    )
    copy_edges = copies.select(
        F.when(F.col("f") == F.col("b"), F.col("copy")).otherwise(F.col("f")).alias("src"),
        F.when(F.col("f") == F.col("b"), F.col("t")).otherwise(F.col("copy")).alias("dst"),
    )
    tree_edges = tree.select(
        F.col("f").alias("src"), F.col("t").alias("dst")
    ).unionByName(copy_edges)

    vertex_index = (
        graph.vertices().select(F.col("id").alias("new_id"), F.col("id").alias("orig_id"))
        .unionByName(
            copies.select(F.col("copy").alias("new_id"), F.col("b").alias("orig_id"))
        )
    )
    return tree_edges, vertex_index


def get_all_shortest_paths(
    graph: LinkGraph,
    source: int,
    to: list[int] | DataFrame | None = None,
    mode: str = "out",
    max_iter: int = 200,
    max_paths: int = 10_000_000,
) -> DataFrame:
    """EVERY geodesic from ``source`` → (source, target, dist,
    path: array<long>) — one row per shortest path
    (igraph_get_all_shortest_paths, /root/reference/src/
    structural_properties.c:924-1100: BFS + full predecessor lists;
    the reference's ``nrgeo`` counts are the per-target row counts
    here).

    Plan: one unweighted multi-layer BFS for distances (superstep
    loop), then a backtrack expansion over the geodesic DAG — each
    round one join extends every open path by all of its head's
    predecessors, so the work is proportional to the number of
    geodesic prefixes (the output size; ``max_paths`` guards the
    combinatorial blowup, the same practical bound the in-memory
    reference hits as OOM).
    """
    dist = shortest_paths(graph, [int(source)], mode=mode, max_iter=max_iter)
    dist = dist.filter(~F.col("dist").isNull()).select(
        "id", F.col("dist").cast("long").alias("dist")
    ).localCheckpointFlat(eager=True)

    edges = _edges_for_mode(graph, mode).select("src", "dst").distinct()
    dsrc = dist.select(F.col("id").alias("src"), F.col("dist").alias("d_src"))
    ddst = dist.select(F.col("id").alias("dst"), F.col("dist").alias("d_dst"))
    # geodesic-DAG arcs reversed for the backtrack: child ← parent
    dag = (
        edges.join(dsrc, "src").join(ddst, "dst")
        .filter(F.col("d_dst") == F.col("d_src") + 1)
        .select(F.col("dst").alias("head"), F.col("src").alias("parent"))
        .localCheckpointFlat(eager=True)
    )

    targets = dist
    if to is not None:
        if isinstance(to, DataFrame):
            tdf = to.select(F.col(to.columns[0]).alias("id"))
        else:
            tdf = graph.spark.createDataFrame([(int(t),) for t in to], "id long")
        targets = targets.join(tdf, "id", "left_semi")
    state = targets.select(
        F.col("id").alias("target"),
        "dist",
        F.col("id").alias("head"),
        F.array(F.col("id")).alias("path"),
    ).localCheckpointFlat(eager=True)
    done = state.filter(F.col("head") == source)
    for _it in range(max_iter):
        active = state.filter(F.col("head") != source)
        if active.isEmpty():
            break
        ext = (
            active.join(dag, "head")
            .select(
                "target",
                "dist",
                F.col("parent").alias("head"),
                F.concat(F.array(F.col("parent")), F.col("path")).alias("path"),
            )
            .localCheckpointFlat(eager=True)
        )
        n_open = ext.count()
        if n_open > max_paths:
            raise ValueError(
                f"geodesic expansion exceeded max_paths={max_paths}"
            )
        done = done.unionByName(ext.filter(F.col("head") == source))
        state = ext
    return done.select(
        F.lit(int(source)).alias("source"), "target", "dist", "path"
    )


def get_all_simple_paths(
    graph: LinkGraph,
    v_from: int,
    to: list[int] | None = None,
    cutoff: int = -1,
    mode: str = "out",
    max_level_rows: int = 10_000_000,
) -> DataFrame:
    """All simple paths from ``v_from`` to the ``to`` vertices
    (igraph_get_all_simple_paths, /root/reference/src/paths.c:60) →
    one row per path, ``path: array<long>`` including both endpoints,
    ``target``, ``length``. ``cutoff`` bounds the path length in edges
    (-1 = unbounded, like the reference).

    The reference DFS-backtracks; the relational plan is frontier
    extension — level k holds every simple path of length k as an
    array, extended by one arc join + an array_contains filter. The
    simple-path count is worst-case factorial, so each level is
    row-guarded like cliques.py (the reference would OOM on the same
    inputs; the guard fails loudly instead)."""
    arcs = (
        _edges_for_mode(graph, mode)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    spark = graph.spark
    targets = None if to is None else {int(t) for t in to}

    level = spark.createDataFrame(
        [([int(v_from)], int(v_from))], "path array<bigint>, last bigint"
    )
    out: list[DataFrame] = []
    k = 0
    while True:
        keep = level
        if targets is not None:
            keep = keep.filter(F.col("last").isin(*targets))
        if k > 0 or targets is None or int(v_from) in targets:
            out.append(
                keep.select(
                    "path",
                    F.col("last").alias("target"),
                    F.lit(k).alias("length"),
                )
            )
        if cutoff >= 0 and k >= cutoff:
            break
        nxt = (
            level.join(arcs.withColumnRenamed("src", "last"), "last")
            .filter(~F.array_contains("path", F.col("dst")))
            .select(
                F.concat("path", F.array("dst")).alias("path"),
                F.col("dst").alias("last"),
            )
            .localCheckpointFlat(eager=True)
        )
        n = nxt.count()
        if n == 0:
            break
        if n > max_level_rows:
            raise ValueError(
                f"simple-path level {k + 1} holds {n} paths "
                f"(> max_level_rows={max_level_rows}); set a cutoff"
            )
        level = nxt
        k += 1
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def transitive_closure_dag(
    graph: LinkGraph,
    max_rows: int = 100_000_000,
) -> LinkGraph:
    """Transitive closure of a DAG (igraph_transitive_closure_dag,
    /root/reference/src/structural_properties.c:6340): u → v for every
    distinct pair with a directed path; raises on a non-DAG like the
    reference.

    Plan: path doubling — R ← R ∪ (R ∘ R), distinct — reaches the
    fixpoint in ⌈log₂ depth⌉ joins instead of the reference's
    per-vertex reverse-topological sweep, so a depth-1000 DAG closes
    in 10 supersteps. The closure itself can be Θ(n²) rows (a path
    graph's is n(n−1)/2); ``max_rows`` guards the blowup the same way
    cliques.py caps its levels."""
    if not is_dag(graph):
        raise ValueError(
            "transitive_closure_dag expects a DAG (the reference errors "
            "on cyclic input too)"
        )
    r = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    n_prev = r.count()
    while True:
        step = (
            r.select(F.col("src"), F.col("dst").alias("_mid"))
            .join(r.select(F.col("src").alias("_mid"), "dst"), "_mid")
            .select("src", "dst")
        )
        r = r.unionByName(step).distinct().localCheckpointFlat(eager=True)
        n_now = r.count()
        if n_now > max_rows:
            raise ValueError(
                f"transitive closure exceeds max_rows={max_rows} "
                f"({n_now} pairs and growing); raise the guard if intended"
            )
        if n_now == n_prev:
            break
        n_prev = n_now
    return LinkGraph(
        r.withColumn("weight", F.lit(1.0)), directed=True, n=graph.vcount()
    )
