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
    return e.repartition("src").localCheckpoint(eager=True)


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
    ).repartition("id").localCheckpoint(eager=True)

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
    e = e.localCheckpoint(eager=True)
    remaining = graph.vertices().localCheckpoint(eager=True)
    layers: list[DataFrame] = []
    layer_no = 0
    while True:
        n_rem = remaining.count()
        if n_rem == 0:
            break
        with_in = e.select(F.col("dst").alias("id")).distinct()
        zero_in = remaining.join(with_in, "id", "left_anti").localCheckpoint(True)
        n_zero = zero_in.count()
        if n_zero == 0:
            raise ValueError("graph has a cycle; topological sort undefined "
                             "(igraph_is_dag false)")
        layers.append(zero_in.withColumn("layer", F.lit(layer_no).cast("long")))
        remaining = remaining.join(zero_in, "id", "left_anti").localCheckpoint(True)
        e = e.join(zero_in.withColumnRenamed("id", "src"), "src", "left_anti").localCheckpoint(True)
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
    ).repartition("id").localCheckpoint(eager=True)

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
    parents = st.select("id", "parent").localCheckpoint(eager=True)
    walk = st_t.select(
        F.col("id").alias("target"),
        "dist",
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("path"),
    ).localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
        )
        done = done.unionByName(
            stepped.filter(F.col("cur") == F.lit(int(source)))
        ).localCheckpoint(eager=True)
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
