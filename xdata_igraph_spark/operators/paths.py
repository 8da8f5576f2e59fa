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
