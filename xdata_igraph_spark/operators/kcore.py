"""k-core decomposition.

Reference: igraph_coreness (/root/reference/src/cores.c:58-130), a
sequential bucket-queue peel. Two distributed formulations:

- **h-index fixpoint** (default): c₀ = degree; c_{t+1}(v) = H-index of
  the neighbors' c_t (largest h with ≥ h neighbors at value ≥ h).
  Converges monotonically to the coreness (Lü, Zhou, Zhang, Stanley,
  "The H-index of a network node", Nature Comm. 7:10168, 2016; the
  theorem is stated for undirected graphs — the directed in/out-mode
  generalization (h-index over mode-neighbors' values) is verified
  against the exact peel in tests/test_round2_ops.py) in a
  few dozen supersteps on real graphs — each superstep one edge-size
  join + a per-vertex-keyed window + aggregate, all partitioned.
  This is the 100-TB path: superstep count is small and independent of
  the peel depth.
- **peel** (cross-check): for k = 1, 2, … repeatedly delete vertices
  with remaining degree < k (Montresor et al. semantics, relationally);
  exact but with O(degeneracy × waves) tiny supersteps — test scale.

Mode follows the reference (out/in/all degrees; undirected = all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def coreness(graph: LinkGraph, mode: str = "all", method: str = "hindex",
             max_iter: int = 10_000) -> DataFrame:
    """Per-vertex coreness → (id: long, coreness: long)."""
    if method == "hindex":
        return _coreness_hindex(graph, mode, max_iter)
    if method != "peel":
        raise ValueError("method must be 'hindex' or 'peel'")
    if mode == "all" or not graph.directed:
        adj = graph.symmetrized()
    elif mode == "out":
        adj = graph.edges
    else:
        adj = graph.adjacency("in")
    # degrees count simple incident edges like the reference's default
    # (loops contribute; our fixtures are simple graphs)
    edges = adj.select("src", "dst").filter(F.col("src") != F.col("dst"))
    active_e = edges.localCheckpointFlat(eager=True)
    active_v = (
        graph.vertices().localCheckpointFlat(eager=True)
    )
    spark = graph.spark
    result_parts: list[DataFrame] = []
    k = 1
    while active_v.limit(1).count() > 0:
        while True:
            deg = active_e.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("deg")
            )
            with_deg = active_v.join(deg, "id", "left").select(
                "id", F.coalesce("deg", F.lit(0)).alias("deg")
            )
            peeled = with_deg.filter(F.col("deg") < k).select("id").localCheckpointFlat(True)
            if peeled.limit(1).count() == 0:
                break
            result_parts.append(
                peeled.withColumn("coreness", F.lit(k - 1).cast("long"))
            )
            active_v = active_v.join(peeled, "id", "left_anti").localCheckpointFlat(True)
            active_e = (
                active_e.join(
                    peeled.withColumnRenamed("id", "src"), "src", "left_anti"
                )
                .join(peeled.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpointFlat(True)
            )
        k += 1
        if k > 1_000_000:  # safety
            raise RuntimeError("k-core runaway")
    if not result_parts:
        # empty graph: the reference returns an empty coreness vector
        return spark.createDataFrame([], "id long, coreness long")
    out = result_parts[0]
    for p in result_parts[1:]:
        out = out.unionByName(p)
    return out


def _coreness_hindex(graph: LinkGraph, mode: str, max_iter: int) -> DataFrame:
    """H-index fixpoint (module docstring); identical output to the
    peel — tests assert equality of both methods."""
    from xdata_igraph_spark.plans.superstep import SuperstepRunner

    if mode == "all" or not graph.directed:
        adj = graph.symmetrized()
    elif mode == "out":
        adj = graph.edges_cached()
    else:
        adj = graph.adjacency("in")
    runner = SuperstepRunner(graph.spark, "kcore_hindex")
    with runner.loop_conf():
        # loop partitions from the measured edge count; AQE/broadcast/
        # codegen handling identical to the other superstep loops
        runner.tune_loop_partitions(graph.ecount())
        # partition by dst — the per-superstep VALUE join's key — and
        # sort, so each superstep streams the edge side with no
        # exchange/sort (the old src layout re-exchanged the whole edge
        # table by dst EVERY superstep); the dst→src h-index shuffle is
        # the one fundamental message exchange per superstep
        edges = (
            adj.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .repartition("dst")
            .sortWithinPartitions("dst")
            .localCheckpoint(eager=True)
        )
        vals = edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").cast("long").alias("val")
        )
        verts = graph.vertices()
        vals = (
            verts.join(vals, "id", "left")
            .select("id", F.coalesce("val", F.lit(0)).alias("val"))
            .repartition("id")
            .localCheckpointFlat(eager=True)
        )
        for _it in range(max_iter):
            nbr = edges.join(
                vals.select(F.col("id").alias("dst"), "val"), "dst"
            ).select("src", "val")
            # per-vertex window (keyed by src — no global exchange):
            # h = max rank r with r-th largest neighbor value >= r
            w = Window.partitionBy("src").orderBy(F.desc("val"))
            h = (
                nbr.withColumn("rn", F.row_number().over(w))
                .filter(F.col("val") >= F.col("rn"))
                .groupBy("src")
                .agg(F.max("rn").cast("long").alias("h"))
            )
            new_vals = (
                vals.join(h, vals.id == h.src, "left")
                .select(
                    "id",
                    F.col("val").alias("_old"),
                    F.coalesce("h", F.lit(0)).alias("val"),
                )
            )
            new_vals = runner.materialize(new_vals, _it)
            changed = new_vals.filter(F.col("val") != F.col("_old")).count()
            runner.finish_iteration(_it, float(changed))
            vals = new_vals.drop("_old")
            if changed == 0:
                break
        else:
            import warnings

            warnings.warn(
                f"coreness h-index iteration hit max_iter={max_iter} before "
                "fixpoint; values may overestimate coreness",
                RuntimeWarning,
            )
    return vals.select("id", F.col("val").alias("coreness"))


def k_core_subgraph(graph: LinkGraph, k: int) -> LinkGraph:
    """The k-core as a subgraph (vertices with coreness ≥ k)."""
    cores = coreness(graph)
    keep = cores.filter(F.col("coreness") >= k).select("id")
    return graph.induced_subgraph(keep)
