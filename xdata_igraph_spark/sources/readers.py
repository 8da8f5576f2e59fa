"""Text graph readers — the reference's main ingest formats.

- edgelist: whitespace-separated integer pairs, one edge per line
  (igraph_read_graph_edgelist, /root/reference/src/foreign.c:52-121);
- ncol: ``name name [weight]`` lines (igraph_read_graph_ncol,
  /root/reference/src/foreign.c:133-303). The reference assigns vertex
  ids by first appearance in file order (inherently sequential); this
  engine assigns dense ids by sorted name — documented deviation, the
  deterministic distributed contract (same rule as url id minting).

Both are ``spark.read.text`` + column splits — fully parallel scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.pipeline import build_vertices


def read_edgelist(spark: SparkSession, path: str, directed: bool = True) -> LinkGraph:
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    edges = (
        lines.filter(F.trim("value") != "")
        .select(
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
    )
    return LinkGraph(edges, directed=directed)


def read_ncol(
    spark: SparkSession, path: str, directed: bool = True, weights: bool = True
) -> tuple[LinkGraph, DataFrame]:
    """Returns (graph, names) with names = (id, url) dictionary
    (column named url to share build_vertices)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    raw = lines.filter(F.trim("value") != "").select(
        parts.getItem(0).alias("src_name"),
        parts.getItem(1).alias("dst_name"),
        (parts.getItem(2).cast("double") if weights else F.lit(1.0)).alias("weight"),
    ).withColumn("weight", F.coalesce("weight", F.lit(1.0)))
    names = (
        raw.select(F.col("src_name").alias("url"))
        .union(raw.select(F.col("dst_name").alias("url")))
        .distinct()
    )
    vertices = build_vertices(names.select("url"))
    s = vertices.select(F.col("url").alias("src_name"), F.col("id").alias("src"))
    d = vertices.select(F.col("url").alias("dst_name"), F.col("id").alias("dst"))
    edges = raw.join(s, "src_name").join(d, "dst_name").select("src", "dst", "weight")
    return LinkGraph(edges, directed=directed, n=vertices.count()), vertices
