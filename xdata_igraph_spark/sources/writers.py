"""Graph writers (igraph_write_graph_edgelist / _ncol,
/root/reference/src/foreign.c:1425,1471) plus parquet state sinks.

Results and checkpoints go to parquet (`df.write.parquet`) — the
engine's durable format; the text writers exist for interchange with
reference tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def write_edgelist(graph: LinkGraph, path: str) -> None:
    (
        graph.edges.select(
            F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string")).alias(
                "value"
            )
        ).write.mode("overwrite").text(path)
    )


def write_ncol(
    graph: LinkGraph, path: str, names: DataFrame | None = None, weights: bool = True
) -> None:
    e = graph.edges
    if names is not None:
        s = names.select(F.col("id").alias("src"), F.col("url").alias("src_name"))
        d = names.select(F.col("id").alias("dst"), F.col("url").alias("dst_name"))
        e = e.join(s, "src").join(d, "dst")
    else:
        e = e.withColumn("src_name", F.col("src").cast("string")).withColumn(
            "dst_name", F.col("dst").cast("string")
        )
    cols = [F.col("src_name"), F.col("dst_name")]
    if weights:
        cols.append(F.col("weight").cast("string"))
    e.select(F.concat_ws(" ", *cols).alias("value")).write.mode("overwrite").text(path)
