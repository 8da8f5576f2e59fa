"""pages → link extraction → dense vertex ids → edge table → LinkGraph.

This is the ingest path of the north rule: an Iceberg/parquet corpus of
web pages (url, warc_ts, html, text, lang) becomes the columnar edge
table the algorithms run on.

Scale notes (the parts that must survive 10^12 documents):
- **id minting without a global window**: dense ids 0..n-1 by sorted
  url (FIXTURES.md §2, mirroring igraph's implicit 0..n-1 ids) are
  assigned by range-partitioning the distinct urls, ranking *within*
  each partition, and adding broadcast per-partition offsets — no
  single-partition window, no driver collect of data rows (only P
  partition counts);
- **link extraction** is the only Python (Arrow pandas UDF), applied
  once per page batch; only (url, html) columns enter the UDF scan
  (column pruning keeps the text/lang bytes out of the exchange);
- the url→id dictionary join is a plain hash join on url; Catalyst/AQE
  broadcasts it when small (tests) and shuffles both sides at corpus
  scale — exactly the right behavior in both regimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.functions.extract import extract_links
from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.ids import zip_dense_ids


def build_vertices(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(id: long, url: string), ids dense 0..n-1 by ascending url.

    Minting is the range-partition + per-partition rank + broadcast
    prefix-offset plan (plans/ids.py) — no single-partition window, no
    driver collect of data rows (only P partition counts)."""
    urls = pages.select("url").distinct()
    return zip_dense_ids(urls, ["url"], out_col="id",
                         num_partitions=num_partitions).select("id", "url")


def extract_edge_urls(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, weight=occurrences); self-links dropped
    (FIXTURES.md §2)."""
    links = pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_links("html")).alias("dst_url"),
    )
    return (
        links.filter(F.col("src_url") != F.col("dst_url"))
        .groupBy("src_url", "dst_url")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def pages_to_graph(
    pages: DataFrame, return_vertices: bool = False
) -> LinkGraph | tuple[LinkGraph, DataFrame]:
    """Full ingest: pages → LinkGraph over dense vertex ids.

    Only urls that appear as a *page* get vertex ids; links pointing
    outside the corpus are dropped by the inner dictionary join (at
    web scale: the frontier of uncrawled urls).
    """
    vertices = build_vertices(pages)
    src_dict = vertices.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_dict = vertices.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    # dictionary joins BEFORE the occurrence count: the aggregation then
    # shuffles (src, dst) longs instead of url-string pairs (guide §2.3
    # — shuffle keys, not payloads; the url→id map is a bijection over
    # corpus pages and out-of-corpus links are dropped by the inner
    # join either way, so the grouped counts are identical)
    links = pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_links("html")).alias("dst_url"),
    ).filter(F.col("src_url") != F.col("dst_url"))
    edges = (
        links.join(src_dict, "src_url")
        .join(dst_dict, "dst_url")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    n = vertices.count()
    # materialize: the edge table is the product of UDF extraction +
    # two dictionary joins; every downstream operator would otherwise
    # re-evaluate that pipeline per action
    g = LinkGraph(edges, directed=True, n=n).materialized()
    if return_vertices:
        return g, vertices
    return g
