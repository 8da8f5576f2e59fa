"""XDATA scan statistics — the fork's signature feature
(/root/reference/src/scan.c).

- scan-0: per-vertex degree/strength (igraph_local_scan_0,
  src/scan.c:37-65);
- scan-1: number of edges inside the *closed* 1-neighborhood N[v]
  (igraph_local_scan_1_ecount, src/scan.c:331). For a simple
  undirected graph this equals deg(v) + triangles(v): the edges
  incident to v plus the edges among its neighbors;
- "us/them" variants (src/scan.c:565-612,613-720): the neighborhood
  comes from the US graph, the counted edges from the THEM graph —
  two snapshots of the same vertex universe. In Spark two edge
  DataFrames and a join, the natural fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.triangles import (
    _simple_undirected,
    adjacent_triangles,
)


def scan0(graph: LinkGraph, weighted: bool = False) -> DataFrame:
    """(id, scan0) — degree (or strength) per vertex."""
    if weighted:
        return graph.strength("all").withColumnRenamed("strength", "scan0")
    return (
        graph.degrees("all", loops=False)
        .select("id", F.col("degree").cast("double").alias("scan0"))
    )


def scan1(graph: LinkGraph) -> DataFrame:
    """(id, scan1) — edges within the closed 1-neighborhood
    (= degree + per-vertex triangle count on the simple graph)."""
    simple = _simple_undirected(graph)
    deg = (
        simple.select(F.col("a").alias("id"))
        .union(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    tri = adjacent_triangles(graph)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce("degree", F.lit(0)) + F.col("triangles")).cast("long").alias("scan1"),
        )
    )


def scan0_them(us: LinkGraph, them: LinkGraph) -> DataFrame:
    """(id, scan0_them) — THEM-degree of every US vertex
    (igraph_local_scan_0_them, /root/reference/src/scan.c:565)."""
    them_deg = them.degrees("all", loops=False)
    return us.vertices().join(them_deg, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("scan0_them")
    )


def scan1_them(us: LinkGraph, them: LinkGraph) -> DataFrame:
    """(id, scan1_them) — THEM-edges with both endpoints inside the
    closed US 1-neighborhood of v (igraph_local_scan_1_ecount_them,
    /root/reference/src/scan.c:613).

    Relational plan: closed-neighborhood pairs P(v,u) from US, THEM
    edges (a,b) counted per v via P(v,a) ⋈ P(v,b) ⋈ them(a,b).
    """
    us_sym = (
        us.symmetrized().select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    closed = us_sym.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
        us.vertices().select(F.col("id").alias("v"), F.col("id").alias("u"))
    )
    te = (
        them.symmetrized()
        .select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    pa = closed.select("v", F.col("u").alias("a"))
    pb = closed.select("v", F.col("u").alias("b"))
    counts = (
        te.join(pa, "a").join(pb, ["v", "b"])
        .groupBy("v")
        .agg(F.count("*").alias("scan1_them"))
    )
    verts = us.vertices()
    return (
        verts.join(counts, verts.id == counts.v, "left")
        .select("id", F.coalesce("scan1_them", F.lit(0)).alias("scan1_them"))
    )
