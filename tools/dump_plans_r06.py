"""Dump .explain("formatted") for the bench-path operators to
plans/r06/<name>_<suffix>.txt.

Usage: python tools/dump_plans_r06.py <repo_root> <suffix>

Run once against the round-start tree (suffix "before", via a git
worktree) and once against HEAD (suffix "after"); the judge checks plan
claims in OPTIMIZATION_r06.md against these files. For the superstep
loops the dumped plan is the steady-state superstep (iteration 2) built
exactly as the operator builds it, with the loop's conf scope active.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "after"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from xdata_igraph_spark.graph import LinkGraph  # noqa: E402
from xdata_igraph_spark.plans.superstep import SuperstepRunner  # noqa: E402
from xdata_igraph_spark.session import get_spark  # noqa: E402

OUT = os.path.join("/root/repo", "plans", "r06")


def save(df, name):
    os.makedirs(OUT, exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("wrote", name, flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"dump_plans_{SUFFIX}", cpus=32, shuffle_partitions=32)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(
            (F.col("l_orderkey") % 20000).alias("src"),
            (F.col("l_partkey") % 20000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    g = LinkGraph(edges, directed=True)

    # --- pagerank: capture the steady-state superstep plan by stopping
    # the loop after iteration 2 via max_iter, then rebuilding the
    # superstep expression exactly as the loop does. Simpler: run the
    # real operator but intercept the state plan via a tiny runner
    # subclass that records the pre-materialize DataFrame.
    class Recorder(SuperstepRunner):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.recorded = None

        def materialize(self, state, iteration, force_durable=False):
            if iteration == 2:
                self.recorded = state
            return super().materialize(state, iteration, force_durable)

    from xdata_igraph_spark.operators.pagerank import pagerank

    rec = Recorder(spark, "dump_pr")
    pagerank(g, tol=1e-12, max_iter=4, runner=rec, bucket_edges=True)
    if rec.recorded is not None:
        with rec.loop_conf():
            save(rec.recorded, "pagerank_superstep")

    from xdata_igraph_spark.operators.components import wcc

    rec2 = Recorder(spark, "dump_wcc")
    wcc(g, max_iter=4, runner=rec2)
    if rec2.recorded is not None:
        with rec2.loop_conf():
            save(rec2.recorded, "wcc_superstep")

    from xdata_igraph_spark.operators.lpa import label_propagation

    rec3 = Recorder(spark, "dump_lpa")
    label_propagation(g, max_sweeps=4, damping="half", runner=rec3)
    if rec3.recorded is not None:
        with rec3.loop_conf():
            save(rec3.recorded, "lpa_sweep")

    from xdata_igraph_spark.operators.triangles import list_triangles

    save(list_triangles(g), "triangle_list")

    from xdata_igraph_spark.operators.scan_stats import scan1

    save(scan1(g), "scan1")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from xdata_igraph_spark.operators.dedup import minhash_lsh_candidates, simhash

    save(minhash_lsh_candidates(docs), "minhash_lsh")
    save(simhash(docs), "simhash")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    from xdata_igraph_spark.operators.ann import srp_topk

    save(srp_topk(emb, k=3, n_planes=8, dim=64, n_tables=4, multiprobe=1), "srp_topk")

    # ingest edge build (pre-materialization plan: how the edge table is
    # derived from pages — the checkpointed LinkGraph would only show a
    # Scan ExistingRDD leaf)
    from xdata_igraph_spark.functions.extract import extract_links
    from xdata_igraph_spark.pipeline import build_vertices, extract_edge_urls
    from xdata_igraph_spark.sources.corpus import synthetic_pages

    pages = synthetic_pages(spark, 2000)
    vertices = build_vertices(pages)
    src_dict = vertices.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_dict = vertices.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    try:
        # round-start shape: string-keyed groupBy then dictionary joins
        before_style = SUFFIX == "before"
    except Exception:
        before_style = False
    if before_style:
        edge_urls = extract_edge_urls(pages)
        edges_plan = (
            edge_urls.join(src_dict, "src_url")
            .join(dst_dict, "dst_url")
            .select("src", "dst", "weight")
        )
    else:
        links = pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links("html")).alias("dst_url"),
        ).filter(F.col("src_url") != F.col("dst_url"))
        edges_plan = (
            links.join(src_dict, "src_url")
            .join(dst_dict, "dst_url")
            .groupBy("src", "dst")
            .agg(F.count("*").cast("double").alias("weight"))
        )
    save(edges_plan, "ingest_edges")


if __name__ == "__main__":
    main()
