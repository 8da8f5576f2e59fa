"""Isolation benchmarks for the optimization round (guide §1.4).

NOT the driver's bench — bench.py stays frozen. This file times each
headline operator in isolation (noop sink where the result is a
DataFrame), records per-superstep wall times and Spark job counts for
the superstep loops, and dumps ``.explain("formatted")`` plans to
``plans/r06/``.

Usage::

    python bench_extra.py [query ...]    # default: all
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from xdata_igraph_spark.graph import LinkGraph  # noqa: E402
from xdata_igraph_spark.pipeline import pages_to_graph  # noqa: E402
from xdata_igraph_spark.plans.superstep import SuperstepRunner  # noqa: E402
from xdata_igraph_spark.session import get_spark  # noqa: E402
from xdata_igraph_spark.sources.corpus import synthetic_pages  # noqa: E402

LINEITEM_MOD = 20_000
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def save_plan_formatted(df, name):
    os.makedirs(PLAN_DIR, exist_ok=True)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLAN_DIR, name), "w") as f:
        f.write(buf.getvalue())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = set(sys.argv[1:])
    plan_suffix = os.environ.get("PLAN_SUFFIX", "before")

    spark = get_spark("bench_extra", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, object] = {}

    def run(name):
        return not which or name in which

    def timed(name, fn):
        sc.setJobDescription(name)
        j0 = max(tracker.getJobIdsForGroup() or [0], default=0)
        t = time.monotonic()
        r = fn()
        dt = time.monotonic() - t
        out[name] = round(dt, 3)
        print(f"{name}: {dt:.3f}s", flush=True)
        sc.setJobDescription(None)
        return r

    def jobs_between(fn):
        """Count Spark jobs submitted while fn runs."""
        before = sc._jsc.sc().statusStore().jobsList(None).size()
        fn()
        after = sc._jsc.sc().statusStore().jobsList(None).size()
        return after - before

    # warmup (same as bench.py)
    pages_to_graph(synthetic_pages(spark, 2000)).edges.count()

    n_pages = 200_000

    if run("ingest"):
        # break ingest into phases
        pages = synthetic_pages(spark, n_pages)
        from xdata_igraph_spark.pipeline import build_vertices, extract_edge_urls

        timed("ingest_vertices", lambda: build_vertices(pages).count())
        timed("ingest_edge_urls", lambda: noop(extract_edge_urls(pages)))
        timed("ingest_full", lambda: pages_to_graph(pages).edges.count())
        timed("ingest_full2", lambda: pages_to_graph(pages).edges.count())

    corpus_g = pages_to_graph(synthetic_pages(spark, n_pages))

    from xdata_igraph_spark.operators.pagerank import pagerank

    if run("pagerank"):
        runner = SuperstepRunner(spark, "x_pr_corpus")
        t = time.monotonic()
        n_jobs = jobs_between(
            lambda: pagerank(
                corpus_g, tol=1e-6, max_iter=200, runner=runner, bucket_edges=True
            ).count()
        )
        out["corpus_pagerank"] = round(time.monotonic() - t, 3)
        out["corpus_pagerank_jobs"] = n_jobs
        out["corpus_pagerank_superstep_ms"] = [round(h.wall_ms, 1) for h in runner.history]
        out["corpus_pagerank_iters"] = len(runner.history)
        print("pagerank:", out["corpus_pagerank"], "jobs:", n_jobs,
              "steps:", out["corpus_pagerank_superstep_ms"], flush=True)

    # lineitem graph
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(
            (F.col("l_orderkey") % LINEITEM_MOD).alias("src"),
            (F.col("l_partkey") % LINEITEM_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    g = LinkGraph(edges, directed=True)

    if run("pagerank_li"):
        runner2 = SuperstepRunner(spark, "x_pr_li")
        t = time.monotonic()
        n_jobs = jobs_between(
            lambda: pagerank(
                g, tol=1e-6, max_iter=200, runner=runner2, bucket_edges=True
            ).count()
        )
        out["li_pagerank"] = round(time.monotonic() - t, 3)
        out["li_pagerank_jobs"] = n_jobs
        out["li_pagerank_superstep_ms"] = [round(h.wall_ms, 1) for h in runner2.history]
        print("li_pagerank:", out["li_pagerank"], "jobs:", n_jobs,
              "steps:", out["li_pagerank_superstep_ms"], flush=True)

    from xdata_igraph_spark.operators.components import wcc

    if run("wcc"):
        runner3 = SuperstepRunner(spark, "x_wcc")
        t = time.monotonic()
        n_jobs = jobs_between(
            lambda: wcc(g, runner=runner3).select("component").distinct().count()
        )
        out["wcc"] = round(time.monotonic() - t, 3)
        out["wcc_jobs"] = n_jobs
        out["wcc_superstep_ms"] = [round(h.wall_ms, 1) for h in runner3.history]
        print("wcc:", out["wcc"], "jobs:", n_jobs, "steps:", out["wcc_superstep_ms"], flush=True)

    from xdata_igraph_spark.operators.triangles import list_triangles

    if run("triangles"):
        timed("triangle_count", lambda: list_triangles(g).count())
        timed("triangle_count2", lambda: list_triangles(g).count())

    from xdata_igraph_spark.operators.lpa import label_propagation

    if run("lpa"):
        runner4 = SuperstepRunner(spark, "x_lpa")
        t = time.monotonic()
        n_jobs = jobs_between(
            lambda: label_propagation(
                g, max_sweeps=5, damping="half", runner=runner4
            ).count()
        )
        out["lpa"] = round(time.monotonic() - t, 3)
        out["lpa_jobs"] = n_jobs
        out["lpa_superstep_ms"] = [round(h.wall_ms, 1) for h in runner4.history]
        print("lpa:", out["lpa"], "jobs:", n_jobs, "steps:", out["lpa_superstep_ms"], flush=True)

    from xdata_igraph_spark.operators.scan_stats import scan1

    if run("scan1"):
        timed("scan1", lambda: scan1(g).count())
        timed("scan1_2", lambda: scan1(g).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from xdata_igraph_spark.operators.dedup import minhash_lsh_candidates, simhash

    if run("minhash"):
        out["docs_rows"] = docs.count()
        timed("minhash_lsh", lambda: minhash_lsh_candidates(docs).count())
        timed("minhash_lsh2", lambda: minhash_lsh_candidates(docs).count())
        save_plan_formatted(minhash_lsh_candidates(docs), f"minhash_lsh_{plan_suffix}.txt")

    if run("simhash"):
        timed("simhash", lambda: simhash(docs).count())
        timed("simhash2", lambda: simhash(docs).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    from xdata_igraph_spark.operators.ann import cosine_topk_blocked, srp_topk

    if run("srp"):
        out["emb_rows"] = emb.count()
        timed("srp_topk", lambda: srp_topk(
            emb, k=3, n_planes=8, dim=64, n_tables=4, multiprobe=1
        ).count())
        timed("srp_topk2", lambda: srp_topk(
            emb, k=3, n_planes=8, dim=64, n_tables=4, multiprobe=1
        ).count())
        save_plan_formatted(
            srp_topk(emb, k=3, n_planes=8, dim=64, n_tables=4, multiprobe=1),
            f"srp_topk_{plan_suffix}.txt",
        )

    if run("exact"):
        probe = emb.filter(F.col("vec_id") < 200)
        timed("embedding_topk_exact_probe", lambda: cosine_topk_blocked(
            emb, k=3, probe=probe
        ).count())

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
