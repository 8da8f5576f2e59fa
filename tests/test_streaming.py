"""Structured-Streaming ingest: incremental extraction must match the
batch path byte-for-byte (same pandas UDFs)."""

from pyspark.sql import functions as F

from xdata_igraph_spark.sources.corpus import synthetic_pages
from xdata_igraph_spark.streaming.ingest import (
    hash_edges_from_pages,
    stream_link_rate,
    stream_pages_to_edges,
)


def _write_pages_in_chunks(spark, tmp_path, n=300):
    pages = synthetic_pages(spark, n)
    d = str(tmp_path / "pages")
    # two arrivals — the stream must pick up both incrementally
    pages.filter(F.col("page_id") < n // 2).write.mode("append").parquet(d)
    pages.filter(F.col("page_id") >= n // 2).write.mode("append").parquet(d)
    return pages, d


def test_stream_matches_batch(spark, tmp_path):
    pages, pages_dir = _write_pages_in_chunks(spark, tmp_path)
    out = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    q = stream_pages_to_edges(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = hash_edges_from_pages(pages)
    assert streamed.count() == batch.count()
    # identical multiset of (src_url, dst_url)
    diff = (
        streamed.groupBy("src_url", "dst_url").count()
        .exceptAll(batch.groupBy("src_url", "dst_url").count())
    )
    assert diff.isEmpty()
    # hash ids consistent with urls
    bad = streamed.filter(
        (F.xxhash64("src_url") != F.col("src")) | (F.xxhash64("dst_url") != F.col("dst"))
    )
    assert bad.isEmpty()


def test_stream_resume_is_incremental(spark, tmp_path):
    """Restarting against the same checkpoint must not duplicate edges."""
    pages, pages_dir = _write_pages_in_chunks(spark, tmp_path, n=200)
    out = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    stream_pages_to_edges(spark, pages_dir, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # second run, no new files → no new rows
    stream_pages_to_edges(spark, pages_dir, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1
    # new files arrive → only the delta is appended
    extra = synthetic_pages(spark, 260).filter(F.col("page_id") >= 200)
    extra.write.mode("append").parquet(pages_dir)
    stream_pages_to_edges(spark, pages_dir, out, ckpt).awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    want_delta = hash_edges_from_pages(extra).count()
    assert n2 == n1 + want_delta


def test_stream_link_rate_windows(spark, tmp_path):
    pages, pages_dir = _write_pages_in_chunks(spark, tmp_path, n=240)
    # corpus timestamps span only minutes — use a tight watermark so
    # append mode can close (emit) windows before the query drains
    rate = stream_link_rate(spark, pages_dir, window="1 minute", watermark="0 seconds")
    q = (
        rate.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rate_test")
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes all but the last window(s)
    batch = hash_edges_from_pages(pages)
    want = batch.groupBy(F.window("warc_ts", "1 minute").alias("w")).agg(
        F.count("*").alias("n_links")
    )
    # every emitted window must match the batch count exactly
    joined = got.join(
        want.select(F.col("w.start").alias("window_start"), F.col("n_links").alias("want")),
        "window_start",
    )
    assert joined.count() == got.count()
    assert joined.filter(F.col("n_links") != F.col("want")).isEmpty()
    assert got.count() > 0


def test_stream_incremental_degree_stateful(spark, tmp_path):
    """applyInPandasWithState running degree must equal the batch
    degree after draining, and must accumulate across restarts."""
    pages, pages_dir = _write_pages_in_chunks(spark, tmp_path, n=200)
    from xdata_igraph_spark.streaming.ingest import stream_incremental_degree

    edges_stream = hash_edges_from_pages(
        spark.readStream.schema(
            spark.read.parquet(pages_dir).schema
        ).parquet(pages_dir)
    )
    out = str(tmp_path / "deg")
    ckpt = str(tmp_path / "deg_ckpt")
    stream_incremental_degree(edges_stream, ckpt, out).awaitTermination(120)
    got = (
        spark.read.parquet(out)
        .groupBy("src")
        .agg(F.max("degree").alias("degree"))
    )
    want = hash_edges_from_pages(pages).groupBy("src").agg(
        F.count("*").alias("degree")
    )
    diff = got.exceptAll(want)
    assert diff.isEmpty(), diff.limit(5).collect()

    # new arrivals accumulate on top of the restored state
    from xdata_igraph_spark.sources.corpus import synthetic_pages

    extra = synthetic_pages(spark, 260).filter(F.col("page_id") >= 200)
    extra.write.mode("append").parquet(pages_dir)
    stream_incremental_degree(edges_stream, ckpt, out).awaitTermination(120)
    got2 = (
        spark.read.parquet(out).groupBy("src").agg(F.max("degree").alias("degree"))
    )
    # link targets depend on n_pages, so the expected degrees come from
    # the union of the ACTUAL arrivals (pages(200) then extra-of-260)
    want2 = (
        hash_edges_from_pages(pages)
        .unionByName(hash_edges_from_pages(extra))
        .groupBy("src")
        .agg(F.count("*").alias("degree"))
    )
    assert got2.exceptAll(want2).isEmpty()
