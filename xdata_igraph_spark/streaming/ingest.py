"""Structured-Streaming ingest: incremental pages → edge table.

The reference is a static-batch library (SURVEY.md §2.9) — nothing in
igraph streams. This module is the *engine-side* extension a live
Common-Crawl-style corpus needs: pages arrive continuously (WARC dumps
landing in object storage), and the link graph must grow incrementally
without re-extracting the whole corpus.

Design notes for 10^12-document scale:
- **Vertex ids are stable 64-bit hashes of the url** (``xxhash64``),
  not dense ranks: dense ranking needs a global sort over all urls ever
  seen — a batch-only operation. A 64-bit hash over ~10^12 urls has
  ~2.7% birthday-collision probability for the *entire corpus*
  (~10^-13 per pair); the batch pipeline (pipeline.py) keeps dense ids
  for igraph-exact numbering, and ``hash_edges_from_pages`` documents
  the mapping (url ↔ id dictionary is emitted alongside).
- Extraction reuses the SAME pandas UDFs as batch
  (functions/extract.py), so the per-url byte-identity contract holds
  on both paths.
- The stream is stateless per page (extraction is row-local), so no
  state store is needed for the edge stream itself; the windowed
  link-rate monitor uses a watermark + tumbling window
  (late pages accepted up to the watermark horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from xdata_igraph_spark.functions.extract import extract_links

PAGES_SCHEMA = (
    "page_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


def hash_edges_from_pages(pages: DataFrame) -> DataFrame:
    """pages → (src, dst, src_url, dst_url, warc_ts) with hash ids.

    Works identically on a static DataFrame and a streaming one (all
    operations are stateless row-local projections)."""
    links = pages.select(
        F.col("url").alias("src_url"),
        F.col("warc_ts"),
        F.explode(extract_links("html")).alias("dst_url"),
    ).filter(F.col("src_url") != F.col("dst_url"))
    return links.select(
        F.xxhash64("src_url").alias("src"),
        F.xxhash64("dst_url").alias("dst"),
        "src_url",
        "dst_url",
        "warc_ts",
    )


def stream_pages_to_edges(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally extract edges from page files landing in
    ``pages_dir``; append parquet to ``out_dir``.

    ``available_now=True`` drains everything currently present and
    stops (batch-like test/backfill mode); ``False`` runs continuous
    micro-batches. Exactly-once via the checkpoint + file-sink log."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .option("path", pages_dir)
        .load()
    )
    edges = hash_edges_from_pages(pages)
    writer = (
        edges.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_link_rate(
    spark: SparkSession,
    pages_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming link-emission rate: tumbling-window count of extracted
    links by crawl timestamp, late data admitted up to ``watermark``.

    Returns the unstarted streaming DataFrame; callers attach a sink
    (memory sink in tests, Kafka/Parquet in production)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .option("path", pages_dir)
        .load()
    )
    edges = hash_edges_from_pages(pages)
    return (
        edges.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(F.count("*").alias("n_links"))
        .select(F.col("w.start").alias("window_start"), "n_links")
    )


def stream_incremental_degree(
    edges_stream: DataFrame,
    checkpoint: str,
    out_path: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Custom stateful streaming operator: running out-degree per src
    across micro-batches via ``applyInPandasWithState`` (the engine's
    GroupState path for operators Spark lacks built-in).

    State per src is ONE long (the cumulative degree) — the Arrow
    batch carries only the group's new arrivals, so state size is
    O(distinct active src), independent of stream length. Emits one
    (src, degree) row per src per micro-batch in which it changed
    (``update`` semantics) to a parquet append sink.

    At crawl scale the state store is RocksDB-backed per partition
    and the grouping shuffle is the same hash partitioning every
    stateful Spark aggregation pays; no igraph analogue exists (the
    reference is batch-only — SURVEY §2.9), this is the
    engine-extension path.
    """
    import pandas as pd  # noqa: F401 — imported for the worker closure
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        import pandas as pd

        total = state.get[0] if state.exists else 0
        new = 0
        for pdf in pdf_iter:
            new += len(pdf)
        if new:
            total += new
            state.update((total,))
        yield pd.DataFrame({"src": [key[0]], "degree": [total]})

    updates = edges_stream.select("src").groupBy("src").applyInPandasWithState(
        update,
        outputStructType="src long, degree long",
        stateStructType="degree long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    def _append_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    # update-mode stateful output; the parquet sink is append-only, so
    # per-batch rows land via foreachBatch (the standard pairing)
    writer = (
        updates.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
