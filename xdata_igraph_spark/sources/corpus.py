"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the ``pages(url, warc_ts, html, text, lang)`` table entirely
with Spark column expressions (seeded ``xxhash64`` — Spark's builtin
uses seed 42, matching the spec), so the same N produces bit-identical
pages on any cluster size. At production scale the corpus would be an
Iceberg table of Common-Crawl pages with the same schema
(BASELINE.json input_hint); this generator is the sandbox stand-in.

The ``text`` column is built **independently** of ``html`` (from the
same parts, not by parsing), so the pandas-UDF extractor in
functions/extract.py has a true byte-identity oracle: for every url,
``extract_text(html) == text`` must hold byte-for-byte.

Out-degrees are power-law-ish with hubs — 1% of pages get 50-249
out-links (FIXTURES.md: exercise skew/salting); targets are uniform
hashes over [0, N), self-links permitted in html but dropped at edge
build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_SITES = 100


def _url_expr(pid):
    """https://site{s:04d}.example/p{k:06d}, s = pid % N_SITES."""
    return F.concat(
        F.lit("https://site"),
        F.lpad((pid % N_SITES).cast("string"), 4, "0"),
        F.lit(".example/p"),
        F.lpad(pid.cast("string"), 6, "0"),
    )


def synthetic_pages(spark: SparkSession, n_pages: int) -> DataFrame:
    """pages(page_id, url, warc_ts, html binary, text, lang) — FIXTURES.md §1."""
    pid = F.col("page_id")
    h1 = F.xxhash64(pid)  # Spark xxhash64 seed = 42
    d = (
        F.when(pid % 100 == 0, F.lit(50) + F.pmod(h1, F.lit(200)))
        .otherwise(F.lit(1) + F.pmod(h1, F.lit(5)))
        .cast("int")
    )

    df = (
        spark.range(n_pages)
        .withColumnRenamed("id", "page_id")
        .withColumn("url", _url_expr(pid))
        .withColumn(
            "warc_ts",
            (F.lit(1767225600) + pid).cast("timestamp"),  # 2026-01-01T00:00:00Z + pid s
        )
        .withColumn("lang", F.when(pid % 10 == 3, "de").otherwise("en"))
        .withColumn("n_links", d)
        .withColumn(
            "link_targets",
            F.transform(
                F.sequence(F.lit(1), F.col("n_links")),
                lambda j: F.pmod(F.xxhash64(pid, j.cast("long")), F.lit(n_pages)),
            ),
        )
        .withColumn("link_urls", F.transform(F.col("link_targets"), _url_expr))
    )

    anchor_tags = F.array_join(
        F.zip_with(
            F.col("link_urls"),
            F.sequence(F.lit(1), F.col("n_links")),
            lambda u, j: F.concat(
                F.lit('<a href="'), u, F.lit('">L'), j.cast("string"), F.lit("</a>")
            ),
        ),
        "\n",
    )
    html_str = F.concat(
        F.lit("<html><head><title>T"),
        pid.cast("string"),
        F.lit("</title></head><body>\n<p>para "),
        pid.cast("string"),
        F.lit(" alpha</p>\n"),
        anchor_tags,
        F.lit("\n<p>para "),
        pid.cast("string"),
        F.lit(" omega</p>\n</body></html>"),
    )
    # text built from parts, NOT by parsing html — the extraction
    # spec applied to this grammar yields exactly this string
    anchor_texts = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.col("n_links")),
            lambda j: F.concat(F.lit("L"), j.cast("string")),
        ),
        " ",
    )
    text_str = F.concat(
        F.lit("T"),
        pid.cast("string"),
        F.lit(" para "),
        pid.cast("string"),
        F.lit(" alpha "),
        anchor_texts,
        F.lit(" para "),
        pid.cast("string"),
        F.lit(" omega"),
    )

    return df.select(
        "page_id",
        "url",
        "warc_ts",
        F.encode(html_str, "UTF-8").alias("html"),
        text_str.alias("text"),
        "lang",
    )


PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages corpus (BASELINE.json input_hint schema) from an
    Iceberg/catalog table or a parquet path.

    - ``source`` without a ``/`` is a catalog table identifier
      (``catalog.db.pages``): resolved by ``spark.read.table`` — an
      Iceberg table when an Iceberg catalog is configured on the
      session, and equally a Hive table or temp view. This is the
      production path: snapshot isolation, hidden partitioning
      (``days(warc_ts)`` / ``bucket(url)``) and partition pruning all
      come from the catalog, not from this engine.
    - ``source`` with a ``/`` (or a ``.parquet`` suffix) is a path:
      read with the Iceberg
      DataSource if the runtime ships the connector, else plain
      parquet (this sandbox has no Iceberg jar — the fallback IS the
      tested path; the connector branch is format negotiation only).

    Output is projected to the input_hint columns (plus ``page_id``
    when present — the synthetic corpus carries it) so downstream
    extractors see one schema regardless of the physical source;
    missing required columns raise ValueError naming them.
    """
    looks_like_path = "/" in source or source.endswith(".parquet")
    if looks_like_path:
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as exc:
            # fall back to parquet ONLY when the Iceberg connector is
            # absent; a present-but-failing connector (corrupt
            # metadata, auth) must surface, not silently re-read the
            # directory as raw parquet ignoring snapshot/delete files
            msg = f"{type(exc).__name__}: {exc}"
            connector_missing = (
                "Failed to find data source" in msg
                or "DATA_SOURCE_NOT_FOUND" in msg
                or "ClassNotFoundException" in msg
            )
            if not connector_missing:
                raise
            df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)

    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages source {source!r} lacks required columns {missing}; "
            f"expected (url string, warc_ts timestamp, html binary, "
            f"text string, lang string)"
        )
    keep = (["page_id"] if "page_id" in df.columns else []) + list(PAGES_COLUMNS)
    return df.select(*keep)
