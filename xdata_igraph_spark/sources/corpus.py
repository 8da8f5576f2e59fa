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
