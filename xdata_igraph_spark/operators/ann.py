"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline and the
  verification oracle. The dot product is a JVM-side ``zip_with`` +
  ``aggregate`` expression (no Python, stays in codegen); the k-NN
  selection is a window over the candidate pairs.
- ``srp_buckets`` / ``srp_topk``: signed-random-projection LSH — the
  scale path. Hyperplanes are minted deterministically (numpy seed),
  shipped as literal arrays; bucket = the sign-bit string. Candidates
  come from an equi-join on bucket (optionally multi-probe with
  rotated plane sets), then exact cosine reranks. At 10^12 rows the
  bucket join replaces the n² cross join; recall is tunable via
  #planes / #tables.

Multimodal note: image/audio/video columns ride the same pattern —
opaque binary + typed metadata, decode/feature-extract as mapInPandas
(see streaming/multimodal stubs in operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos_expr(a, b):
    """Cosine similarity of two array<float/double> columns, computed
    in double precision JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k by brute force.

    ``probe``: optional subset of query rows (same schema); default all.
    Ordering ties broken by ascending neighbor id (deterministic).
    """
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    q = (probe or embeddings).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    pairs = q.crossJoin(base).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", _cos_expr(F.col("qv"), F.col("nv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — signed-random-projection bucket string."""
    planes = _planes(dim, n_planes, seed)
    bits = []
    for p in planes:
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane_lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select(
        F.col(id_col).alias("id"), F.concat(*bits).alias("bucket")
    )


def srp_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — approximate top-k: union of
    ``n_tables`` independent SRP tables' bucket-join candidates, exact
    cosine rerank. Recall grows with n_tables; cost stays ∝ collisions."""
    cand = None
    for t in range(n_tables):
        b = srp_buckets(embeddings, n_planes, dim, seed=42 + t, id_col=id_col, vec_col=vec_col)
        t1 = b.select(F.col("id").alias("query_id"), "bucket")
        t2 = b.select(F.col("id").alias("neighbor_id"), "bucket")
        pairs = t1.join(t2, "bucket").filter(
            F.col("query_id") != F.col("neighbor_id")
        ).select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.union(pairs)
    cand = cand.distinct()
    qv = embeddings.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    nv = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", _cos_expr(F.col("qv"), F.col("nv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
