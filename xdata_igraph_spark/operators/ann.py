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


def _dot_expr(a, b):
    """Left-fold dot product of two array<float/double> columns in
    double precision (sequential fold — the summation-order contract
    every caller and the DuckDB oracle share)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a):
    """Euclidean norm of an array column, same left-fold order."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def _cos_expr(a, b):
    """Cosine similarity of two array<float/double> columns, computed
    in double precision JVM-side."""
    return _dot_expr(a, b) / (_norm_expr(a) * _norm_expr(b))


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
    from xdata_igraph_spark.plans.parallel import ensure_min_parallelism

    embeddings = ensure_min_parallelism(embeddings)
    # norms folded once per row on each side, not per pair (see
    # srp_topk; dot/(na*nb) over identical operands — bit-identical)
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        _norm_expr(F.col(vec_col)).alias("nn"),
    )
    q = (probe or embeddings).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_expr(F.col(vec_col)).alias("qn"),
    )
    pairs = q.crossJoin(base).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot_expr(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cosine"),
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


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """LONG sign-bit pattern: bit j set iff dot(vec, plane_j) >= 0.
    A long key hash-joins and XOR-flips JVM-side — no string concat,
    no string shuffle keys (r4 perf lesson: string buckets + a
    9-branch multiprobe UNION made srp_topk compile-bound)."""
    bits = None
    for j, p in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane_lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        b = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = b if bits is None else bits + b
    return bits.cast("long")


def srp_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — signed-random-projection bucket as a LONG bit
    pattern (bit j = sign of the j-th hyperplane dot product)."""
    return embeddings.select(
        F.col(id_col).alias("id"),
        _bucket_expr(vec_col, _planes(dim, n_planes, seed)).alias("bucket"),
    )


def srp_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — approximate top-k: union of
    ``n_tables`` independent SRP tables' bucket-join candidates, exact
    cosine rerank. Recall grows with n_tables; cost stays ∝ collisions.

    ``multiprobe``: probe radius — the query side also joins buckets
    whose sign-string differs in ≤ that many bits (Lv et al., VLDB'07:
    a near neighbor that "just missed" a plane lands one bit away far
    more often than a random point). Radius 1 multiplies probe keys by
    (1 + n_planes) while candidate volume still scales with true
    collisions — the standard recall lever when neighbors are weak
    (recall is inherently data-dependent: ~0.9+ per table at cosine
    0.95 near-dups, low on uniformly random vectors).
    """
    if multiprobe < 0 or multiprobe > 2:
        raise ValueError("multiprobe radius supported: 0, 1, 2")
    import itertools as _it

    from xdata_igraph_spark.plans.parallel import ensure_min_parallelism

    # the n_tables x n_planes x dim bucket dot products and the rerank's
    # vector folds all fuse into this input's scan stage; a single-file
    # embedding table would run them on one core (no-op at scale)
    embeddings = ensure_min_parallelism(embeddings)

    # All tables' buckets in ONE pass: per-table LONG keys tagged with
    # the table id in the high bits (bucket < 2^n_planes, so
    # t << n_planes never collides across tables and XOR probe flips
    # only touch the low bits). The probe variants are a single
    # exploded array of XOR masks — one plan branch total, vs r4's
    # (1 + probes)·tables UNION of string-keyed branches.
    masks = [0]
    for r in range(1, multiprobe + 1):
        for fl in _it.combinations(range(n_planes), r):
            m = 0
            for pos in fl:
                m |= 1 << pos
            masks.append(m)

    bcols = [
        (
            _bucket_expr(vec_col, _planes(dim, n_planes, seed=42 + t))
            + F.lit(t << n_planes)
        ).alias(f"b{t}")
        for t in range(n_tables)
    ]
    # lazy checkpoint: the bucket table feeds BOTH the base and the
    # probe branch of the candidate join — without it each branch
    # re-evaluates the n_tables x n_planes x dim projection folds
    # (the table is (id, n_tables longs), far smaller than the input)
    b = embeddings.select(F.col(id_col).alias("id"), *bcols).localCheckpoint(False)

    base = b.select(
        F.col("id").alias("neighbor_id"),
        F.explode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("key"),
    )
    if multiprobe:
        probes = b.select(
            F.col("id").alias("query_id"),
            F.explode(
                F.flatten(
                    F.array(
                        *[
                            F.array(
                                *[
                                    F.col(f"b{t}").bitwiseXOR(F.lit(m))
                                    for m in masks
                                ]
                            )
                            for t in range(n_tables)
                        ]
                    )
                )
            ).alias("key"),
        )
    else:
        probes = base.select(F.col("neighbor_id").alias("query_id"), "key")
    # candidate pairs are symmetric (bucket_q XOR m == bucket_n iff
    # bucket_n XOR m == bucket_q — the probe mask set is its own
    # mirror), so each unordered pair is kept ONCE and the exact rerank
    # runs half as many cosine folds; both directions are emitted after
    # scoring (dot/zip_with is commutative elementwise with the same
    # fold order, so the mirrored cosine is bit-identical)
    cand = (
        probes.join(base, "key")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            F.least("query_id", "neighbor_id").alias("query_id"),
            F.greatest("query_id", "neighbor_id").alias("neighbor_id"),
        )
        .distinct()
    )
    # per-vector norms once (n rows), not per candidate pair (r6: the
    # rerank previously re-folded BOTH norms for every pair — with ~n²/7
    # candidates on clustered data that tripled the interpreted
    # higher-order-function work; cosine = dot/(na*nb) over identical
    # operands, so values are bit-identical)
    sides = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(F.col(vec_col)).alias("nrm"),
    )
    qv = sides.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    nv = sides.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("nv"), F.col("nrm").alias("nn")
    )
    scored_half = (
        cand.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot_expr(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cosine"),
        )
    )
    # both directions from ONE evaluation of the scored pairs (a union
    # of two selects would re-run the rerank folds per branch)
    scored = scored_half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("query_id").alias("query_id"),
                    F.col("neighbor_id").alias("neighbor_id"),
                ),
                F.struct(
                    F.col("neighbor_id").alias("query_id"),
                    F.col("query_id").alias("neighbor_id"),
                ),
            )
        ).alias("p"),
        "cosine",
    ).select("p.query_id", "p.neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk_blocked(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe: DataFrame | None = None,
    base_limit: int = 2_000_000,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k via blocked matrix
    multiply: the base matrix is broadcast to executors and each probe
    partition computes a numpy GEMM + argpartition per Arrow batch.

    This is the throughput-oriented exact baseline: ``cosine_topk``'s
    per-pair ``zip_with``/``aggregate`` expressions are interpreted
    (higher-order functions sit outside whole-stage codegen), ~100x
    slower than BLAS. At 10^12 rows the base side no longer fits one
    broadcast — the same kernel then runs per IVF/LSH bucket, which is
    exactly ``srp_topk``'s rerank stage; ``base_limit`` guards the
    driver collect.
    """
    import numpy as np

    spark = embeddings.sparkSession
    # guard fused into the collect: limit(base_limit + 1) bounds what
    # can ever reach the driver to the tolerated size, so an oversized
    # base side raises after materializing AT MOST one row past the
    # limit — same OOM protection as a separate distributed count, one
    # Spark job instead of two (r6: the count + eager checkpoint pair
    # this replaces tripled the query at bench scale)
    base_rows = embeddings.select(id_col, vec_col).limit(base_limit + 1).collect()
    if len(base_rows) > base_limit:
        raise ValueError(
            f"base side exceeds base_limit={base_limit}; "
            "use srp_topk (bucketed) at this scale"
        )
    ids = np.array([r[0] for r in base_rows], dtype=np.int64)
    mat = np.array([r[1] for r in base_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)

    # NOTE: deliberately no repartition of the probe side — the BLAS
    # GEMM kernel is so fast per batch that the exchange a repartition
    # adds costs more than single-task execution at probe scale, and a
    # large probe side arrives multi-partition from its file layout
    # anyway (measured r6: a forced 32-way spread of the 200-row bench
    # probe tripled the query)
    q = (probe or embeddings).select(id_col, vec_col)

    def block(batches):
        import pandas as pd

        ids_l = b_ids.value
        base = b_mat.value
        order = np.argsort(ids_l, kind="stable")
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            qm = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            sims = (qm / qn[:, None]) @ base.T
            out_q, out_n, out_c = [], [], []
            for i in range(len(qids)):
                row = sims[i]
                # exclude self, deterministic ties (desc cosine, asc id)
                mask = ids_l != qids[i]
                cand_idx = np.flatnonzero(mask)
                vals = row[cand_idx]
                kk = min(k, len(cand_idx))
                if kk == 0:
                    continue
                # everything tied-or-better than the kth value, then the
                # deterministic (desc cosine, asc id) order — exact even
                # under ties at the cut
                kthval = np.partition(vals, len(vals) - kk)[len(vals) - kk]
                sel = cand_idx[vals >= kthval]
                key = sorted(zip(-row[sel], ids_l[sel]))[:kk]
                for negc, nid in key:
                    out_q.append(qids[i])
                    out_n.append(int(nid))
                    out_c.append(-negc)
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    return q.mapInPandas(
        block, "query_id long, neighbor_id long, cosine double"
    )
