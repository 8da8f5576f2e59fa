"""Round-6 optimization guards and equivalences.

- driver-protection guards must trip BEFORE any oversized collect
  (VERDICT r5 "what's wrong" #3: the old code collected first and
  checked after — the guard described the OOM instead of preventing
  it);
- the shuffle-free MinHash signature plan must equal the naive
  explode+groupBy specification bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def test_blocked_topk_guard_trips_before_collect(spark):
    from xdata_igraph_spark.operators.ann import cosine_topk_blocked

    emb = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="base_limit"):
        cosine_topk_blocked(emb, k=2, base_limit=10)


def test_graphlets_incidence_guard_trips_before_collect(spark):
    from xdata_igraph_spark.operators.graphlets import (
        graphlets_candidate_basis,
        graphlets_project,
    )

    g = LinkGraph.from_pairs(
        spark,
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0), (2, 3, 1.0)],
        directed=False,
    )
    basis = graphlets_candidate_basis(g)
    with pytest.raises(ValueError, match="max_incidence"):
        graphlets_project(g, basis, niter=1, max_incidence=1)


def test_graphlets_project_cid_minting_no_global_window(spark):
    # the cid mint must go through plans/ids.py (range-partitioned),
    # not a global Window.orderBy — and the projection result is
    # invariant to how cids are assigned
    from xdata_igraph_spark.operators.graphlets import (
        graphlets_candidate_basis,
        graphlets_project,
    )

    g = LinkGraph.from_pairs(
        spark,
        [(0, 1, 3.0), (1, 2, 3.0), (0, 2, 3.0), (2, 3, 1.0), (3, 4, 1.0)],
        directed=False,
    )
    basis = graphlets_candidate_basis(g)
    mu = {tuple(r["members"]): r["mu"] for r in graphlets_project(g, basis, niter=50).collect()}
    assert set(mu) == {tuple(r["members"]) for r in basis.collect()}
    assert all(v >= 0 for v in mu.values())


def test_minhash_signatures_match_naive_spec(spark):
    from xdata_igraph_spark.operators.dedup import (
        _hash32,
        _shingles,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different text with other words entirely"),
            (3, "ab"),  # < 3 tokens → no shingles → no signature row
            (4, None),  # null text → no signature row
        ],
        "doc_id long, text string",
    )

    # naive spec: explode every shingle, 8 md5-derived hashes, min per doc
    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), 3)).alias("sh")
    )
    aggs = [
        F.min(_hash32(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(8)
    ]
    naive = (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(8)]).alias("sig"))
    )

    got = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    want = {r["doc_id"]: r["sig"] for r in naive.collect()}
    assert got == want
    assert 3 not in got and 4 not in got
