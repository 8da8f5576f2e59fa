"""Graphlet decomposition — the XDATA fork's overlapping dense-group
model for weighted undirected graphs.

Reference: igraph_graphlets / igraph_graphlets_candidate_basis /
igraph_graphlets_project (/root/reference/src/glet.c:828, basis :542,
projection :774; recursion :321, non-maximal filter :442). The
reference's own test suite states the semantic contract in naive form
(interfaces/R/igraph/inst/tests/test_graphlets.R, `graphlets.old`):

- **candidate basis** = the union, over every distinct edge weight w,
  of the maximal cliques (size ≥ 2) of the subgraph keeping edges with
  weight ≥ w, deduplicated. Each basis clique's threshold is its
  minimum internal edge weight — the largest w at which it still
  exists (the reference's Zachary test proves the recursive C
  implementation equals this spec).
- **projection** = multiplicative weight updates: with Mu[c] init 1,
  per iteration w_e = 1e-4 + Σ_{c ∋ e} Mu[c] over the clique-incident
  edges, then Mu[c] *= (Σ_{e ∈ c} weight_e / w_e) / (n_c·(n_c+1)/2).

Distributed strategy: the scale-heavy step is clique enumeration over
the big graph — that reuses the guarded level-synchronous machinery of
operators/cliques.py, once per distinct threshold (the threshold count
is a small data property of weighted link graphs — co-occurrence
counts, similarity buckets — and is guarded). A clique C is in the
basis iff C is maximal in the ≥t subgraph for t = C's minimum internal
weight, so maximality is ONE weight-aware anti-join instead of a
per-threshold filter. The projection iterates over the basis-incident
edge list, whose size is Σ|c|² over basis cliques — data that is tiny
relative to the graph (the reference's projection is a sequential
in-memory loop too); the incidence build is distributed joins, the
iteration a guarded vectorized driver solve, flow.py-style.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _simple_weighted_und(graph: LinkGraph) -> DataFrame:
    """Canonical undirected weighted edges (a < b, weight) — raises on
    self-loops / multi-edges like the reference (glet.c:560)."""
    e = graph.edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        "weight",
    )
    bad = (
        e.filter(F.col("a") == F.col("b")).limit(1).count()
        or e.groupBy("a", "b").count().filter(F.col("count") > 1).limit(1).count()
    )
    if bad:
        raise ValueError(
            "graphlets work on simple graphs only (no self-loops / multi-edges)"
        )
    return e


def graphlets_candidate_basis(
    graph: LinkGraph,
    max_thresholds: int = 64,
) -> DataFrame:
    """Candidate graphlet basis → (members array<bigint> sorted, thr).

    igraph_graphlets_candidate_basis (/root/reference/src/glet.c:542)
    via the equivalent per-threshold characterization (see module
    docstring). ``max_thresholds`` guards the number of distinct edge
    weights (one guarded clique enumeration each).
    """
    spark = graph.spark
    e = _simple_weighted_und(graph)

    thrs = [r[0] for r in e.select("weight").distinct().limit(max_thresholds + 1).collect()]
    if len(thrs) > max_thresholds:
        raise ValueError(
            f"graphlets: more than {max_thresholds} distinct edge weights; "
            "bucket the weights or raise max_thresholds explicitly"
        )
    thrs = sorted(thrs)

    from xdata_igraph_spark.operators.cliques import maximal_cliques

    found = None
    for w in thrs:
        sub = LinkGraph(
            e.filter(F.col("weight") >= w).select(
                F.col("a").alias("src"), F.col("b").alias("dst")
            ),
            directed=False,
        )
        mc = maximal_cliques(sub, min_size=2).select(
            F.sort_array("members").alias("members")
        )
        found = mc if found is None else found.unionByName(mc)
    if found is None:
        return spark.createDataFrame([], "members array<bigint>, thr double")
    basis = found.distinct().localCheckpointFlat(eager=True)

    # thr = min internal edge weight: explode ordered member pairs,
    # join the weighted edge table
    pairs = (
        basis.select("members", F.explode("members").alias("a"))
        .select("members", "a", F.explode("members").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )
    return (
        pairs.join(e, ["a", "b"])
        .groupBy("members")
        .agg(F.min("weight").alias("thr"))
    )


def graphlets_project(
    graph: LinkGraph,
    basis: DataFrame,
    niter: int = 1000,
    mu0: DataFrame | None = None,
    max_incidence: int = 5_000_000,
) -> DataFrame:
    """Project the graph on a clique basis → (members, mu).

    igraph_graphlets_project (/root/reference/src/glet.c:774, inner
    loop :744-776). ``basis`` is (members, ...) as returned by
    ``graphlets_candidate_basis`` (extra columns ignored); ``mu0``
    optionally supplies start weights as (members, mu). The
    clique/edge incidence is built distributedly; the multiplicative
    iteration itself runs vectorized on the driver over the collected
    incidence triples, guarded by ``max_incidence`` (the projection
    touches only basis-incident edges — data far smaller than the
    graph; the reference's loop is sequential in-memory too).
    """
    spark = graph.spark
    e = _simple_weighted_und(graph)

    # clique ids minted scale-safely (range-partition + prefix offsets,
    # plans/ids.py) — no single-partition global window
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    b = zip_dense_ids(
        basis.select("members"), ["members"], out_col="cid"
    ).select("members", F.col("cid").cast("int").alias("cid"))

    vc = b.select("cid", F.explode("members").alias("v"))
    # an edge belongs to clique c iff both endpoints do (the reference
    # intersects the endpoints' clique lists — glet.c:694-720)
    inc = (
        e.join(vc.select(F.col("v").alias("a"), "cid"), "a")
        .join(vc.select(F.col("v").alias("b"), F.col("cid").alias("cid2")), "b")
        .filter(F.col("cid") == F.col("cid2"))
        .select("a", "b", "weight", "cid")
    )
    inc = inc.localCheckpointFlat(eager=True)
    # guard BEFORE collecting: the count runs distributed; the collect
    # only happens once the size is known to fit the driver
    n_inc = inc.count()
    if n_inc > max_incidence:
        raise ValueError(
            f"graphlets_project: incidence size {n_inc} exceeds "
            f"max_incidence={max_incidence}"
        )
    rows = inc.collect()
    sizes = {r["cid"]: len(r["members"]) for r in b.collect()}
    nc = len(sizes)
    if nc == 0:
        return basis.select("members").withColumn("mu", F.lit(0.0))

    eidx: dict[tuple, int] = {}
    ew: list[float] = []
    pair_e: list[int] = []
    pair_c: list[int] = []
    for r in rows:
        key = (r["a"], r["b"])
        if key not in eidx:
            eidx[key] = len(ew)
            ew.append(float(r["weight"]))
        pair_e.append(eidx[key])
        pair_c.append(r["cid"])
    ne = len(ew)
    ewv = np.array(ew)
    pe = np.array(pair_e, dtype=np.int64)
    pc = np.array(pair_c, dtype=np.int64)
    norm = np.array([sizes[c] * (sizes[c] + 1) / 2.0 for c in range(nc)])

    mu = np.ones(nc)
    if mu0 is not None:
        got = {tuple(r["members"]): float(r["mu"]) for r in mu0.collect()}
        for r in b.collect():
            mu[r["cid"]] = got.get(tuple(r["members"]), 1.0)
    for _ in range(niter):
        wsum = 1e-4 + np.bincount(pe, weights=mu[pc], minlength=ne)
        ratio = np.bincount(pc, weights=(ewv / wsum)[pe], minlength=nc)
        mu = mu * ratio / norm
    mu_df = spark.createDataFrame(
        [(int(c), float(mu[c])) for c in range(nc)], "cid int, mu double"
    )
    return b.join(mu_df, "cid").select("members", "mu")


def graphlets(graph: LinkGraph, niter: int = 1000) -> DataFrame:
    """Basis + projection, ordered by descending graphlet weight →
    (members, thr, mu) (igraph_graphlets,
    /root/reference/src/glet.c:828)."""
    basis = graphlets_candidate_basis(graph).localCheckpointFlat(eager=True)
    mu = graphlets_project(graph, basis, niter=niter)
    return basis.join(mu, "members").orderBy(F.desc("mu"), "members")
