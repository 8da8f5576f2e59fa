"""Graphlet decomposition vs the reference's own naive-spec oracles
(/root/reference/interfaces/R/igraph/inst/tests/test_graphlets.R:
`graphlets.old` for the basis, `graphlets.project.old` for the
projection — both transcribed here as plain-Python oracles)."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.graphlets import (
    graphlets,
    graphlets_candidate_basis,
    graphlets_project,
)


def _g(spark, wedges):
    df = spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in wedges],
        "src long, dst long, weight double",
    )
    return LinkGraph(df, directed=False)


def _basis_rows(df):
    return sorted(
        (tuple(r["members"]), r["thr"]) for r in df.collect()
    )


# ---------------------------------------------------------------------------
# naive oracles, straight from the reference's R test file
# ---------------------------------------------------------------------------


def _max_cliques(vertices, adj):
    """All maximal cliques by brute force (test graphs are tiny)."""
    vs = sorted(vertices)
    cliques = []
    for r in range(2, len(vs) + 1):
        for comb in itertools.combinations(vs, r):
            if all(b in adj[a] for a, b in itertools.combinations(comb, 2)):
                cliques.append(set(comb))
    return [
        c
        for c in cliques
        if not any(c < other for other in cliques)
    ]


def _naive_basis(wedges):
    weights = sorted({w for _, _, w in wedges})
    found = set()
    for t in weights:
        keep = [(a, b) for a, b, w in wedges if w >= t]
        adj = {}
        for a, b in keep:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for c in _max_cliques(adj.keys(), adj):
            found.add(tuple(sorted(c)))
    wmap = {}
    for a, b, w in wedges:
        wmap[(min(a, b), max(a, b))] = w
    return sorted(
        (c, min(wmap[(a, b)] for a, b in itertools.combinations(c, 2)))
        for c in found
    )


def _naive_project(wedges, cliques, niter, mu0=None):
    """graphlets.project.old, vectorized."""
    wmap = {}
    for a, b, w in wedges:
        wmap[(min(a, b), max(a, b))] = w
    mu = np.ones(len(cliques)) if mu0 is None else np.array(mu0, dtype=float)
    inc = []  # (edge_key, cid)
    for ci, c in enumerate(cliques):
        for a, b in itertools.combinations(sorted(c), 2):
            if (a, b) in wmap:
                inc.append(((a, b), ci))
    ekeys = sorted({k for k, _ in inc})
    eidx = {k: i for i, k in enumerate(ekeys)}
    ew = np.array([wmap[k] for k in ekeys])
    pe = np.array([eidx[k] for k, _ in inc], dtype=int)
    pc = np.array([ci for _, ci in inc], dtype=int)
    norm = np.array([len(c) * (len(c) + 1) / 2.0 for c in cliques])
    for _ in range(niter):
        wsum = 1e-4 + np.bincount(pe, weights=mu[pc], minlength=len(ekeys))
        ratio = np.bincount(pc, weights=(ew / wsum)[pe], minlength=len(cliques))
        mu = mu * ratio / norm
    return mu


# ---------------------------------------------------------------------------
# the reference's exact fixtures
# ---------------------------------------------------------------------------


def test_basis_full5_uniform(spark):
    wedges = [(a, b, 1.0) for a, b in itertools.combinations(range(5), 2)]
    got = _basis_rows(graphlets_candidate_basis(_g(spark, wedges)))
    assert got == [((0, 1, 2, 3, 4), 1.0)]


def test_basis_full5_one_heavy_edge(spark):
    wedges = [
        (a, b, 2.0 if (a, b) == (0, 1) else 1.0)
        for a, b in itertools.combinations(range(5), 2)
    ]
    got = _basis_rows(graphlets_candidate_basis(_g(spark, wedges)))
    assert got == [((0, 1), 2.0), ((0, 1, 2, 3, 4), 1.0)]


def test_basis_filter_fixture(spark):
    # A=0 B=1 C=2 D=3 E=4 — reference "Graphlets filtering works"
    wedges = [
        (0, 1, 8), (0, 2, 8), (1, 2, 8),
        (1, 3, 5), (1, 4, 5), (2, 3, 5), (2, 4, 5), (3, 4, 5),
    ]
    got = _basis_rows(graphlets_candidate_basis(_g(spark, wedges)))
    assert got == [((0, 1, 2), 8.0), ((1, 2, 3, 4), 5.0)]


def test_basis_random_vs_naive(spark):
    rng = np.random.default_rng(4242)
    n = 12
    wedges = [
        (a, b, float(rng.integers(1, 6)))
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.35
    ]
    got = _basis_rows(graphlets_candidate_basis(_g(spark, wedges)))
    assert got == _naive_basis(wedges)


def test_rejects_non_simple(spark):
    g = _g(spark, [(0, 1, 1.0), (1, 0, 2.0)])
    with pytest.raises(ValueError, match="simple"):
        graphlets_candidate_basis(g)


def test_projection_overlapping_blocks(spark):
    # reference "Graphlet projection works": D1+D2+D3 block overlay
    A = np.zeros((5, 5))
    A[0:3, 0:3] += 2
    A[2:5, 2:5] += 3
    A[1:5, 1:5] += 1
    wedges = [
        (a, b, float(A[a, b]))
        for a, b in itertools.combinations(range(5), 2)
        if A[a, b] > 0
    ]
    g = _g(spark, wedges)
    basis = graphlets_candidate_basis(g)
    rows = sorted(
        (tuple(r["members"]), r["thr"]) for r in basis.collect()
    )
    cliques = [c for c, _ in rows]
    want_mu = _naive_project(wedges, cliques, niter=1000)

    got = {
        tuple(r["members"]): r["mu"]
        for r in graphlets_project(g, basis, niter=1000).collect()
    }
    assert set(got) == set(cliques)
    for c, m in zip(cliques, want_mu):
        assert got[c] == pytest.approx(m, rel=1e-9)

    # end-to-end wrapper: ordered by descending mu
    full = graphlets(g, niter=1000)
    mus = [r["mu"] for r in full.collect()]
    assert mus == sorted(mus, reverse=True)


def test_project_start_mu(spark):
    wedges = [(0, 1, 4.0), (1, 2, 4.0), (0, 2, 4.0), (2, 3, 1.0)]
    g = _g(spark, wedges)
    basis = graphlets_candidate_basis(g).localCheckpointFlat(eager=True)
    rows = sorted(tuple(r["members"]) for r in basis.collect())
    mu0_df = basis.select("members", F.lit(2.0).alias("mu"))
    got = {
        tuple(r["members"]): r["mu"]
        for r in graphlets_project(g, basis, niter=50, mu0=mu0_df).collect()
    }
    want = _naive_project(wedges, rows, niter=50, mu0=[2.0] * len(rows))
    for c, m in zip(rows, want):
        assert got[c] == pytest.approx(m, rel=1e-9)
