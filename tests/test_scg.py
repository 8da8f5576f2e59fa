"""SCG: grouping algorithms vs numpy reimplementations, semiprojector
coarse products vs dense L·M·Rᵀ, and eigenvalue recovery on the three
matrix types (reference /root/reference/src/scg.c + method papers)."""

import numpy as np
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.scg import (
    _dp_1d_groups,
    scg_adjacency,
    scg_grouping,
    scg_laplacian,
    scg_stochastic,
)
from tests.oracles import gnm_edges


def _vec_df(spark, values, col="x0"):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], f"id long, {col} double"
    )


def _groups_of(df):
    return {int(r["id"]): int(r["group"]) for r in df.collect()}


def test_exact_grouping_groups_equal_components(spark):
    v = _vec_df(spark, [0.5, 0.2, 0.5, 0.2, 0.9])
    g = _groups_of(scg_grouping(v, nt=3, algo="exact"))
    # dense first-appearance: id0 (0.5)→0, id1 (0.2)→1, id4 (0.9)→2
    assert g == {0: 0, 1: 1, 2: 0, 3: 1, 4: 2}


def test_interval_grouping_constant_bins(spark):
    # vmin=0, vmax=9, nt=2 → eps=4.5: bins [0,4.5) and [4.5,9]
    v = _vec_df(spark, range(10))
    g = _groups_of(scg_grouping(v, nt=2, algo="interval"))
    assert [g[i] for i in range(10)] == [0] * 5 + [1] * 5


def test_multi_vector_intersection(spark):
    # two eigenvectors, 2 bins each → final groups are the bin-pair
    # classes (scg.c:295: co-grouped iff co-grouped in EVERY partition)
    rows = [(i, float(i < 4), float(i % 2)) for i in range(8)]
    v = spark.createDataFrame(rows, "id long, x0 double, x1 double")
    g = _groups_of(scg_grouping(v, nt=2, algo="interval"))
    classes = {}
    for i in range(8):
        classes.setdefault((i < 4, i % 2), set()).add(i)
    got = {}
    for i, lab in g.items():
        got.setdefault(lab, set()).add(i)
    assert sorted(map(sorted, got.values())) == sorted(
        map(sorted, classes.values())
    )
    # first-appearance numbering: vertex 0's group is 0
    assert g[0] == 0


def test_interval_km_refines_toward_natural_clusters(spark):
    # two tight value clusters placed asymmetrically inside [0,1]: the
    # constant-interval cut at 0.5 splits cluster B; Lloyd recovers it
    vals = [0.0, 0.02, 0.04, 0.45, 0.55, 0.6, 0.58, 0.52]
    v = _vec_df(spark, vals)
    g = _groups_of(scg_grouping(v, nt=2, algo="interval_km"))
    assert g[0] == g[1] == g[2]
    assert g[3] == g[4] == g[5] == g[6] == g[7]
    assert g[0] != g[3]


def test_optimum_dp_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    v = rng.rand(12)
    w = np.ones(12)
    lab = _dp_1d_groups(v, w, 3)

    def cost(labels):
        c = 0.0
        for gidx in set(labels):
            m = v[labels == gidx]
            c += float(((m - m.mean()) ** 2).sum())
        return c

    # brute force over all contiguous 3-partitions of the sorted order
    order = np.argsort(v)
    best = np.inf
    n = len(v)
    for a in range(1, n - 1):
        for b in range(a + 1, n):
            labels = np.zeros(n, dtype=int)
            labels[order[a:b]] = 1
            labels[order[b:]] = 2
            best = min(best, cost(labels))
    assert abs(cost(lab) - best) < 1e-12


def test_optimum_grouping_end_to_end_and_guard(spark):
    v = _vec_df(spark, [0.0, 0.1, 0.05, 5.0, 5.2, 9.9])
    g = _groups_of(scg_grouping(v, nt=3, algo="optimum"))
    assert g[0] == g[1] == g[2]
    assert g[3] == g[4]
    assert g[5] not in (g[0], g[3])
    try:
        scg_grouping(v, nt=2, algo="optimum", max_vertices=3)
        assert False, "guard should have fired"
    except ValueError as e:
        assert "guard" in str(e)


def _dense_adj(n, edges, directed=False):
    A = np.zeros((n, n))
    for s, d, w in edges:
        A[s, d] += w
        if not directed:
            A[d, s] += w
    return A


def _coarse_dense(M, groups, lrow, rrow):
    k = max(groups.values()) + 1
    n = M.shape[0]
    L = np.zeros((k, n))
    R = np.zeros((k, n))
    for i in range(n):
        L[groups[i], i] = lrow[i]
        R[groups[i], i] = rrow[i]
    return L @ M @ R.T


def _edges_to_dense(rows, k):
    M = np.zeros((k, k))
    for r in rows:
        M[int(r["src"]), int(r["dst"])] += float(r["weight"])
    return M


def test_scg_adjacency_coarse_matrix_matches_dense(spark):
    n, edges = 18, gnm_edges(18, 40, directed=False, seed=2)
    g = LinkGraph(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
        ),
        directed=False,
        n=n,
    )
    manual = spark.createDataFrame(
        [(i, i % 3) for i in range(n)], "id long, group long"
    )
    out = scg_adjacency(g, no=2, nt=2, groups=manual)
    A = _dense_adj(n, [(s, d, 1.0) for s, d in edges])
    gmap = {i: i % 3 for i in range(n)}
    sizes = {gi: sum(1 for v in gmap.values() if v == gi) for gi in range(3)}
    coef = [1.0 / np.sqrt(sizes[gmap[i]]) for i in range(n)]
    want = _coarse_dense(A, gmap, coef, coef)
    got = _edges_to_dense(out["coarse_edges"].collect(), 3)
    assert np.allclose(got, want, atol=1e-9)
    # preserved eigenvalues = numpy's top-|λ| of A
    evals = np.linalg.eigvalsh(A)
    top2 = sorted(evals, key=abs, reverse=True)[:2]
    assert np.allclose(sorted(out["values"]), sorted(top2), atol=1e-5)


def test_scg_adjacency_preserves_spectrum_on_blocks(spark):
    # 3 disjoint K5s with distinct internal weights → the top
    # eigenvectors are block-constant; exact grouping collapses each
    # block and the 3×3 coarse matrix carries the same top eigenvalues
    edges = []
    for b, w in enumerate([1.0, 2.0, 3.0]):
        base = 5 * b
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j, w))
    g = LinkGraph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        n=15,
    )
    out = scg_adjacency(g, no=3, nt=3, algo="interval")
    rows = out["coarse_edges"].collect()
    got = _edges_to_dense(rows, max(int(r["src"]) for r in rows) + 1)
    coarse_evals = np.linalg.eigvalsh(got)
    # top-3 of A are 4w per block: 4, 8, 12
    for lam in (4.0, 8.0, 12.0):
        assert np.min(np.abs(coarse_evals - lam)) < 1e-4


def test_scg_laplacian_values_and_coarse(spark):
    n, edges = 14, gnm_edges(14, 30, directed=False, seed=65)
    g = LinkGraph(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
        ),
        directed=False,
        n=n,
    )
    A = _dense_adj(n, [(s, d, 1.0) for s, d in edges])
    Lm = np.diag(A.sum(1)) - A
    manual = spark.createDataFrame(
        [(i, i % 4) for i in range(n)], "id long, group long"
    )
    out = scg_laplacian(g, no=2, nt=2, groups=manual, norm="row")
    want_vals = np.sort(np.linalg.eigvalsh(Lm))[:2]
    assert np.allclose(np.sort(out["values"]), want_vals, atol=1e-5)
    gmap = {i: i % 4 for i in range(n)}
    sizes = {gi: sum(1 for v in gmap.values() if v == gi) for gi in range(4)}
    lrow = [1.0 / sizes[gmap[i]] for i in range(n)]
    rrow = [1.0] * n
    want = _coarse_dense(Lm, gmap, lrow, rrow)
    got = _edges_to_dense(out["coarse_edges"].collect(), 4)
    assert np.allclose(got, want, atol=1e-9)


def test_scg_stochastic_values_and_coarse(spark):
    n, edges = 12, gnm_edges(12, 26, directed=False, seed=1)
    # ensure no isolated vertex (stochastic matrix needs d>0)
    seen = {v for e in edges for v in e}
    extra = [(i, (i + 1) % n) for i in range(n) if i not in seen]
    all_edges = list(edges) + extra
    g = LinkGraph(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in all_edges], "src long, dst long, weight double"
        ),
        directed=False,
        n=n,
    )
    A = _dense_adj(n, [(s, d, 1.0) for s, d in all_edges])
    d = A.sum(1)
    P = A / d[:, None]
    out = scg_stochastic(g, no=2, nt=2, norm="row")
    # eigenvalues of P == eigenvalues of the symmetric similarity
    want = np.linalg.eigvalsh(A / np.sqrt(np.outer(d, d)))
    top2 = sorted(want, key=abs, reverse=True)[:2]
    assert np.allclose(sorted(out["values"]), sorted(top2), atol=1e-5)
    # coarse product with the stationary-weighted semiprojectors
    gmap = _groups_of(out["groups"])
    p = d / d.sum()
    pg = {}
    for i in range(n):
        pg[gmap[i]] = pg.get(gmap[i], 0.0) + p[i]
    lrow = [p[i] / pg[gmap[i]] for i in range(n)]
    rrow = [1.0] * n
    want_c = _coarse_dense(P, gmap, lrow, rrow)
    k = max(gmap.values()) + 1
    got = _edges_to_dense(out["coarse_edges"].collect(), k)
    assert np.allclose(got, want_c, atol=1e-8)
    # coarse rows of a row-norm stochastic SCG are themselves stochastic
    assert np.allclose(got.sum(1), 1.0, atol=1e-8)


def test_scg_laplacian_weighted_shift_regression(spark):
    # weighted graph where strength != degree: the Gershgorin shift and
    # cvec must use STRENGTH (a degree-based shift leaves the iterated
    # operator indefinite and the "smallest" eigenvalue comes out
    # negative — caught live on the lineitem-derived corpus)
    n, edges = 10, gnm_edges(10, 20, directed=False, seed=4)
    g = LinkGraph(
        spark.createDataFrame(
            [(s, d, float(1 + (s + d) % 5)) for s, d in edges],
            "src long, dst long, weight double",
        ),
        directed=False,
        n=n,
    )
    A = _dense_adj(n, [(s, d, float(1 + (s + d) % 5)) for s, d in edges])
    Lm = np.diag(A.sum(1)) - A
    out = scg_laplacian(g, no=2, nt=2)
    want = np.sort(np.linalg.eigvalsh(Lm))[:2]
    assert np.allclose(np.sort(out["values"]), want, atol=1e-4)


def test_scg_grouping_rejects_bad_nt(spark):
    v = _vec_df(spark, [0.1, 0.2, 0.3, 0.4])
    for bad in (0, -3):
        try:
            scg_grouping(v, nt=bad)
            assert False, f"nt={bad} must be rejected"
        except ValueError as e:
            assert "nt" in str(e)


def test_scg_rejects_bad_norm(spark):
    g = LinkGraph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
            "src long, dst long, weight double",
        ),
        directed=False,
        n=3,
    )
    for fn in (scg_laplacian, scg_stochastic):
        try:
            fn(g, no=1, nt=1, norm="rows")
            assert False, "norm typo must be rejected, not silently col-normed"
        except ValueError as e:
            assert "norm" in str(e)
