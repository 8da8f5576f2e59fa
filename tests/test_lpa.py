from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.lpa import label_propagation, modularity

from tests.fixtures import (
    LPA_STAR_EDGES,
    LPA_STAR_FIXED,
    LPA_STAR_INITIAL,
    ZACHARY_EDGES,
    ZACHARY_N,
)


def _membership(df, n):
    rows = {r["id"]: r["label"] for r in df.collect()}
    return [rows[i] for i in range(n)]


def _initial_df(spark, labels):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(labels)], "id long, label long"
    )


def _fixed_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_star_weighted_forced(spark):
    """/root/reference/examples/simple/igraph_community_label_propagation.c:67-83
    weighted → exactly [0,0,1,1,1,1]."""
    g = LinkGraph.from_pairs(spark, LPA_STAR_EDGES, directed=False, n=6)
    m = label_propagation(
        g,
        initial=_initial_df(spark, LPA_STAR_INITIAL),
        fixed=_fixed_df(spark, LPA_STAR_FIXED),
        weighted=True,
    )
    assert _membership(m, 6) == [0, 0, 1, 1, 1, 1]


def test_star_unweighted_forced(spark):
    """Same fixture unweighted → everything converges to the fixed
    label, which first-appearance renumbering maps to all-zeros."""
    g = LinkGraph.from_pairs(spark, LPA_STAR_EDGES, directed=False, n=6)
    m = label_propagation(
        g,
        initial=_initial_df(spark, LPA_STAR_INITIAL),
        fixed=_fixed_df(spark, LPA_STAR_FIXED),
        weighted=False,
    )
    assert _membership(m, 6) == [0, 0, 0, 0, 0, 0]


def test_path_weighted(spark):
    """interfaces/python/igraph/test/decomposition.py:216-231."""
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 2.0)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=4)
    initial = _initial_df(spark, [0, -1, -1, 1])
    fixed = _fixed_df(spark, [0, 3])
    m = label_propagation(g, initial=initial, fixed=fixed, weighted=True)
    assert _membership(m, 4) == [0, 0, 1, 1]


def test_path_unweighted_allowed_set(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=4)
    initial = _initial_df(spark, [0, -1, -1, 1])
    fixed = _fixed_df(spark, [0, 3])
    m = label_propagation(g, initial=initial, fixed=fixed, weighted=False)
    assert _membership(m, 4) in ([0, 0, 1, 1], [0, 1, 1, 1], [0, 0, 0, 1])


def test_zachary_smoke(spark):
    """Reference smoke: ≤4 communities, labels dense 0..k-1, and the
    convergence invariant — every vertex's label is dominant among its
    neighbors (igraph's running criterion, src/community.c:2303-2306)."""
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    m = label_propagation(g)
    labels = _membership(m, ZACHARY_N)
    k = len(set(labels))
    assert max(labels) == k - 1 and min(labels) == 0  # dense renumber
    assert k <= 4

    # dominance invariant
    nbrs = {}
    for a, b in ZACHARY_EDGES:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    for v, ns in nbrs.items():
        hist = {}
        for u in ns:
            hist[labels[u]] = hist.get(labels[u], 0) + 1
        assert hist.get(labels[v], 0) == max(hist.values())


def test_modularity_zachary_two_split(spark):
    """Spark modularity vs a direct evaluation of the definition
    (Q = Σ_c [e_c/m − (d_c/2m)²], /root/reference/src/community.c:837)."""
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    group1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    labels = [0 if i in group1 else 1 for i in range(ZACHARY_N)]
    mem = spark.createDataFrame(
        [(i, labels[i]) for i in range(ZACHARY_N)], "id long, c long"
    )
    q = modularity(g, mem)

    m = len(ZACHARY_EDGES)
    e_c = {}
    d_c = {}
    for a, b in ZACHARY_EDGES:
        if labels[a] == labels[b]:
            e_c[labels[a]] = e_c.get(labels[a], 0) + 1
        d_c[labels[a]] = d_c.get(labels[a], 0) + 1
        d_c[labels[b]] = d_c.get(labels[b], 0) + 1
    expected = sum(
        e_c.get(c, 0) / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )
    assert abs(q - expected) < 1e-9
    assert q > 0.3  # the factional split is strongly modular


def test_modularity_singletons_negative(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0)], directed=False, n=3)
    mem = spark.createDataFrame([(i, i) for i in range(3)], "id long, c long")
    # all-singleton partition of a triangle: Q = -Σ(d_i/2m)² = -1/3
    assert abs(modularity(g, mem) - (-1.0 / 3.0)) < 1e-9


def test_bipartite_oscillation_vs_half_damping(spark):
    """Complete bipartite K_{3,3} with side-constant initial labels is
    the documented synchronous 2-cycle: every vertex's neighbors all
    carry the other side's label, so undamped sweeps swap the sides
    forever. damping='half' must converge to one label instead."""
    import warnings

    edges = [(a, b) for a in range(3) for b in range(3, 6)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=6)
    init = _initial_df(spark, [0, 0, 0, 1, 1, 1])

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        label_propagation(g, initial=init, weighted=False, max_sweeps=9)
        assert any("max_sweeps" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m = label_propagation(
            g, initial=init, weighted=False, max_sweeps=20, damping="half"
        )
        assert not any("max_sweeps" in str(w.message) for w in caught)
    assert len(set(_membership(m, 6))) == 1
