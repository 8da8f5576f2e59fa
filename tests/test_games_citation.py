"""Citation/aging games: structural invariants, closed-form edge
counts, and distributional sanity per the reference semantics
(/root/reference/src/games.c — see module docstring anchors)."""

import numpy as np
import pytest

from xdata_igraph_spark.sources.games_citation import (
    asymmetric_preference_game,
    barabasi_aging_game,
    callaway_traits_game,
    cited_type_game,
    citing_cited_type_game,
    correlated_game,
    correlated_pair_game,
    establishment_game,
    growing_random_game,
    lastcit_game,
    preference_game,
    recent_degree_aging_game,
    recent_degree_game,
    static_fitness_game,
)


def _edges(g):
    return [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]


def test_growing_random(spark):
    g = growing_random_game(spark, 50, 2, citation=True, seed=7)
    e = _edges(g)
    assert len(e) == 49 * 2
    assert all(s > d for s, d in e)  # citation: newest cites older
    g2 = growing_random_game(spark, 50, 2, citation=False, seed=7)
    e2 = _edges(g2)
    assert len(e2) == 49 * 2
    # non-citation: both endpoints among vertices existing at the step
    assert all(0 <= s and 1 <= d for s, d in e2)
    # determinism
    assert _edges(growing_random_game(spark, 50, 2, citation=True, seed=7)) == e


def test_callaway_traits(spark):
    ones = [[1.0, 1.0], [1.0, 1.0]]
    g, t = callaway_traits_game(spark, 40, 2, 3, [0.5, 0.5], ones, seed=3)
    assert len(_edges(g)) == 39 * 3  # p=1 accepts every trial
    zeros = [[0.0, 0.0], [0.0, 0.0]]
    g0, _ = callaway_traits_game(spark, 40, 2, 3, [0.5, 0.5], zeros, seed=3)
    assert len(_edges(g0)) == 0
    assert len(t) == 40 and set(t) <= {0, 1}


def test_establishment(spark):
    ones = [[1.0]]
    g, _ = establishment_game(spark, 30, 1, 4, [1.0], ones, seed=5)
    e = _edges(g)
    assert len(e) == (30 - 4) * 4
    assert all(s > d for s, d in e)
    # k distinct targets per step
    for i in set(s for s, _ in e):
        ts = [d for s, d in e if s == i]
        assert len(set(ts)) == len(ts)


def test_recent_degree_window(spark):
    g = recent_degree_game(spark, 60, power=1.0, window=5, m=2, seed=11)
    e = _edges(g)
    assert len(e) == 59 * 2
    assert all(s > d for s, d in e)
    # outseq drives per-step edge counts
    outseq = [0] + [1, 2] * 20
    g2 = recent_degree_game(
        spark, 41, power=1.0, window=3, m=0, outseq=outseq, seed=11
    )
    assert len(_edges(g2)) == sum(outseq)


def test_barabasi_aging_recency_bias(spark):
    # strongly negative aging exponent → targets skew to recent vertices
    g = barabasi_aging_game(
        spark, 200, m=1, pa_exp=0.0, aging_exp=-3.0, aging_bin=50,
        zero_deg_appeal=1.0, zero_age_appeal=0.0, seed=13,
    )
    e = _edges(g)
    assert len(e) == 199
    lag = np.array([s - d for s, d in e])
    flat = barabasi_aging_game(
        spark, 200, m=1, pa_exp=0.0, aging_exp=0.0, aging_bin=50,
        zero_deg_appeal=1.0, zero_age_appeal=0.0, seed=13,
    )
    lag_flat = np.array([s - d for s, d in _edges(flat)])
    assert lag.mean() < lag_flat.mean()


def test_recent_degree_aging(spark):
    g = recent_degree_aging_game(
        spark, 80, m=2, pa_exp=1.0, aging_exp=-1.0, aging_bin=10,
        time_window=4, zero_appeal=0.5, seed=17,
    )
    e = _edges(g)
    assert len(e) == 79 * 2
    assert all(s > d for s, d in e)


def test_lastcit(spark):
    g = lastcit_game(
        spark, 100, edges_per_node=2, pagebins=4,
        preference=[5.0, 2.0, 1.0, 0.5, 1.0], seed=19,
    )
    e = _edges(g)
    assert len(e) == 99 * 2
    assert all(s > d for s, d in e)
    with pytest.raises(ValueError, match="pagebins"):
        lastcit_game(spark, 10, 1, 4, [1.0, 1.0], seed=1)
    with pytest.raises(ValueError, match="positive"):
        lastcit_game(spark, 10, 1, 2, [1.0, 1.0, 0.0], seed=1)


def test_cited_type(spark):
    types = [0, 1] * 25
    g = cited_type_game(spark, 50, types, [1.0, 0.0], edges_per_step=2, seed=23)
    e = _edges(g)
    assert len(e) == 49 * 2
    # only type-0 vertices (even ids) ever get cited
    assert all(d % 2 == 0 for _, d in e)


def test_citing_cited_type(spark):
    types = [0, 1] * 25
    near_ident = [[1.0, 0.01], [0.01, 1.0]]
    g = citing_cited_type_game(
        spark, 50, types, near_ident, edges_per_step=2, seed=29
    )
    e = _edges(g)
    same = sum(1 for s, d in e if s % 2 == d % 2)
    assert same / len(e) > 0.8  # strong same-type preference
    # pure identity pref with no same-type vertex available yet → the
    # zero-weight guard fires (the reference's behavior is undefined)
    ident = [[1.0, 0.0], [0.0, 1.0]]
    with pytest.raises(ValueError, match="zero"):
        citing_cited_type_game(spark, 50, types, ident, seed=29)


def test_preference_game(spark):
    full = [[1.0, 1.0], [1.0, 1.0]]
    g, t = preference_game(
        spark, 20, 2, type_dist=[10, 10], fixed_sizes=True,
        pref_matrix=full, directed=False, seed=31,
    )
    assert len(_edges(g)) == 20 * 19 // 2  # p=1 complete
    assert list(t) == [0] * 10 + [1] * 10
    block = [[1.0, 0.0], [0.0, 1.0]]
    g2, t2 = preference_game(
        spark, 30, 2, type_dist=[15, 15], fixed_sizes=True,
        pref_matrix=block, directed=False, seed=31,
    )
    for s, d in _edges(g2):
        assert t2[s] == t2[d]


def test_asymmetric_preference(spark):
    # out-type 0 never links; out-type 1 always links to in-type 0
    pref = [[0.0, 0.0], [1.0, 0.0]]
    g, t_in, t_out = asymmetric_preference_game(
        spark, 25, 2, pref_matrix=pref, seed=37
    )
    for s, d in _edges(g):
        assert t_out[s] == 1 and t_in[d] == 0
    assert g.directed


def test_static_fitness(spark):
    fit = [10.0] * 5 + [0.1] * 45
    g = static_fitness_game(spark, 200, fit, seed=41)
    e = _edges(g)
    assert len(e) == 200
    assert len(set(e)) == 200  # simple
    assert all(s != d for s, d in e)
    deg = np.zeros(50)
    for s, d in e:
        deg[s] += 1
        deg[d] += 1
    assert deg[:5].mean() > deg[5:].mean() * 3
    # directed variant with in-fitness
    gd = static_fitness_game(spark, 100, fit, fitness_in=fit[::-1], seed=43)
    assert gd.directed and len(_edges(gd)) == 100


def test_correlated_pair(spark):
    g1, g2 = correlated_pair_game(spark, 60, corr=1.0, p=0.2, seed=47)
    assert sorted(_edges(g1)) == sorted(_edges(g2))
    g1b, g2b = correlated_pair_game(spark, 80, corr=0.8, p=0.2, seed=53)
    e1, e2 = set(_edges(g1b)), set(_edges(g2b))
    q = 0.2 + 0.8 * 0.8
    overlap = len(e1 & e2) / len(e1)
    assert abs(overlap - q) < 0.12
    # corr=0.8 pair still correlated far above independence (~p)
    assert overlap > 0.5
    with pytest.raises(ValueError, match="orrelation"):
        correlated_game(g1, 1.5, 0.2)


def test_guards(spark):
    with pytest.raises(ValueError, match="refusing"):
        growing_random_game(spark, 10_000_000, 1)
    with pytest.raises(ValueError, match="invalid number of edges"):
        growing_random_game(spark, 10, -1)
