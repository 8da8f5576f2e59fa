"""SIR tau-leap simulation invariants."""

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.epidemics import sir
from xdata_igraph_spark.sources.generators import full, ring


def census_rows(df):
    return sorted(
        (r["sim"], r["step"], r["time"], r["NS"], r["NI"], r["NR"])
        for r in df.collect()
    )


def test_sir_conservation_and_monotonicity(spark):
    g = ring(spark, 20, directed=False)
    rows = census_rows(sir(g, beta=1.0, gamma=0.3, no_sim=3, dt=0.5, max_steps=40))
    by_sim = {}
    for sim, step, time, ns, ni, nr in rows:
        assert ns + ni + nr == 20
        assert time == step * 0.5
        by_sim.setdefault(sim, []).append((step, ns, ni, nr))
    assert set(by_sim) == {0, 1, 2}
    for series in by_sim.values():
        series.sort()
        assert series[0][2] == 1  # exactly one patient zero
        for (s0, ns0, _, nr0), (s1, ns1, _, nr1) in zip(series, series[1:]):
            assert s1 == s0 + 1
            assert ns1 <= ns0  # susceptibles never increase
            assert nr1 >= nr0  # recovered never decrease


def test_sir_no_recovery_infects_component(spark):
    g = full(spark, 8, directed=False)
    rows = census_rows(sir(g, beta=5.0, gamma=0.0, no_sim=2, dt=1.0, max_steps=50))
    last = {}
    for sim, step, _, ns, ni, nr in rows:
        last[sim] = (ns, ni, nr)
    # gamma=0: nobody ever recovers; high beta on K8 infects everyone
    for ns, ni, nr in last.values():
        assert nr == 0
        assert ni == 8
    # max_steps bound hit (NI never reaches 0 with gamma=0)
    assert max(step for _, step, *_ in rows) == 50


def test_sir_deterministic(spark):
    g = ring(spark, 12, directed=False)
    a = census_rows(sir(g, beta=0.8, gamma=0.4, no_sim=2, seed=7, max_steps=30))
    b = census_rows(sir(g, beta=0.8, gamma=0.4, no_sim=2, seed=7, max_steps=30))
    assert a == b
    c = census_rows(sir(g, beta=0.8, gamma=0.4, no_sim=2, seed=8, max_steps=30))
    assert a != c


def test_sir_instant_recovery_dies_out(spark):
    g = ring(spark, 10, directed=False)
    rows = census_rows(sir(g, beta=0.0, gamma=100.0, no_sim=1, dt=1.0))
    # no infection pressure: patient zero recovers, epidemic ends
    final = max(rows)
    assert final[4] == 0  # NI
    assert final[5] == 1  # NR
    assert final[1] <= 5  # ends quickly


def test_sir_bad_rates_raise(spark):
    g = ring(spark, 4, directed=False)
    with pytest.raises(ValueError, match="non-negative"):
        sir(g, beta=-1.0, gamma=0.1)


def test_sir_noncontiguous_ids_seed_one_infection(spark):
    # vertex ids {10,11,12,13}: patient zero must be drawn from the
    # ACTUAL vertex set, so step 0 always has exactly one infected
    edges = [(10, 11, 1.0), (11, 12, 1.0), (12, 13, 1.0)]
    g = LinkGraph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
    )
    rows = census_rows(sir(g, beta=1.0, gamma=0.5, no_sim=3, max_steps=10))
    for s_id in range(3):
        step0 = [r for r in rows if r[0] == s_id and r[1] == 0]
        assert len(step0) == 1
        _, _, _, ns, ni, nr = step0[0]
        assert (ns, ni, nr) == (3, 1, 0)
