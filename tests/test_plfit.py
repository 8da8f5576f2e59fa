"""power_law_fit vs the reference's own example outputs
(/root/reference/examples/simple/igraph_power_law_fit.c + .out)."""

import numpy as np
import pytest

from data_plfit import CONTINUOUS_DATA, DISCRETE_DATA
from xdata_igraph_spark.operators.plfit import (
    hzeta,
    power_law_fit,
)

EXPECTED = [
    # (data, xmin, force_continuous) -> reference .out block
    ((CONTINUOUS_DATA, None, False),
     dict(continuous=True, alpha=2.81976, xmin=1.00979,
          L=-946.14703, D=0.01454, p=0.98525)),
    ((CONTINUOUS_DATA, 2.0, False),
     dict(continuous=True, alpha=2.81157, xmin=2.0,
          L=-463.92064, D=0.05091, p=0.46011)),
    ((DISCRETE_DATA, None, False),
     dict(continuous=False, alpha=3.11402, xmin=1.0,
          L=-622.60933, D=0.00941, p=0.99999)),
    ((DISCRETE_DATA, 2.0, False),
     dict(continuous=False, alpha=3.27159, xmin=2.0,
          L=-185.83215, D=0.04504, p=0.90576)),
    ((DISCRETE_DATA, None, True),
     dict(continuous=True, alpha=3.77550, xmin=11.0,
          L=-13.68681, D=0.15260, p=0.99902)),
    ((DISCRETE_DATA, 2.0, True),
     dict(continuous=True, alpha=5.26868, xmin=2.0,
          L=-75.22503, D=0.70253, p=0.0)),
]


@pytest.mark.parametrize("case,want", EXPECTED)
def test_reference_vectors(case, want):
    data, xmin, fc = case
    got = power_law_fit(data, xmin=xmin, force_continuous=fc)
    assert got["continuous"] == want["continuous"]
    for k in ("alpha", "xmin", "L", "D", "p"):
        # reference prints %.5f; discrete alpha additionally differs by
        # the L-BFGS-vs-ternary-search stopping point
        assert got[k] == pytest.approx(want[k], abs=1e-4), k


def test_hzeta_values():
    # ζ(2,1) = π²/6; ζ(3,1) = Apéry's constant
    assert hzeta(2.0, 1.0) == pytest.approx(np.pi**2 / 6, rel=1e-12)
    assert hzeta(3.0, 1.0) == pytest.approx(1.2020569031595943, rel=1e-12)
    # shift identity ζ(s,q) = ζ(s,q+1) + q^-s
    for s in (1.5, 2.5, 4.0):
        for q in (1.0, 2.0, 7.0):
            assert hzeta(s, q) == pytest.approx(
                hzeta(s, q + 1) + q ** (-s), rel=1e-12
            )


def test_dataframe_input(spark):
    df = spark.createDataFrame([(float(x),) for x in DISCRETE_DATA], "deg double")
    got = power_law_fit(df, column="deg")
    want = power_law_fit(DISCRETE_DATA)
    for k in ("alpha", "xmin", "L", "D", "p"):
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_degree_fit_on_graph(spark):
    # end-to-end: a static power-law graph's degrees fit with a
    # plausible exponent
    from xdata_igraph_spark.graph import LinkGraph

    rng = np.random.default_rng(7)
    # Zipf-ish degree samples as a synthetic degree table
    degs = rng.zipf(2.5, size=5000)
    degs = degs[degs <= 10000]
    df = spark.createDataFrame([(int(d),) for d in degs], "degree long")
    got = power_law_fit(df, column="degree")
    assert not got["continuous"]
    assert 2.2 <= got["alpha"] <= 2.8
    assert got["p"] > 0.01


def test_guards():
    with pytest.raises(ValueError, match="no data"):
        power_law_fit([])
    with pytest.raises(ValueError, match="max_unique_values"):
        power_law_fit(list(np.linspace(1, 2, 100)), max_unique_values=50)
