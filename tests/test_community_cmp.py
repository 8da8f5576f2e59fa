"""compare_communities / split_join_distance vs a pure-Python oracle
(formulas from /root/reference/src/community.c:3203-3520)."""

import math
import random
from collections import Counter

import pytest

from xdata_igraph_spark.operators.community_cmp import (
    compare_communities,
    comparison_metrics,
    split_join_distance,
)


def _py_metrics(c1, c2):
    n = len(c1)
    conf = Counter(zip(c1, c2))
    a = Counter(c1)
    b = Counter(c2)
    h1 = -sum((v / n) * math.log(v / n) for v in a.values())
    h2 = -sum((v / n) * math.log(v / n) for v in b.values())
    mi = sum(
        (v / n) * (math.log(v / n) - math.log(a[i] / n) - math.log(b[j] / n))
        for (i, j), v in conf.items()
    )
    rowmax = Counter()
    colmax = Counter()
    for (i, j), v in conf.items():
        rowmax[i] = max(rowmax[i], v)
        colmax[j] = max(colmax[j], v)
    sj = (n - sum(rowmax.values())) + (n - sum(colmax.values()))
    pairs = sum((v / n) * (v - 1) / (n - 1) for v in conf.values())
    f1 = sum((v / n) * (v - 1) / (n - 1) for v in a.values())
    f2 = sum((v / n) * (v - 1) / (n - 1) for v in b.values())
    rand = 1.0 + 2 * pairs - f1 - f2
    exp = f1 * f2 + (1 - f1) * (1 - f2)
    ari = (rand - exp) / (1 - exp)
    vi = h1 + h2 - 2 * mi
    nmi = 1.0 if h1 == 0 and h2 == 0 else 2 * mi / (h1 + h2)
    return dict(vi=vi, nmi=nmi, split_join=sj, rand=rand, adjusted_rand=ari)


def _mdf(spark, labels):
    return spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(labels)], "id long, label long"
    )


def test_identical_partitions(spark):
    c = [0, 0, 1, 1, 2, 2, 2]
    m = _mdf(spark, c)
    row = comparison_metrics(m, _mdf(spark, c)).first()
    assert row["vi"] == pytest.approx(0.0, abs=1e-12)
    assert row["nmi"] == pytest.approx(1.0)
    assert row["split_join"] == 0
    assert row["rand"] == pytest.approx(1.0)
    assert row["adjusted_rand"] == pytest.approx(1.0)


def test_random_partitions_vs_oracle(spark):
    rng = random.Random(11)
    n = 60
    c1 = [rng.randrange(5) for _ in range(n)]
    c2 = [rng.randrange(4) for _ in range(n)]
    want = _py_metrics(c1, c2)
    row = comparison_metrics(_mdf(spark, c1), _mdf(spark, c2)).first()
    for k, v in want.items():
        assert row[k] == pytest.approx(v, abs=1e-10), k
    assert compare_communities(_mdf(spark, c1), _mdf(spark, c2), "vi") == pytest.approx(
        want["vi"], abs=1e-10
    )


def test_split_join_asymmetric_components(spark):
    # refinement: c2 splits c1's single cluster → d12 > 0, d21 = 0
    c1 = [0] * 6
    c2 = [0, 0, 0, 1, 1, 1]
    d12, d21 = split_join_distance(_mdf(spark, c1), _mdf(spark, c2))
    assert (d12, d21) == (3, 0)


def test_domain_mismatch_raises(spark):
    m1 = _mdf(spark, [0, 1, 2])
    m2 = spark.createDataFrame([(5, 0), (6, 1), (7, 2)], "id long, label long")
    with pytest.raises(ValueError, match="different vertex sets"):
        comparison_metrics(m1, m2).first()


def test_unknown_method_raises(spark):
    m = _mdf(spark, [0, 1])
    with pytest.raises(ValueError, match="unknown comparison method"):
        compare_communities(m, m, "bogus")
