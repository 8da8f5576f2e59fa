"""Bipartite projection and maximum matching vs pure-Python oracles
(/root/reference/src/bipartite.c:265, matching.c:219)."""

import itertools
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.bipartite import (
    bipartite_projection,
    maximum_bipartite_matching,
)


def _bip(spark, arcs, n):
    """arcs: (type0_id, type1_id) pairs. types: even=False, odd... no —
    explicit types DataFrame covering ids 0..n-1 with given type-1 set."""
    t1 = {w for _, w in arcs}
    edges = [(u, w, 1.0) for u, w in arcs]
    g = LinkGraph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False, n=n,
    )
    types = spark.createDataFrame(
        [(i, i in t1) for i in range(n)], "id long, type boolean"
    )
    return g, types


def test_projection_wedges(spark):
    # type-0 = {0,1,2}, type-1 = {3,4}; 3 sees {0,1}, 4 sees {0,1,2}
    arcs = [(0, 3), (1, 3), (0, 4), (1, 4), (2, 4)]
    g, types = _bip(spark, arcs, 5)
    p0 = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in bipartite_projection(g, types, which=0).collect()
    }
    assert p0 == {(0, 1): 2, (0, 2): 1, (1, 2): 1}
    p1 = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in bipartite_projection(g, types, which=1).collect()
    }
    assert p1 == {(3, 4): 2}


def test_projection_random_vs_oracle(spark):
    rng = random.Random(7)
    arcs = sorted({(rng.randrange(8), 8 + rng.randrange(6)) for _ in range(30)})
    g, types = _bip(spark, arcs, 14)
    got = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in bipartite_projection(g, types, which=0).collect()
    }
    want = Counter()
    by_w = {}
    for u, w in arcs:
        by_w.setdefault(w, []).append(u)
    for w, us in by_w.items():
        for a, b in itertools.combinations(sorted(us), 2):
            want[(a, b)] += 1
    assert got == dict(want)


def test_projection_hub_cap(spark):
    arcs = [(0, 3), (1, 3), (0, 4), (1, 4), (2, 4)]
    g, types = _bip(spark, arcs, 5)
    capped = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in bipartite_projection(g, types, which=0, max_shared_degree=2).collect()
    }
    assert capped == {(0, 1): 1}  # hub 4 (deg 3) dropped


def test_projection_rejects_non_bipartite(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=3)
    types = g.spark.createDataFrame(
        [(0, False), (1, True), (2, True)], "id long, type boolean"
    )
    with pytest.raises(ValueError, match="same-type"):
        bipartite_projection(g, types).collect()


def _brute_matching(arcs):
    best = 0
    edges = sorted(set(arcs))
    for k in range(len(edges), 0, -1):
        for sub in itertools.combinations(edges, k):
            us = [u for u, _ in sub]
            ws = [w for _, w in sub]
            if len(set(us)) == k and len(set(ws)) == k:
                return k
        if best:
            break
    return 0


def test_matching_perfect(spark):
    arcs = [(0, 3), (1, 4), (2, 5), (0, 4), (1, 5)]
    g, types = _bip(spark, arcs, 6)
    size, mdf = maximum_bipartite_matching(g, types)
    assert size == 3
    rows = [(r["u"], r["w"]) for r in mdf.collect()]
    assert len(rows) == 3
    assert len({u for u, _ in rows}) == 3 and len({w for _, w in rows}) == 3
    assert all((u, w) in set(arcs) for u, w in rows)


def test_matching_random_vs_bruteforce(spark):
    rng = random.Random(3)
    for trial in range(3):
        arcs = sorted({(rng.randrange(5), 5 + rng.randrange(5)) for _ in range(9)})
        g, types = _bip(spark, arcs, 10)
        size, _ = maximum_bipartite_matching(g, types)
        assert size == _brute_matching(arcs), arcs


def test_untyped_endpoint_raises(spark):
    from xdata_igraph_spark.operators.bipartite import bipartite_projection

    g = LinkGraph(
        spark.createDataFrame(
            [(0, 10, 1.0), (1, 11, 1.0)], "src long, dst long, weight double"
        ),
        directed=False,
    )
    # types covers only 3 of the 4 endpoints: must raise, not truncate
    types = spark.createDataFrame(
        [(0, False), (1, False), (10, True)], "id long, type boolean"
    )
    with pytest.raises(ValueError, match="cover"):
        bipartite_projection(g, types)
