"""Directed size-3/4 motif census: derived isoclass tables vs the
reference's own igraph_i_isoclass2_3/_4 tables, and census counts vs
exhaustive brute-force enumeration on random digraphs."""

import itertools
import math
import os
import re

import numpy as np
import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.motifs_directed import (
    _isoclass_tables,
    motifs_randesu_3_directed,
    motifs_randesu_4_directed,
)

TOPOLOGY_C = "/root/reference/src/topology.c"


@pytest.mark.parametrize("k,name", [(3, "igraph_i_isoclass2_3"),
                                    (4, "igraph_i_isoclass2_4")])
def test_derived_tables_match_reference(k, name):
    if not os.path.exists(TOPOLOGY_C):
        pytest.skip("reference source not available")
    src = open(TOPOLOGY_C).read()
    m = re.search(name + r"\[\] = \{(.*?)\};", src, re.S)
    ref = [int(x) for x in re.findall(r"\d+", m.group(1))]
    table, connected, _bit = _isoclass_tables(k)
    assert table == ref
    # reference NaN classes: 3-vertex → 0,1,2 disconnected;
    # 4-vertex → 218 classes with known connected count
    assert len(connected) == (13 if k == 3 else 199)


def _brute_census(n, arcs, k):
    """Exhaustive connected-k-subset census using the derived tables
    (independent of the Spark plan: pure python enumeration)."""
    table, connected, bit = _isoclass_tables(k)
    aset = set(arcs)
    counts = {}
    for comb in itertools.combinations(range(n), k):
        sub = [(i, j) for i in range(k) for j in range(k)
               if i != j and (comb[i], comb[j]) in aset]
        code = 0
        for i, j in sub:
            code |= bit[(i, j)]
        c = table[code]
        if c in connected:
            counts[c] = counts.get(c, 0) + 1
    return counts


def _rand_digraph(seed, n, p):
    rng = np.random.default_rng(seed)
    return [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < p
    ]


def _g(spark, n, arcs):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    return LinkGraph(df, directed=True, n=n)


@pytest.mark.parametrize("seed,p", [(1, 0.25), (2, 0.4), (3, 0.15)])
def test_size4_census_vs_brute(spark, seed, p):
    n = 9
    arcs = _rand_digraph(seed, n, p)
    want = _brute_census(n, arcs, 4)
    got_rows = motifs_randesu_4_directed(_g(spark, n, arcs)).collect()
    got = {r["isoclass"]: r["count"] for r in got_rows}
    assert len(got) == 218
    _table, connected, _ = _isoclass_tables(4)
    for c in range(218):
        if c in connected:
            assert got[c] == want.get(c, 0), f"class {c}"
        else:
            assert math.isnan(got[c])


@pytest.mark.parametrize("seed,p", [(4, 0.3), (5, 0.5)])
def test_size3_census_vs_brute(spark, seed, p):
    n = 10
    arcs = _rand_digraph(seed, n, p)
    want = _brute_census(n, arcs, 3)
    got_rows = motifs_randesu_3_directed(_g(spark, n, arcs)).collect()
    got = {r["isoclass"]: r["count"] for r in got_rows}
    assert len(got) == 16
    _table, connected, _ = _isoclass_tables(3)
    for c in range(16):
        if c in connected:
            assert got[c] == want.get(c, 0), f"class {c}"
        else:
            assert math.isnan(got[c])


def test_size4_sampling_unbiased_shape(spark):
    arcs = _rand_digraph(7, 12, 0.3)
    g = _g(spark, 12, arcs)
    full = {
        r["isoclass"]: r["count"]
        for r in motifs_randesu_4_directed(g).collect()
    }
    samp = {
        r["isoclass"]: r["count"]
        for r in motifs_randesu_4_directed(g, keep_prob=0.5, seed=9).collect()
    }
    tot_full = sum(v for v in full.values() if not math.isnan(v))
    tot_samp = sum(v for v in samp.values() if not math.isnan(v))
    assert 0 < tot_samp < tot_full
    # keep_prob=1 reproduces the census exactly
    again = {
        r["isoclass"]: r["count"]
        for r in motifs_randesu_4_directed(g, keep_prob=1.0).collect()
    }
    for c in full:
        if math.isnan(full[c]):
            assert math.isnan(again[c])
        else:
            assert again[c] == full[c]
