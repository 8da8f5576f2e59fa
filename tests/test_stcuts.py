"""all_st_cuts / all_st_mincuts vs the reference's own example outputs
(/root/reference/examples/simple/igraph_all_st_cuts.out and
igraph_all_st_mincuts.out) plus independent brute-force oracles."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.stcuts import all_st_cuts, all_st_mincuts


def _g(spark, n, arcs, directed=True):
    df = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in arcs],
        "src long, dst long, weight double",
    )
    return LinkGraph(df, directed=directed, n=n)


def _partitions(pdf):
    rows = pdf.collect()
    out = {}
    for r in rows:
        out.setdefault(r["cut_id"], set()).add(r["id"])
    return sorted((frozenset(v) for v in out.values()), key=sorted)


def _cutsets(cdf):
    rows = cdf.collect()
    out = {}
    for r in rows:
        out.setdefault(r["cut_id"], set()).add((r["src"], r["dst"]))
    return sorted((frozenset(v) for v in out.values()), key=sorted)


# --- reference example fixtures (igraph_all_st_cuts.c / .out) -----------

CUTS_FIXTURES = [
    # (n, arcs, s, t, expected partitions)
    (3, [(0, 1), (1, 2)], 0, 2, [{0}, {0, 1}]),
    (5, [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4)], 0, 4,
     [{0}, {0, 1}, {0, 1, 2}, {0, 1, 3}, {0, 1, 2, 3}]),
    (6, [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (1, 5), (5, 4)], 0, 4,
     [{0}, {0, 1}, {0, 1, 5}, {0, 1, 3}, {0, 1, 3, 5}, {0, 1, 2},
      {0, 1, 2, 5}, {0, 1, 2, 3}, {0, 1, 2, 3, 5}]),
    (3, [(0, 2), (1, 2)], 1, 2, [{1}]),
    (5, [(0, 1), (1, 2), (2, 3), (3, 4), (3, 1)], 0, 4,
     [{0}, {0, 1}, {0, 1, 2}, {0, 1, 2, 3}]),
    (7, [(0, 1), (0, 2), (1, 3), (2, 3), (1, 4), (1, 5), (1, 6),
         (4, 2), (5, 2), (6, 2)], 0, 3,
     [{0}, {0, 2}, {0, 1}, {0, 1, 6}, {0, 1, 5}, {0, 1, 5, 6},
      {0, 1, 4}, {0, 1, 4, 6}, {0, 1, 4, 5}, {0, 1, 4, 5, 6},
      {0, 1, 4, 5, 6, 2}]),
]


@pytest.mark.parametrize("n,arcs,s,t,want", CUTS_FIXTURES)
def test_all_st_cuts_reference_fixtures(spark, n, arcs, s, t, want):
    p, c = all_st_cuts(_g(spark, n, arcs), s, t)
    got = _partitions(p)
    assert got == sorted((frozenset(w) for w in want), key=sorted)
    # each cut is exactly the crossing edge set of its partition
    cuts = _cutsets(c)
    want_cuts = sorted(
        (
            frozenset((u, v) for u, v in arcs if u in w and v not in w)
            for w in want
        ),
        key=sorted,
    )
    assert sorted(cuts, key=sorted) == want_cuts


MINCUTS_FIXTURES = [
    (5, [(0, 1), (1, 2), (2, 3), (3, 4)], 0, 4, 1.0,
     [{0}, {0, 1}, {0, 1, 2}, {0, 1, 2, 3}]),
    (6, [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], 0, 5, 1.0,
     [{0}, {0, 1, 2, 3, 4}]),
    (6, [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], 0, 4, 1.0,
     [{0}]),
    (9, [(0, 1), (0, 2), (1, 3), (2, 3), (1, 4), (4, 2), (1, 5), (5, 2),
         (1, 6), (6, 2), (1, 7), (7, 2), (1, 8), (8, 2)], 0, 3, 2.0,
     [{0}, {0, 2}, {0, 1, 2, 4, 5, 6, 7, 8}]),
]


@pytest.mark.parametrize("n,arcs,s,t,val,want", MINCUTS_FIXTURES)
def test_all_st_mincuts_reference_fixtures(spark, n, arcs, s, t, val, want):
    value, p, c = all_st_mincuts(_g(spark, n, arcs), s, t)
    assert value == pytest.approx(val)
    assert _partitions(p) == sorted((frozenset(w) for w in want), key=sorted)


# --- independent brute-force oracles ------------------------------------


def _connected(arcs_set, s, t):
    adj = {}
    for u, v in arcs_set:
        adj.setdefault(u, []).append(v)
    seen = {s}
    stack = [s]
    while stack:
        u = stack.pop()
        for v in adj.get(u, []):
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return t in seen


def _brute_minimal_cuts(arcs, s, t):
    arcs = sorted(set(arcs))
    out = set()
    for r in range(len(arcs) + 1):
        for comb in itertools.combinations(arcs, r):
            rest = set(arcs) - set(comb)
            if _connected(rest, s, t):
                continue
            if all(
                _connected(rest | {e}, s, t) for e in comb
            ):
                out.add(frozenset(comb))
    return out


def _brute_min_cuts(arcs, s, t):
    """All minimum-cardinality (unit caps) cuts as edge sets."""
    cuts = _brute_minimal_cuts(arcs, s, t)
    if not cuts:
        return set(), 0
    best = min(len(c) for c in cuts)
    return {c for c in cuts if len(c) == best}, best


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_all_st_cuts_random_vs_brute(spark, seed):
    rng = np.random.default_rng(seed)
    n = 6
    arcs = [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < 0.3
    ]
    if not _connected(set(arcs), 0, n - 1):
        arcs.append((0, n - 1))
    p, c = all_st_cuts(_g(spark, n, arcs), 0, n - 1)
    got = set(_cutsets(c))
    assert got == _brute_minimal_cuts(arcs, 0, n - 1)


@pytest.mark.parametrize("seed", [5, 6, 7, 8])
def test_all_st_mincuts_random_vs_brute(spark, seed):
    rng = np.random.default_rng(seed)
    n = 6
    arcs = [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < 0.35
    ]
    if not _connected(set(arcs), 0, n - 1):
        arcs.append((0, n - 1))
    want, best = _brute_min_cuts(arcs, 0, n - 1)
    value, p, c = all_st_mincuts(_g(spark, n, arcs), 0, n - 1)
    assert value == pytest.approx(best)
    assert set(_cutsets(c)) == want


def test_guards(spark):
    g = _g(spark, 3, [(0, 1), (1, 2)])
    with pytest.raises(ValueError, match="directed"):
        all_st_cuts(
            LinkGraph(g.edges, directed=False), 0, 2
        )
    with pytest.raises(ValueError, match="differ"):
        all_st_cuts(g, 1, 1)
    with pytest.raises(ValueError, match="refusing"):
        all_st_cuts(g, 0, 2, max_edges=1)
