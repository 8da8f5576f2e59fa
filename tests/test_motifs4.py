"""Size-4 motif census vs exhaustive enumeration."""

import math
import random
from itertools import combinations

import pytest

from tests.fixtures import ZACHARY_EDGES, ZACHARY_N
from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.motifs4 import motifs_randesu_4

# isoclass of each induced 4-vertex sub-edge-set, keyed by the 6-bit
# pair code used by the reference (igraph_i_isoclass2_4u,
# /root/reference/src/topology.c:389): pair bits {0,1}=1 {0,2}=2
# {1,2}=4 {0,3}=8 {1,3}=16 {2,3}=32.
_ISOCLASS2_4U = [
    0, 1, 1, 2, 1, 2, 2, 3, 1, 2, 2, 4, 5, 6, 6, 7, 1, 2, 5, 6, 2, 4,
    6, 7, 2, 3, 6, 7, 6, 7, 8, 9, 1, 5, 2, 6, 2, 6, 4, 7, 2, 6, 3, 7,
    6, 8, 7, 9, 2, 6, 6, 8, 3, 7, 7, 9, 4, 7, 7, 9, 7, 9, 9, 10,
]
_PAIR_BITS = {(0, 1): 1, (0, 2): 2, (1, 2): 4, (0, 3): 8, (1, 3): 16, (2, 3): 32}
CONNECTED = (4, 6, 7, 8, 9, 10)


def brute_census(n, edges):
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    counts = {c: 0 for c in range(11)}
    for quad in combinations(range(n), 4):
        code = 0
        for (i, j), bit in _PAIR_BITS.items():
            if quad[j] in adj[quad[i]]:
                code |= bit
        counts[_ISOCLASS2_4U[code]] += 1
    return counts


def census_dict(spark, n, edges):
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    rows = motifs_randesu_4(g).collect()
    return {r["isoclass"]: r["count"] for r in rows}


def check(spark, n, edges):
    got = census_dict(spark, n, edges)
    want = brute_census(n, edges)
    for c in range(11):
        if c in CONNECTED:
            assert got[c] == want[c], (c, got, want)
        else:
            assert math.isnan(got[c])


def test_k5_closed_forms(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = census_dict(spark, 5, edges)
    assert got[10] == 5  # C(5,4) K4s
    assert got[9] == got[8] == got[7] == got[6] == got[4] == 0


def test_star_and_path_and_cycle(spark):
    check(spark, 6, [(0, i) for i in range(1, 6)])          # star K1,5
    check(spark, 6, [(i, i + 1) for i in range(5)])          # path P6
    check(spark, 6, [(i, (i + 1) % 6) for i in range(6)])    # cycle C6


def test_zachary_vs_bruteforce(spark):
    check(spark, ZACHARY_N, ZACHARY_EDGES)


def test_random_graphs_vs_bruteforce(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 12
        edges = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < 0.35
        ]
        check(spark, n, edges)


def test_multi_loop_invariance(spark):
    simple = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    messy = simple + [(1, 0), (2, 2), (0, 1)]
    a = census_dict(spark, 4, simple)
    b = census_dict(spark, 4, messy)
    for c in CONNECTED:
        assert a[c] == b[c]
