"""MCS / chordality and all-simple-paths vs brute force."""

import pytest

from tests.fixtures import ZACHARY_EDGES, ZACHARY_N
from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.chordal import (
    is_chordal,
    maximum_cardinality_search,
)
from xdata_igraph_spark.operators.paths import get_all_simple_paths
from xdata_igraph_spark.sources.generators import famous, full, ring, tree


def test_mcs_is_permutation_rooted(spark):
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    rows = maximum_cardinality_search(g, root=5).collect()
    ranks = {int(r["id"]): int(r["rank"]) for r in rows}
    assert sorted(ranks.values()) == list(range(ZACHARY_N))
    # reference alpha semantics: the first-visited vertex gets n-1
    assert ranks[5] == ZACHARY_N - 1


def test_chordal_families(spark):
    assert is_chordal(tree(spark, 15, mode="undirected"))[0]
    assert is_chordal(full(spark, 5, directed=False))[0]
    ok, fill = is_chordal(ring(spark, 4, directed=False))
    assert not ok and fill
    assert not is_chordal(ring(spark, 5, directed=False))[0]
    assert not is_chordal(famous(spark, "petersen"))[0]


def test_fillin_makes_chordal(spark):
    g = ring(spark, 6, directed=False)
    ok, fill = is_chordal(g)
    assert not ok
    edges = [(i, (i + 1) % 6) for i in range(6)] + fill
    g2 = LinkGraph.from_pairs(spark, edges, directed=False, n=6)
    assert is_chordal(g2)[0]


def brute_simple_paths(n, edges, directed, src, dst, cutoff):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    out = []

    def dfs(path):
        if path[-1] == dst and len(path) > 1:
            out.append(tuple(path))
        if cutoff >= 0 and len(path) - 1 >= cutoff:
            return
        for w in sorted(adj.get(path[-1], ())):
            if w not in path:
                dfs(path + [w])

    dfs([src])
    if src == dst:
        out.append((src,))
    return sorted(out)


BULL = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]


@pytest.mark.parametrize("cutoff", [-1, 2])
def test_simple_paths_bull(spark, cutoff):
    g = LinkGraph.from_pairs(spark, BULL, directed=False, n=5)
    got = sorted(
        tuple(r["path"])
        for r in get_all_simple_paths(g, 3, to=[4], cutoff=cutoff).collect()
    )
    assert got == brute_simple_paths(5, BULL, False, 3, 4, cutoff)


def test_simple_paths_directed_all_targets(spark):
    e = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = LinkGraph.from_pairs(spark, e, directed=True, n=4)
    rows = get_all_simple_paths(g, 0).collect()
    paths = sorted(tuple(r["path"]) for r in rows)
    assert paths == [
        (0,), (0, 1), (0, 1, 2), (0, 1, 2, 3), (0, 2), (0, 2, 3),
    ]
    for r in rows:
        assert r["target"] == r["path"][-1]
        assert r["length"] == len(r["path"]) - 1


def test_simple_paths_guard(spark):
    g = full(spark, 9, directed=False)
    with pytest.raises(ValueError, match="max_level_rows"):
        get_all_simple_paths(g, 0, max_level_rows=100)
