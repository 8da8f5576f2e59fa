"""Batched random walks: validity, determinism, dead ends, weighting."""

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.walks import random_walks, walk_sentences
from xdata_igraph_spark.sources.generators import ring


def walks_by_id(df):
    out = {}
    for r in df.collect():
        out.setdefault(int(r["walk_id"]), {})[int(r["step"])] = int(r["vertex"])
    return {
        wid: [steps[i] for i in range(len(steps))] for wid, steps in out.items()
    }


def test_walks_follow_edges(spark):
    g = ring(spark, 10, directed=False)
    w = walks_by_id(random_walks(g, length=6, seed=1))
    assert len(w) == 10
    for wid, path in w.items():
        assert len(path) == 7
        assert path[0] == wid  # n_per_start=1: walk_id = start vertex
        for a, b in zip(path, path[1:]):
            assert abs(a - b) in (1, 9)  # ring neighbors


def test_walks_deterministic_and_seeded(spark):
    g = ring(spark, 8, directed=False)
    a = walks_by_id(random_walks(g, length=5, seed=3))
    b = walks_by_id(random_walks(g, length=5, seed=3))
    c = walks_by_id(random_walks(g, length=5, seed=4))
    assert a == b
    assert a != c


def test_directed_dead_end_stops_walk(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=True, n=3)
    w = walks_by_id(random_walks(g, length=5, seed=1))
    assert w[0] == [0, 1, 2]  # stops at sink 2
    assert w[2] == [2]


def test_multiple_walks_per_start(spark):
    g = ring(spark, 5, directed=False)
    w = walks_by_id(random_walks(g, length=3, n_per_start=4, seed=2))
    assert len(w) == 20
    for wid, path in w.items():
        assert path[0] == wid // 4


def test_weighted_walks_prefer_heavy_edges(spark):
    # star: center 0; edge to 1 carries ~all the weight
    edges = [(0, 1, 1e9), (0, 2, 1e-9), (0, 3, 1e-9), (0, 4, 1e-9)]
    df = LinkGraph.from_pairs(spark, edges, directed=False, n=5)
    w = walks_by_id(random_walks(df, length=1, n_per_start=16, seed=5, weighted=True))
    first_steps = [path[1] for wid, path in w.items() if path[0] == 0]
    assert len(first_steps) == 16
    assert all(v == 1 for v in first_steps)


def test_walk_sentences_roundtrip(spark):
    g = ring(spark, 6, directed=False)
    walks = random_walks(g, length=4, seed=9)
    sent = {
        int(r["walk_id"]): list(r["sentence"])
        for r in walk_sentences(walks).collect()
    }
    w = walks_by_id(walks)
    assert sent == w


def test_bad_params_raise(spark):
    g = ring(spark, 4, directed=False)
    with pytest.raises(ValueError):
        random_walks(g, length=-1)
