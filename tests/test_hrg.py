"""HRG: dendrogram fit (likelihood ascent, determinism), the LCA
pair-probability join (exactly one row per pair), game sampling laws,
and missing-link prediction on planted structure (reference
/root/reference/src/igraph_hrg.cc, CMN Nature 453)."""

import math

from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.hrg import (
    _Dendro,
    hrg_create,
    hrg_dendrogram,
    hrg_fit,
    hrg_game,
    hrg_pair_probs,
    hrg_predict,
    hrg_sample,
)


def _two_cliques(spark, k=6, bridge=True, drop=None):
    edges = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                e = (base + i, base + j)
                if drop and e == drop:
                    continue
                edges.append(e)
    if bridge:
        edges.append((0, k))
    return LinkGraph(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
        ),
        directed=False,
        n=2 * k,
    )


def test_dendro_incremental_ll_consistent(spark):
    # the MCMC's two-term ΔL must equal a full likelihood recompute
    import random

    rng = random.Random(1)
    n = 10
    adj = [0] * n
    pairs = [(i, (i * 3 + 1) % n) for i in range(n)] + [(0, 5), (2, 7)]
    for s, d in pairs:
        if s != d:
            adj[s] |= 1 << d
            adj[d] |= 1 << s
    den = _Dendro(n, adj, rng)
    ll = den.loglik()
    for _ in range(200):
        c, p, swap_left = den.propose(rng)
        old = den.node_ll(c) + den.node_ll(p)
        den.apply_move(c, p, swap_left)
        ll += den.node_ll(c) + den.node_ll(p) - old
        assert abs(ll - den.loglik()) < 1e-9


def test_hrg_fit_improves_and_deterministic(spark):
    g = _two_cliques(spark, k=5)
    d1 = hrg_fit(g, steps=3000, seed=9)
    d2 = hrg_fit(g, steps=3000, seed=9)
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    # schema + encoding: n-1 internal rows, root -1, leaves 0..n-1 seen
    rows = d1.collect()
    assert len(rows) == g.vcount() - 1
    assert {int(r["node"]) for r in rows} == {-(i + 1) for i in range(g.vcount() - 1)}
    kids = [int(r["left"]) for r in rows] + [int(r["right"]) for r in rows]
    assert {k for k in kids if k >= 0} == set(range(g.vcount()))
    # root's vertices count covers everything
    root = [r for r in rows if int(r["node"]) == -1][0]
    assert int(root["vertices"]) == g.vcount()


def test_pair_probs_every_pair_exactly_once(spark):
    # balanced 8-leaf dendrogram via hrg_create
    left = [-2, -4, -5, 0, 2, 4, 6]
    right = [-3, -6, -7, 1, 3, 5, 7]
    prob = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    d = hrg_create(spark, left, right, prob)
    pp = hrg_pair_probs(d).collect()
    assert len(pp) == 28  # C(8,2), each unordered pair once
    seen = {(int(r["a"]), int(r["b"])) for r in pp}
    assert len(seen) == 28 and all(a < b for a, b in seen)
    m = {(int(r["a"]), int(r["b"])): float(r["prob"]) for r in pp}
    # tree: -1=(-2,-3), -2=(-4,-6), -3=(-5,-7), -4=(0,1), -5=(2,3),
    # -6=(4,5), -7=(6,7). LCA checks across the levels:
    assert m[(0, 1)] == 0.4  # node -4
    assert m[(0, 4)] == 0.2  # node -2 (0 under -4, 4 under -6)
    assert m[(2, 6)] == 0.3  # node -3 (2 under -5, 6 under -7)
    assert m[(0, 2)] == 0.1  # root
    assert m[(4, 6)] == 0.1  # root
    # vertices counts from hrg_create
    sizes = {int(r["node"]): int(r["vertices"]) for r in d.collect()}
    assert sizes[-1] == 8 and sizes[-2] == 4 and sizes[-4] == 2


def test_hrg_game_extremes_and_law(spark):
    left = [-2, 0, 2]
    right = [-3, 1, 3]
    # prob 1 within blocks {0,1} and {2,3}, 0 across
    d = hrg_create(spark, left, right, [0.0, 1.0, 1.0])
    g = hrg_game(d, seed=5)
    got = sorted(
        (int(r["src"]), int(r["dst"])) for r in g.edges.collect()
    )
    assert got == [(0, 1), (2, 3)]
    assert g.vcount() == 4
    # middling probability: edge count within binomial plausibility
    left2 = [-2, 0, 2]
    right2 = [-3, 1, 3]
    d2 = hrg_create(spark, left2, right2, [0.5, 0.5, 0.5])
    cnt = hrg_game(d2, seed=11).ecount()
    assert 0 <= cnt <= 6


def test_hrg_predict_finds_planted_missing_edge(spark):
    # two K6s, one intra-clique edge removed: prediction must rank the
    # removed pair above every absent cross-clique pair
    g = _two_cliques(spark, k=6, bridge=True, drop=(1, 2))
    pred = hrg_predict(g, num_samples=20, steps=4000, seed=3)
    top = pred.first()
    assert (int(top["a"]), int(top["b"])) == (1, 2)
    # and its score beats the best cross-clique candidate clearly
    rows = pred.collect()
    cross = [
        float(r["score"])
        for r in rows
        if (int(r["a"]) < 6) != (int(r["b"]) < 6)
    ]
    planted = [
        float(r["score"])
        for r in rows
        if (int(r["a"]), int(r["b"])) == (1, 2)
    ][0]
    assert planted > max(cross)


def test_hrg_sample_stack_shape(spark):
    g = _two_cliques(spark, k=4)
    s = hrg_sample(g, num_samples=3, steps=500, seed=2)
    n = g.vcount()
    assert s.count() == 3 * (n - 1)
    # every sample is a complete dendrogram and pair probs close per
    # sample: 3 × C(8,2) rows
    pp = hrg_pair_probs(s)
    assert pp.count() == 3 * (n * (n - 1) // 2)


def test_hrg_dendrogram_and_guard(spark):
    left = [-2, 0, 2]
    right = [-3, 1, 3]
    d = hrg_create(spark, left, right, [0.1, 0.9, 0.8])
    tree = hrg_dendrogram(d).collect()
    assert len(tree) == 6  # 2 arcs per internal node
    assert {int(r["parent"]) for r in tree} == {-1, -2, -3}
    g = _two_cliques(spark, k=4)
    try:
        hrg_fit(g, max_vertices=3)
        assert False, "guard should fire"
    except ValueError as e:
        assert "guard" in str(e)


def test_hrg_deep_dendrogram_pair_probs(spark):
    # caterpillar dendrogram of depth n-1 = 69: the ancestor closure
    # must derive its round bound from the input, not a fixed cap
    n = 70
    left = [-(k + 2) for k in range(n - 2)] + [n - 1]
    right = list(range(n - 1))
    d = hrg_create(spark, left, right, [0.5] * (n - 1))
    assert hrg_pair_probs(d).count() == n * (n - 1) // 2


def test_hrg_game_stacked_sample_guard(spark):
    g = _two_cliques(spark, k=4)
    s = hrg_sample(g, num_samples=3, steps=300, seed=5)
    try:
        hrg_game(s)
        assert False, "stacked multi-sample dendrogram must be rejected"
    except ValueError as e:
        assert "sample" in str(e)
    drawn = hrg_game(s, sample=1, seed=11)
    assert drawn.vcount() == g.vcount()
    pairs = drawn.edges.select("src", "dst").collect()
    keys = [(int(r["src"]), int(r["dst"])) for r in pairs]
    assert len(keys) == len(set(keys))  # no duplicate parallel edges
