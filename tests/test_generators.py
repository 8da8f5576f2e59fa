"""Generator semantics vs the reference's definitions
(/root/reference/src/structure_generators.c, src/games.c)."""

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.sources import generators as G
from xdata_igraph_spark.operators.triangles import count_triangles
from xdata_igraph_spark.operators.components import is_connected


def edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def test_star_out(spark):
    g = G.star(spark, 5, mode="out")
    assert g.directed and g.vcount() == 5
    assert edge_set(g) == {(0, 1), (0, 2), (0, 3), (0, 4)}


def test_star_in_and_mutual(spark):
    assert edge_set(G.star(spark, 4, mode="in")) == {(1, 0), (2, 0), (3, 0)}
    assert edge_set(G.star(spark, 3, mode="mutual")) == {
        (0, 1), (0, 2), (1, 0), (2, 0),
    }


def test_ring_circular_and_path(spark):
    g = G.ring(spark, 5)
    assert edge_set(g) == {(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)}
    p = G.ring(spark, 5, circular=False)
    assert edge_set(p) == {(0, 1), (1, 2), (2, 3), (3, 4)}


def test_tree(spark):
    g = G.tree(spark, 7, children=2)
    assert edge_set(g) == {(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)}
    gin = G.tree(spark, 4, children=2, mode="in")
    assert edge_set(gin) == {(1, 0), (2, 0), (3, 1)}


def test_full_and_citation(spark):
    assert G.full(spark, 5).ecount() == 10
    assert G.full(spark, 4, directed=True).ecount() == 12
    assert G.full(spark, 3, loops=True).ecount() == 6
    fc = G.full_citation(spark, 4)
    assert (3, 0) in edge_set(fc) and (0, 3) not in edge_set(fc)
    assert fc.ecount() == 6


def test_lattice(spark):
    g = G.lattice(spark, [3, 4])
    # grid edges: 3*3 vertical? rows=3,cols=4: horizontal 3*3=9? compute:
    # edges along dim0 (stride 4): (3-1)*4 = 8; dim1 (stride 1): 3*(4-1) = 9
    assert g.vcount() == 12 and g.ecount() == 17
    circ = G.lattice(spark, [4], circular=True)
    assert edge_set(circ) == {(0, 1), (1, 2), (2, 3), (3, 0)}


def test_de_bruijn(spark):
    g = G.de_bruijn(spark, 2, 3)
    assert g.vcount() == 8 and g.ecount() == 16
    es = edge_set(g)
    assert (0, 0) in es and (0, 1) in es and (7, 7) in es


def test_zachary(spark):
    g = G.famous(spark, "zachary")
    assert g.vcount() == 34 and g.ecount() == 78 and not g.directed
    # 45 triangles in the karate club — classic published value
    assert count_triangles(g) == 45


def test_famous_small(spark):
    assert G.famous(spark, "bull").ecount() == 5
    assert G.famous(spark, "petersen").ecount() == 15
    # Petersen graph is 3-regular and triangle-free
    p = G.famous(spark, "petersen")
    assert p.maxdegree() == 3 and count_triangles(p) == 0
    with pytest.raises(ValueError):
        G.famous(spark, "nonexistent")


def test_gnm_invariants(spark):
    g = G.gnm(spark, 100, 300, seed=7)
    e = g.edges
    assert g.ecount() == 300
    assert e.filter(F.col("src") == F.col("dst")).count() == 0  # no loops
    assert e.select("src", "dst").distinct().count() == 300  # simple
    assert e.agg(F.max(F.greatest("src", "dst"))).first()[0] < 100
    # undirected canonical: src < dst after decode
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
    # deterministic for a seed
    g2 = G.gnm(spark, 100, 300, seed=7)
    assert edge_set(g) == edge_set(g2)
    # different seed differs
    g3 = G.gnm(spark, 100, 300, seed=8)
    assert edge_set(g) != edge_set(g3)


def test_gnm_directed(spark):
    g = G.gnm(spark, 50, 200, directed=True, seed=3)
    assert g.ecount() == 200
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0


def test_gnp_invariants(spark):
    g = G.gnp(spark, 80, 0.1, seed=11)
    m = g.ecount()
    # E[m] = 0.1 * 80*79/2 = 316; loose 4-sigma band
    assert 220 < m < 420
    assert g.edges.filter(F.col("src") >= F.col("dst")).count() == 0


def test_barabasi(spark):
    g = G.barabasi(spark, 50, m=2, seed=5)
    # v=1 adds 1 edge (min(m, v)); v>=2 add 2 → 1 + 48*2 = 97
    assert g.ecount() == 97
    assert is_connected(g)


def test_watts_strogatz(spark):
    g0 = G.watts_strogatz(spark, 20, nei=2, p=0.0)
    assert g0.ecount() == 40
    es = edge_set(g0)
    assert (0, 1) in es and (0, 2) in es
    g1 = G.watts_strogatz(spark, 200, nei=2, p=0.3, seed=9)
    assert g1.ecount() == 400  # rewiring preserves edge count
    assert edge_set(g1) != edge_set(G.watts_strogatz(spark, 200, nei=2, p=0.0))


def test_grg_matches_bruteforce(spark):
    from xdata_igraph_spark.sources.generators import grg

    for torus in (False, True):
        g, pts = grg(spark, 250, 0.09, torus=torus, seed=5)
        xy = {r["id"]: (r["x"], r["y"]) for r in pts.collect()}
        want = set()
        for a in range(250):
            for b in range(a + 1, 250):
                dx = abs(xy[a][0] - xy[b][0])
                dy = abs(xy[a][1] - xy[b][1])
                if torus:
                    dx = 1 - dx if dx > 0.5 else dx
                    dy = 1 - dy if dy > 0.5 else dy
                if dx * dx + dy * dy < 0.09 * 0.09:
                    want.add((a, b))
        got = {(r["src"], r["dst"]) for r in g.edges.collect()}
        assert got == want, f"torus={torus}"
        assert len(want) > 0


def test_k_regular_game(spark):
    from xdata_igraph_spark.sources.generators import k_regular_game

    g = k_regular_game(spark, 20, 3, seed=3)
    degs = {r["id"]: r["degree"] for r in g.degrees("all").collect()}
    assert len(degs) == 20 and all(v == 3 for v in degs.values())
    assert g.is_simple()
    with pytest.raises(ValueError, match="even"):
        k_regular_game(spark, 5, 3)


def test_static_power_law(spark):
    from xdata_igraph_spark.sources.generators import static_power_law

    g = static_power_law(spark, 120, 260, 2.5, seed=9)
    assert not g.directed
    assert g.vcount() == 120 and g.ecount() == 260
    assert g.is_simple()
    # heavy-tail sanity: max degree well above the mean
    md = g.maxdegree()
    assert md >= 3 * (2 * 260 / 120)

    gd = static_power_law(spark, 120, 260, 2.5, exponent_in=2.2, seed=9)
    assert gd.directed and gd.ecount() == 260
    with pytest.raises(ValueError, match="exponent"):
        static_power_law(spark, 10, 5, 1.5)


def test_interconnected_islands(spark):
    from xdata_igraph_spark.sources.generators import interconnected_islands

    g = interconnected_islands(spark, 3, 8, 0.9, 2, seed=4)
    assert g.vcount() == 24
    rows = g.edges.collect()
    inter = [(r["src"], r["dst"]) for r in rows if r["src"] // 8 != r["dst"] // 8]
    intra = [(r["src"], r["dst"]) for r in rows if r["src"] // 8 == r["dst"] // 8]
    # each of the 3 island pairs gets ≤ n_inter (collapsing dups) and ≥ 1 edges
    from collections import Counter

    per_pair = Counter((min(a // 8, b // 8), max(a // 8, b // 8)) for a, b in inter)
    assert set(per_pair) == {(0, 1), (0, 2), (1, 2)}
    assert all(1 <= v <= 2 for v in per_pair.values())
    # pin=0.9 on C(8,2)=28 pairs per island: expect dense islands
    assert len(intra) > 3 * 28 * 0.6
