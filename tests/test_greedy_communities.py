"""fastgreedy (CNM) and Girvan-Newman edge-betweenness communities."""

import pytest

from tests.fixtures import ZACHARY_EDGES, ZACHARY_N
from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.fastgreedy import community_fastgreedy
from xdata_igraph_spark.operators.gn import community_edge_betweenness
from xdata_igraph_spark.operators.lpa import modularity


def ring_of_cliques(k=4, size=5):
    """k cliques of `size`, ring-bridged: planted partition."""
    edges = []
    for c in range(k):
        base = c * size
        edges += [
            (base + i, base + j) for i in range(size) for j in range(i + 1, size)
        ]
        edges.append((base, ((c + 1) % k) * size + 1))
    return k * size, edges


def membership_groups(df):
    rows = df.collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["label"], set()).add(r["id"])
    return sorted(groups.values(), key=min)


def test_fastgreedy_ring_of_cliques(spark):
    n, edges = ring_of_cliques()
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    mem = community_fastgreedy(g)
    groups = membership_groups(mem)
    assert groups == [set(range(c * 5, c * 5 + 5)) for c in range(4)]


def test_fastgreedy_karate_modularity(spark):
    g = LinkGraph.from_pairs(spark, ZACHARY_EDGES, directed=False, n=ZACHARY_N)
    mem, info = community_fastgreedy(g, return_details=True)
    # CNM on karate: Q = 0.3807, 3 communities (Clauset-Newman-Moore
    # 2004; igraph fastgreedy reproduces it)
    assert abs(info["modularity"] - 0.3807) < 0.002
    assert mem.select("label").distinct().count() == 3
    # driver-side incremental Q agrees with the distributed modularity
    assert abs(modularity(g, mem, weighted=False) - info["modularity"]) < 1e-9


def test_fastgreedy_weighted_pulls_heavy_edge(spark):
    # two triangles bridged by a HEAVY edge: unweighted splits 2,
    # heavy bridge merges into 1 at high enough weight
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
        (2, 3, 100.0),
    ]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=6)
    unw = community_fastgreedy(g, weighted=False)
    assert unw.select("label").distinct().count() == 2
    wtd = community_fastgreedy(g, weighted=True)
    labels = {r["label"] for r in wtd.filter("id in (2,3)").collect()}
    assert len(labels) == 1  # heavy bridge endpoints co-clustered


def test_fastgreedy_guard(spark):
    n, edges = ring_of_cliques()
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    with pytest.raises(ValueError, match="guarded"):
        community_fastgreedy(g, max_edges=3)


def test_gn_bridge_removed_first(spark):
    # two K4s + one bridge: the bridge carries all 16 cross geodesics
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    edges = k4a + k4b + [(0, 4)]
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=8)
    mem, info = community_edge_betweenness(g, return_details=True)
    assert info["removed_edges"][0] == (0, 4)
    groups = membership_groups(mem)
    assert groups == [{0, 1, 2, 3}, {4, 5, 6, 7}]
    assert abs(modularity(g, mem, weighted=False) - info["modularity"]) < 1e-9


def test_gn_ring_of_cliques(spark):
    n, edges = ring_of_cliques(k=3, size=4)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    mem = community_edge_betweenness(g)
    groups = membership_groups(mem)
    assert groups == [set(range(c * 4, c * 4 + 4)) for c in range(3)]


def test_gn_isolated_vertices_are_singletons(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (0, 2)], directed=False, n=5)
    mem = community_edge_betweenness(g)
    groups = membership_groups(mem)
    assert groups == [{0, 1, 2}, {3}, {4}]
