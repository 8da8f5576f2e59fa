"""HITS / eigenvector / shortest-path / structure operators vs dense
numpy oracles and closed-form fixtures."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.centrality import hits, eigenvector_centrality
from xdata_igraph_spark.operators.paths import (
    average_path_length,
    diameter,
    distances_from,
    is_dag,
    shortest_paths,
    topological_sorting,
)
from xdata_igraph_spark.operators.structure import (
    avg_nearest_neighbor_degree,
    dyad_census,
    linegraph,
    neighborhood_size,
    permute_vertices,
)
from xdata_igraph_spark.sources import generators as G

from tests.oracles import gnm_edges


# ---------------------------------------------------------------------------
# centrality
# ---------------------------------------------------------------------------


def _principal_eig(M):
    vals, vecs = np.linalg.eig(M)
    i = int(np.argmax(vals.real))
    v = np.abs(vecs[:, i].real)
    return v / v.max()


def test_eigenvector_vs_numpy(spark):
    n, edges = 30, gnm_edges(30, 80, False, seed=4)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1
        A[d, s] += 1
    want = _principal_eig(A)
    got_rows = eigenvector_centrality(g, tol=1e-10).collect()
    got = np.zeros(n)
    for r in got_rows:
        got[r["id"]] = r["centrality"]
    assert np.allclose(got, want, atol=1e-6)


def test_hits_vs_numpy(spark):
    n, edges = 25, gnm_edges(25, 90, True, seed=6)
    g = LinkGraph.from_pairs(spark, edges, directed=True, n=n)
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1
    hub_want = _principal_eig(A @ A.T)
    auth_want = _principal_eig(A.T @ A)
    rows = hits(g, tol=1e-10, max_iter=300).collect()
    hub = np.zeros(n)
    auth = np.zeros(n)
    for r in rows:
        hub[r["id"]] = r["hub"]
        auth[r["id"]] = r["authority"]
    assert np.allclose(hub, hub_want, atol=1e-5)
    assert np.allclose(auth, auth_want, atol=1e-5)


def test_hits_star(spark):
    # out-star: center is the sole hub, leaves the authorities
    g = G.star(spark, 5, mode="out")
    rows = {r["id"]: r for r in hits(g).collect()}
    assert rows[0]["hub"] == pytest.approx(1.0)
    for i in range(1, 5):
        assert rows[i]["authority"] == pytest.approx(1.0)
        assert rows[i]["hub"] == pytest.approx(0.0, abs=1e-12)


# ---------------------------------------------------------------------------
# paths
# ---------------------------------------------------------------------------


def _bfs_dist(n, edges, src, directed):
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    dist = {src: 0}
    q = [src]
    while q:
        nq = []
        for u in q:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nq.append(v)
        q = nq
    return dist


def test_bfs_distances_vs_oracle(spark):
    n, edges = 40, gnm_edges(40, 70, False, seed=12)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    got = {r["id"]: r["dist"] for r in distances_from(g, 0, mode="all").collect()}
    want = _bfs_dist(n, edges, 0, directed=False)
    assert got == {k: float(v) for k, v in want.items()}


def test_weighted_shortest_paths(spark):
    # diamond: 0->1 (1), 0->2 (5), 1->2 (1), 2->3 (1), 1->3 (10)
    pairs = [(0, 1, 1.0), (0, 2, 5.0), (1, 2, 1.0), (2, 3, 1.0), (1, 3, 10.0)]
    g = LinkGraph.from_pairs(spark, pairs, directed=True)
    got = {r["id"]: r["dist"] for r in distances_from(g, 0, weighted=True).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_negative_weight_rejected(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1, -1.0)], directed=True)
    with pytest.raises(ValueError):
        shortest_paths(g, [0], weighted=True)


def test_diameter_and_apl_ring(spark):
    g = G.ring(spark, 8)
    assert diameter(g) == 4.0
    # ring APL: mean of d(i,j) over ordered pairs = (1+1+2+2+3+3+4)/7
    assert average_path_length(g) == pytest.approx((1 + 1 + 2 + 2 + 3 + 3 + 4) / 7)


def test_topological_sort_and_is_dag(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True)
    rows = {r["id"]: (r["layer"], r["order"]) for r in topological_sorting(g).collect()}
    assert rows[0][0] == 0 and rows[3][0] == 2
    assert rows[1][0] == rows[2][0] == 1
    orders = [rows[i][1] for i in (0, 1, 2, 3)]
    assert sorted(orders) == [0, 1, 2, 3] and orders[0] == 0 and orders[3] == 3
    assert is_dag(g)
    cyc = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    assert not is_dag(cyc)


# ---------------------------------------------------------------------------
# structure
# ---------------------------------------------------------------------------


def test_neighborhood_size(spark):
    g = G.ring(spark, 10)
    s1 = {r["id"]: r["size"] for r in neighborhood_size(g, 1).collect()}
    assert all(v == 3 for v in s1.values())  # self + 2 neighbors
    s2 = {r["id"]: r["size"] for r in neighborhood_size(g, 2).collect()}
    assert all(v == 5 for v in s2.values())
    m1 = {r["id"]: r["size"] for r in neighborhood_size(g, 1, mindist=1).collect()}
    assert all(v == 2 for v in m1.values())


def test_annd_star(spark):
    g = G.star(spark, 5, mode="undirected")
    rows = {r["id"]: r["knn"] for r in avg_nearest_neighbor_degree(g).collect()}
    assert rows[0] == pytest.approx(1.0)  # center's neighbors are leaves (deg 1)
    for i in range(1, 5):
        assert rows[i] == pytest.approx(4.0)


def test_dyad_census(spark):
    # 4 vertices: mutual 0<->1, asymmetric 2->3
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 0), (2, 3)], directed=True)
    assert dyad_census(g) == (1, 1, 4)


def test_linegraph_undirected_count(spark):
    # undirected line graph has sum(d choose 2) edges
    n, edges = 20, gnm_edges(20, 40, False, seed=2)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    deg = {i: 0 for i in range(n)}
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    want = sum(d * (d - 1) // 2 for d in deg.values())
    assert linegraph(g).count() == want


def test_linegraph_directed_path(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 3)], directed=True)
    lg = {(r["src"], r["dst"]) for r in linegraph(g).collect()}
    assert lg == {(0, 1), (1, 2)}  # edge ids in (src,dst) sort order


def test_permute_roundtrip(spark):
    n, edges = 15, gnm_edges(15, 30, False, seed=9)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    perm = spark.createDataFrame(
        [(i, (i * 7 + 3) % n) for i in range(n)], "id long, new_id long"
    )
    pg = permute_vertices(g, perm)
    assert pg.ecount() == g.ecount()
    back = perm.select(
        F.col("new_id").alias("id"), F.col("id").alias("new_id")
    )
    rt = permute_vertices(pg, back)
    assert {(r["src"], r["dst"]) for r in rt.edges.collect()} == set(edges)


def test_neighborhood_members_ring(spark):
    from xdata_igraph_spark.operators.structure import neighborhood

    g = G.ring(spark, 10)
    m1 = {r["id"]: r["members"] for r in neighborhood(g, 1).collect()}
    assert m1[0] == [0, 1, 9]
    assert m1[5] == [4, 5, 6]
    m2 = {r["id"]: r["members"] for r in neighborhood(g, 2, mindist=1).collect()}
    assert m2[0] == [1, 2, 8, 9]


def test_neighborhood_members_directed_modes(spark):
    from xdata_igraph_spark.operators.structure import neighborhood

    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (3, 0)], directed=True)
    out1 = {r["id"]: r["members"] for r in neighborhood(g, 1, mode="out").collect()}
    assert out1[0] == [0, 1] and out1[2] == [2] and out1[3] == [0, 3]
    in1 = {r["id"]: r["members"] for r in neighborhood(g, 1, mode="in").collect()}
    assert in1[0] == [0, 3] and in1[1] == [0, 1]


def test_neighborhood_graphs_triangle_plus_tail(spark):
    from xdata_igraph_spark.operators.structure import neighborhood_graphs

    # triangle 0-1-2 plus tail 2-3
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=False)
    rows = neighborhood_graphs(g, 1).collect()
    per_ego = {}
    for r in rows:
        per_ego.setdefault(r["ego"], set()).add((r["src"], r["dst"]))
    # ego 0's 1-hop = {0,1,2}: all three triangle edges, not the tail
    assert per_ego[0] == {(0, 1), (1, 2), (2, 0)}
    # ego 3's 1-hop = {2,3}: only the tail edge
    assert per_ego[3] == {(2, 3)}
    # ego 2 sees everything
    assert per_ego[2] == {(0, 1), (1, 2), (2, 0), (2, 3)}
