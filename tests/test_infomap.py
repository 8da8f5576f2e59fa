"""Infomap: codelength vs a brute-force oracle; community recovery."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.infomap import codelength, infomap_communities


def oracle_codelength(n, edges, member):
    """Independent two-level map equation: entropy-form, undirected
    link dynamics (p_a = k_a/2m, q_m = cut_m/2m)."""
    k = defaultdict(float)
    m = 0.0
    for u, v, w in edges:
        k[u] += w
        k[v] += w
        m += w
    m2 = 2.0 * m
    mods = defaultdict(lambda: [0.0, 0.0])  # comm -> [sigma, cut]
    for u in range(n):
        mods[member[u]][0] += k[u]
    for u, v, w in edges:
        if member[u] != member[v]:
            mods[member[u]][1] += w
            mods[member[v]][1] += w

    def H(ps):
        tot = sum(ps)
        return -sum(p / tot * math.log2(p / tot) for p in ps if p > 0) if tot > 0 else 0.0

    q = sum(cut / m2 for _, cut in mods.values())
    L = q * H([cut / m2 for _, cut in mods.values()])
    for comm, (sigma, cut) in mods.items():
        ps = [k[u] / m2 for u in range(n) if member[u] == comm] + [cut / m2]
        L += (sigma / m2 + cut / m2) * H(ps)
    return L


def two_triangles():
    # the classic bridge graph: triangles {0,1,2} and {3,4,5}, bridge 2-3
    return 6, [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
        (2, 3, 1.0),
    ]


def _graph(spark, n, edges):
    return LinkGraph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        n=n,
    )


def test_codelength_matches_oracle(spark):
    n, edges = two_triangles()
    g = _graph(spark, n, edges)
    for member in (
        {i: 0 for i in range(6)},                      # one module
        {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1},          # the true split
        {i: i for i in range(6)},                      # singletons
        {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2},          # a bad split
    ):
        mdf = spark.createDataFrame(list(member.items()), "id long, c long")
        got = codelength(g, mdf)
        want = oracle_codelength(n, edges, member)
        assert got == pytest.approx(want, abs=1e-12), member


def test_infomap_recovers_two_triangles(spark):
    n, edges = two_triangles()
    g = _graph(spark, n, edges)
    lab = {
        int(r["id"]): int(r["label"])
        for r in infomap_communities(g).collect()
    }
    assert {lab[0], lab[1], lab[2]} == {lab[0]} and {lab[3], lab[4], lab[5]} == {lab[3]}
    assert lab[0] != lab[3]
    # and the optimum beats the trivial partitions
    mdf = (
        _graph(spark, n, edges)
        .spark.createDataFrame(list(lab.items()), "id long, c long")
    )
    L_opt = codelength(g, mdf)
    one = spark.createDataFrame([(i, 0) for i in range(6)], "id long, c long")
    sing = spark.createDataFrame([(i, i) for i in range(6)], "id long, c long")
    assert L_opt < codelength(g, one)
    assert L_opt < codelength(g, sing)


def test_infomap_ring_of_cliques(spark):
    # 4 K4s in a ring: infomap must find exactly the 4 cliques
    edges = []
    for c in range(4):
        base = 4 * c
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1.0))
        edges.append((base + 3, (base + 4) % 16, 1.0))
    g = _graph(spark, 16, edges)
    lab = {
        int(r["id"]): int(r["label"])
        for r in infomap_communities(g).collect()
    }
    groups = defaultdict(set)
    for v, l in lab.items():
        groups[l].add(v)
    assert sorted(map(sorted, groups.values())) == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]
    ]


def oracle_codelength_directed(n, arcs, member, damping=0.85, iters=500):
    """Independent directed map equation: PageRank flow (dangling mass
    fully redistributed), recorded teleportation, entropy form."""
    s = defaultdict(float)
    for u, v, w in arcs:
        if u != v:
            s[u] += w
    p = [1.0 / n] * n
    for _ in range(iters):
        dang = sum(p[u] for u in range(n) if s[u] == 0.0)
        base = ((1.0 - damping) * (1.0 - dang) + dang) / n
        nxt = [base] * n
        for u, v, w in arcs:
            if u != v:
                nxt[v] += damping * p[u] * w / s[u]
        p = nxt
    tp = [
        (1.0 - damping) * p[u] + (damping * p[u] if s[u] == 0.0 else 0.0)
        for u in range(n)
    ]
    mods = sorted(set(member.values()))
    q = {}
    for m in mods:
        members = [u for u in range(n) if member[u] == m]
        e_m = sum(
            damping * p[u] * w / s[u]
            for u, v, w in arcs
            if u != v and member[u] == m and member[v] != m
        )
        q[m] = sum(tp[u] for u in members) * (n - len(members)) / n + e_m

    def H(ps):
        tot = sum(ps)
        return (
            -sum(x / tot * math.log2(x / tot) for x in ps if x > 0)
            if tot > 0
            else 0.0
        )

    qt = sum(q.values())
    L = qt * H(list(q.values()))
    for m in mods:
        ps = [p[u] for u in range(n) if member[u] == m] + [q[m]]
        L += sum(ps) * H(ps)
    return L


def directed_two_cycles():
    # two 3-cycles joined by two bridge arcs (strongly connected)
    return 6, [
        (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0),
        (2, 3, 1.0), (5, 0, 1.0),
    ]


def _dgraph(spark, n, arcs):
    return LinkGraph(
        spark.createDataFrame(arcs, "src long, dst long, weight double"),
        directed=True,
        n=n,
    )


def test_codelength_directed_matches_oracle(spark):
    from xdata_igraph_spark.operators.infomap import codelength_directed

    n, arcs = directed_two_cycles()
    # include a dangling vertex: arc into 6, nothing out
    n, arcs = 7, arcs + [(0, 6, 1.0)]
    g = _dgraph(spark, n, arcs)
    for member in (
        {i: 0 for i in range(n)},
        {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0},
        {i: i for i in range(n)},
    ):
        mdf = spark.createDataFrame(list(member.items()), "id long, c long")
        got = codelength_directed(g, mdf)
        want = oracle_codelength_directed(n, arcs, member)
        assert got == pytest.approx(want, abs=1e-9), member


def test_infomap_directed_recovers_two_cycles(spark):
    from xdata_igraph_spark.operators.infomap import (
        codelength_directed,
        infomap_communities_directed,
    )

    n, arcs = directed_two_cycles()
    g = _dgraph(spark, n, arcs)
    # at the default damping 0.85 teleportation dominates a 6-vertex
    # graph and the TRUE optimum is one module (oracle: 2.585 < 2.624);
    # damping 0.95 makes the two-cycle split optimal (2.504 < 2.585)
    d = 0.95
    out = infomap_communities_directed(g, damping=d)
    lab = {int(r["id"]): int(r["label"]) for r in out.collect()}
    assert {lab[0], lab[1], lab[2]} == {lab[0]}
    assert {lab[3], lab[4], lab[5]} == {lab[3]}
    assert lab[0] != lab[3]
    mdf = spark.createDataFrame(list(lab.items()), "id long, c long")
    one = spark.createDataFrame([(i, 0) for i in range(n)], "id long, c long")
    sing = spark.createDataFrame([(i, i) for i in range(n)], "id long, c long")
    L_opt = codelength_directed(g, mdf, damping=d)
    assert L_opt == pytest.approx(
        oracle_codelength_directed(n, arcs, lab, damping=d), abs=1e-9
    )
    assert L_opt < codelength_directed(g, one, damping=d)
    assert L_opt < codelength_directed(g, sing, damping=d)
    # at default damping the optimizer must land on the true optimum
    # (one module), not the planted split
    lab085 = {
        int(r["id"]): int(r["label"])
        for r in infomap_communities_directed(g).collect()
    }
    assert len(set(lab085.values())) == 1
    # determinism + label contract
    lab2 = {
        int(r["id"]): int(r["label"])
        for r in infomap_communities_directed(g, damping=d).collect()
    }
    assert lab2 == lab
    assert lab[0] == 0 and set(lab.values()) == set(range(len(set(lab.values()))))


def test_infomap_directed_symmetric_matches_undirected_structure(spark):
    from xdata_igraph_spark.operators.infomap import infomap_communities_directed

    # 4 K4s in a ring, every edge as two arcs: directed flow must find
    # the same 4 cliques the undirected optimizer does
    arcs = []
    for c in range(4):
        base = 4 * c
        for i in range(4):
            for j in range(i + 1, 4):
                arcs += [(base + i, base + j, 1.0), (base + j, base + i, 1.0)]
        arcs += [(base + 3, (base + 4) % 16, 1.0), ((base + 4) % 16, base + 3, 1.0)]
    g = _dgraph(spark, 16, arcs)
    lab = {
        int(r["id"]): int(r["label"])
        for r in infomap_communities_directed(g).collect()
    }
    groups = defaultdict(set)
    for v, l in lab.items():
        groups[l].add(v)
    assert sorted(map(sorted, groups.values())) == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]
    ]


def test_directed_move_algebra_matches_codelength_diff():
    """Pure-python check (no Spark) that the single-move ΔL algebra
    used by _infomap_moves_directed equals L(after) − L(before) from
    the independent entropy-form oracle, for EVERY vertex → module
    move on a small strongly-connected graph with a dangling vertex."""
    damping = 0.85
    n, arcs = directed_two_cycles()
    n, arcs = 7, arcs + [(0, 6, 1.0)]  # 6 is dangling

    # flow tables exactly as _directed_flow builds them
    s = defaultdict(float)
    for u, v, w in arcs:
        if u != v:
            s[u] += w
    p = [1.0 / n] * n
    for _ in range(500):
        dang = sum(p[u] for u in range(n) if s[u] == 0.0)
        base = ((1.0 - damping) * (1.0 - dang) + dang) / n
        nxt = [base] * n
        for u, v, w in arcs:
            if u != v:
                nxt[v] += damping * p[u] * w / s[u]
        p = nxt
    tp = [
        (1.0 - damping) * p[u] + (damping * p[u] if s[u] == 0.0 else 0.0)
        for u in range(n)
    ]
    flow = defaultdict(float)
    for u, v, w in arcs:
        if u != v:
            flow[(u, v)] += damping * p[u] * w / s[u]

    def fent(x):
        return x * math.log2(x) if x > 0 else 0.0

    def move_dl(member, i, c):
        a = member[i]
        mods = set(member.values())
        P = {m: sum(tp[u] for u in range(n) if member[u] == m) for m in mods}
        PM = {m: sum(p[u] for u in range(n) if member[u] == m) for m in mods}
        NM = {m: sum(1 for u in range(n) if member[u] == m) for m in mods}
        E = {m: 0.0 for m in mods}
        for (u, v), f in flow.items():
            if member[u] != member[v]:
                E[member[u]] += f
        q = {m: P[m] * (n - NM[m]) / n + E[m] for m in mods}
        q_all = sum(q.values())
        fo = sum(f for (u, v), f in flow.items() if u == i)
        fo_own = sum(f for (u, v), f in flow.items() if u == i and member[v] == a)
        fi_own = sum(f for (u, v), f in flow.items() if v == i and member[u] == a)
        fo_c = sum(f for (u, v), f in flow.items() if u == i and member[v] == c)
        fi_c = sum(f for (u, v), f in flow.items() if v == i and member[u] == c)
        ea_n = E[a] - (fo - fo_own) + fi_own
        ec_n = E[c] + (fo - fo_c) - fi_c
        qa_n = (P[a] - tp[i]) * (n - (NM[a] - 1)) / n + ea_n
        qc_n = (P[c] + tp[i]) * (n - (NM[c] + 1)) / n + ec_n
        pa_n, pc_n = PM[a] - p[i], PM[c] + p[i]
        q_new = q_all + qa_n + qc_n - q[a] - q[c]
        return (
            (fent(q_new) - fent(q_all))
            - 2.0 * (fent(qa_n) + fent(qc_n) - fent(q[a]) - fent(q[c]))
            + (
                fent(qa_n + pa_n)
                + fent(qc_n + pc_n)
                - fent(q[a] + PM[a])
                - fent(q[c] + PM[c])
            )
        )

    for member in (
        {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0},
        {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2},
        {i: i for i in range(7)},
    ):
        for i in range(n):
            for c in set(member.values()):
                if c == member[i]:
                    continue
                before = oracle_codelength_directed(n, arcs, member)
                after_m = dict(member)
                after_m[i] = c
                after = oracle_codelength_directed(n, arcs, after_m)
                got = move_dl(member, i, c)
                assert got == pytest.approx(after - before, abs=1e-9), (
                    member, i, c,
                )


def test_infomap_deterministic_and_label_contract(spark):
    n, edges = two_triangles()
    g = _graph(spark, n, edges)
    a = sorted(map(tuple, infomap_communities(g).collect()))
    b = sorted(map(tuple, infomap_communities(g).collect()))
    assert a == b
    # labels dense 0..k-1 by first appearance in id order
    labels = [l for _, l in a]
    assert labels[0] == 0
    assert set(labels) == set(range(len(set(labels))))
