"""Subgraph isomorphism — relational VF2/LAD-style pattern matching.

Reference: igraph_subisomorphic_vf2 / igraph_count_subisomorphisms_vf2
/ igraph_get_subisomorphisms_vf2 (/root/reference/src/topology.c:2440,
2523,2617 — VF2 matches *induced* subgraphs), igraph_subisomorphic_lad
(/root/reference/src/lad.c:1422 — ``induced`` optional, default
monomorphism), igraph_isomorphic / igraph_count_isomorphisms_vf2
(topology.c:1638,1909). The reference backtracks over in-memory
adjacency; the distributed plan is iterative candidate-extension
joins — the same shape as the clique lister (cliques.py), generalized
to an arbitrary small pattern:

- the PATTERN is tiny and driver-side (a list of (u, v) pairs over
  vertices 0..p-1); the HOST graph is the distributed DataFrame;
- pattern vertices are ordered greedily by back-connectivity (most
  edges into the already-placed prefix first), so every extension join
  is anchored on at least one adjacency and fan-out stays bounded by
  real matches, not |V|;
- a partial mapping is one DataFrame row (array ``ms``); extending by
  pattern vertex k = one equi-join on the host arc table per required
  back-edge (left_semi), one left_anti per forbidden pair in induced
  mode, plus an injectivity filter — all JVM-side column ops;
- per-level row guard (same spirit as cliques.py / flow.py): the
  match count is worst-case exponential in pattern size, so exceeding
  the cap raises instead of silently materializing it.

Semantics parity: mappings are injective; every distinct injective map
counts (so a triangle pattern yields 6 rows per host triangle, exactly
like igraph_count_subisomorphisms_vf2). ``induced=True`` reproduces
VF2 (non-edges of the pattern must map to non-edges); ``induced=False``
reproduces LAD's default monomorphism. Multi-edges collapse (distinct
arcs); a pattern loop requires a host loop on the image vertex.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _pattern_order(p: int, edges: list[tuple[int, int]]) -> list[int]:
    """Greedy ordering: start at max degree, then most-back-connected
    first (ties: higher total degree, lower id). Disconnected pattern
    components start a fresh anchor-less level (cross join, guarded)."""
    adj: dict[int, set[int]] = {v: set() for v in range(p)}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    order: list[int] = []
    placed: set[int] = set()
    while len(order) < p:
        best, best_key = -1, None
        for v in range(p):
            if v in placed:
                continue
            key = (len(adj[v] & placed), len(adj[v]), -v)
            if best_key is None or key > best_key:
                best, best_key = v, key
        order.append(best)
        placed.add(best)
    return order


def subisomorphisms(
    graph: LinkGraph,
    pattern_edges: Sequence[tuple[int, int]],
    n_pattern: int | None = None,
    induced: bool = False,
    max_level_rows: int = 50_000_000,
    root_limit: int | None = None,
) -> DataFrame:
    """All injective mappings of the pattern into ``graph`` →
    one row per mapping, column ``map`` (array<long>; ``map[i]`` is
    the host image of pattern vertex i).

    igraph_get_subisomorphisms_vf2 semantics with ``induced=True``
    (topology.c:2617); igraph_subisomorphic_lad's monomorphism with
    ``induced=False`` (lad.c:1422). Directedness follows the host
    graph, matching the reference's same-directedness requirement.
    """
    edges = [(int(u), int(v)) for u, v in pattern_edges]
    p = (max((max(u, v) for u, v in edges), default=-1) + 1) if n_pattern is None else int(n_pattern)
    spark = graph.spark
    if p == 0:
        return spark.createDataFrame([], "map array<bigint>")

    directed = graph.directed
    if directed:
        arcs = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        loops = graph.edges.select("src", "dst").filter(F.col("src") == F.col("dst")).distinct()
        p_arcs = {(u, v) for u, v in edges if u != v}
    else:
        arcs = (
            graph.symmetrized()
            .select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        loops = (
            graph.symmetrized()
            .select("src", "dst")
            .filter(F.col("src") == F.col("dst"))
            .distinct()
        )
        p_arcs = {(u, v) for u, v in edges if u != v} | {(v, u) for u, v in edges if u != v}
    arcs = arcs.localCheckpointFlat(eager=True)
    p_loops = {u for u, v in edges if u == v}

    # degree lower bound: a host candidate must have at least the
    # pattern vertex's out-/in-degree (holds for both modes).
    p_out = {v: sum(1 for a, b in p_arcs if a == v) for v in range(p)}
    p_in = {v: sum(1 for a, b in p_arcs if b == v) for v in range(p)}
    host_deg = (
        arcs.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
        .unionAll(arcs.select(F.col("dst").alias("id"), F.lit(0), F.lit(1)))
        .groupBy("id")
        .agg(F.sum("o").alias("outd"), F.sum("i").alias("ind"))
    )
    vert = (
        graph.vertices()
        .join(host_deg, "id", "left")
        .fillna(0, subset=["outd", "ind"])
        .localCheckpointFlat(eager=True)
    )

    order = _pattern_order(p, edges)
    pos = {v: k for k, v in enumerate(order)}  # pattern vertex -> level index

    def _candidates(v: int) -> DataFrame:
        c = vert.filter(
            (F.col("outd") >= p_out[v]) & (F.col("ind") >= p_in[v])
        ).select("id")
        if v in p_loops:
            c = c.join(loops.select(F.col("src").alias("id")), "id", "left_semi")
        elif induced:
            # induced: a pattern non-loop must map to a host non-loop
            c = c.join(loops.select(F.col("src").alias("id")), "id", "left_anti")
        return c

    level = _candidates(order[0]).select(F.array("id").alias("ms"))
    if root_limit is not None:
        # decision-probe mode: only mappings rooted at a bounded subset
        # of hosts — sound for "an embedding exists", NOT exhaustive
        level = level.limit(root_limit)
    for k in range(1, p):
        v = order[k]
        placed = order[:k]
        # back-constraints against already-placed pattern vertices
        req: list[tuple[int, str]] = []  # (level position j, 'fwd' = ms[j]->w)
        for j, u in enumerate(placed):
            if (u, v) in p_arcs:
                req.append((j, "fwd"))
            if directed and (v, u) in p_arcs:
                req.append((j, "bwd"))
        if induced:
            forb = [
                (j, d)
                for j, u in enumerate(placed)
                for d in (("fwd", "bwd") if directed else ("fwd",))
                if (j, d) not in req
                and ((u, v) not in p_arcs if d == "fwd" else (v, u) not in p_arcs)
            ]
        else:
            forb = []

        if req:
            j0, d0 = req[0]
            a0 = (
                arcs.select(F.col("src").alias("_a"), F.col("dst").alias("w"))
                if d0 == "fwd"
                else arcs.select(F.col("dst").alias("_a"), F.col("src").alias("w"))
            )
            cur = (
                level.withColumn("_a", F.col("ms")[j0])
                .join(a0, "_a")
                .drop("_a")
            )
            rest = req[1:]
        else:
            cur = level.crossJoin(_candidates(v).select(F.col("id").alias("w")))
            rest = []
        cur = cur.filter(~F.array_contains("ms", F.col("w")))
        if v in p_loops:
            cur = cur.join(
                loops.select(F.col("src").alias("w")), "w", "left_semi"
            )
        elif induced:
            cur = cur.join(
                loops.select(F.col("src").alias("w")), "w", "left_anti"
            )
        for j, d in rest:
            aj = (
                arcs.select(F.col("src").alias("_u"), F.col("dst").alias("w"))
                if d == "fwd"
                else arcs.select(F.col("dst").alias("_u"), F.col("src").alias("w"))
            )
            cur = (
                cur.withColumn("_u", F.col("ms")[j])
                .join(aj, ["_u", "w"], "left_semi")
                .drop("_u")
            )
        for j, d in forb:
            aj = (
                arcs.select(F.col("src").alias("_u"), F.col("dst").alias("w"))
                if d == "fwd"
                else arcs.select(F.col("dst").alias("_u"), F.col("src").alias("w"))
            )
            cur = (
                cur.withColumn("_u", F.col("ms")[j])
                .join(aj, ["_u", "w"], "left_anti")
                .drop("_u")
            )
        level = cur.select(
            F.concat("ms", F.array("w")).alias("ms")
        ).localCheckpointFlat(eager=True)
        n_level = level.count()
        if n_level > max_level_rows:
            raise ValueError(
                f"subisomorphism level {k + 1} holds {n_level} partial "
                f"mappings (> max_level_rows={max_level_rows}); bound the "
                "pattern or raise max_level_rows explicitly"
            )

    # un-permute: map[i] = image of ORIGINAL pattern vertex i
    return level.select(
        F.array(*[F.col("ms")[pos[i]] for i in range(p)]).alias("map")
    )


def count_subisomorphisms(
    graph: LinkGraph,
    pattern_edges: Sequence[tuple[int, int]],
    n_pattern: int | None = None,
    induced: bool = False,
    max_level_rows: int = 50_000_000,
) -> int:
    """igraph_count_subisomorphisms_vf2 (topology.c:2523) — number of
    injective pattern→host mappings (automorphic images all count)."""
    return subisomorphisms(
        graph, pattern_edges, n_pattern, induced, max_level_rows
    ).count()


def subisomorphic(
    graph: LinkGraph,
    pattern_edges: Sequence[tuple[int, int]],
    n_pattern: int | None = None,
    induced: bool = False,
    probe_roots: int = 1024,
) -> bool:
    """igraph_subisomorphic_vf2 (topology.c:2482) decision form.

    Fast path: the enumeration is first restricted to ``probe_roots``
    candidate hosts for the first pattern vertex — a completion there
    is a sound True without materializing every partial mapping on a
    large host. Only a probe miss falls back to the complete
    enumeration, whose empty result is the sound False."""
    if probe_roots:
        hit = subisomorphisms(
            graph, pattern_edges, n_pattern, induced, root_limit=probe_roots
        ).take(1)
        if hit:
            return True
    return (
        subisomorphisms(graph, pattern_edges, n_pattern, induced).take(1) != []
    )


def _small_edge_list(graph: LinkGraph, max_n: int) -> tuple[int, list[tuple[int, int]]]:
    n = graph.vcount()
    if n > max_n:
        raise ValueError(
            f"graph has {n} vertices (> max_n={max_n}); whole-graph "
            "isomorphism is driver-side by design (the reference's VF2 "
            "is equally sequential) — raise max_n explicitly for larger "
            "inputs"
        )
    rows = graph.edges.select("src", "dst").collect()
    arcs = [(int(r["src"]), int(r["dst"])) for r in rows]
    canon = (
        arcs
        if graph.directed
        else [(min(u, v), max(u, v)) for u, v in arcs]
    )
    if len(set(canon)) != len(canon) or any(u == v for u, v in arcs):
        # collapsing multi-edges/loops to the simple support would make
        # non-isomorphic multigraphs compare equal; the reference's VF2
        # rejects them too (topology.c VF2 assumes simple graphs)
        raise ValueError(
            "whole-graph isomorphism requires a simple graph (no "
            "multi-edges or loops; an undirected edge stored BOTH ways "
            "counts as a multi-edge under the canonical-once data "
            "model, graph.py:19); simplify() first if the collapsed "
            "comparison is intended"
        )
    return n, arcs


def isomorphic(g1: LinkGraph, g2: LinkGraph, max_n: int = 256) -> bool:
    """igraph_isomorphic (topology.c:1638): whole-graph isomorphism.

    Cheap invariants first (vertex count, distinct-arc count, degree
    multiset), then one induced-subisomorphism run of the smaller
    description into the other: with |V| equal, any injective induced
    embedding is a bijection, i.e. an isomorphism."""
    if g1.directed != g2.directed:
        raise ValueError("graphs must have the same directedness")
    n1, e1 = _small_edge_list(g1, max_n)
    n2, e2 = _small_edge_list(g2, max_n)
    if n1 != n2:
        return False

    def _canon_arcs(edges: list[tuple[int, int]], directed: bool) -> set:
        if directed:
            return {(u, v) for u, v in edges}
        return {(min(u, v), max(u, v)) for u, v in edges}

    a1, a2 = _canon_arcs(e1, g1.directed), _canon_arcs(e2, g2.directed)
    if len(a1) != len(a2):
        return False

    def _deg_multiset(n: int, arcs: set, directed: bool) -> list:
        if directed:
            outd = [0] * n
            ind = [0] * n
            for u, v in arcs:
                outd[u] += 1
                ind[v] += 1
            return sorted(zip(outd, ind))
        d = [0] * n
        for u, v in arcs:
            d[u] += 1
            if u != v:
                d[v] += 1
        return sorted(d)

    if _deg_multiset(n1, a1, g1.directed) != _deg_multiset(n2, a2, g2.directed):
        return False
    return subisomorphic(g1, e2, n_pattern=n2, induced=True)


def count_isomorphisms(g1: LinkGraph, g2: LinkGraph, max_n: int = 256) -> int:
    """igraph_count_isomorphisms_vf2 (topology.c:1675); with
    ``g2 is g1`` this is the automorphism count."""
    if g1.directed != g2.directed:
        raise ValueError("graphs must have the same directedness")
    n1, _ = _small_edge_list(g1, max_n)
    n2, e2 = _small_edge_list(g2, max_n)
    if n1 != n2:
        return 0
    return count_subisomorphisms(g1, e2, n_pattern=n2, induced=True)


def count_automorphisms(graph: LinkGraph, max_n: int = 256) -> int:
    """|Aut(G)| via count_isomorphisms(G, G) — the reference exposes
    this through igraph_count_isomorphisms_vf2(graph, graph)."""
    return count_isomorphisms(graph, graph, max_n=max_n)
