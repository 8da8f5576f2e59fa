"""Directed motif census, sizes 3 and 4 — igraph isoclass numbering.

Reference: igraph_motifs_randesu (/root/reference/src/motifs.c:63) for
directed graphs, whose histogram is indexed by igraph_isoclass
(/root/reference/src/topology.c:697). The isoclass numbering is fully
determined by two mathematical rules, both re-derived here from first
principles (no reference tables shipped):

- each ordered arc (i, j) of a k-vertex digraph owns a fixed bit in a
  k(k−1)-bit code (the reference's idx layout: bits are assigned
  column-major over the off-diagonal adjacency matrix, most
  significant for (0, k−1));
- the canonical code of a digraph is the MINIMUM code over all vertex
  permutations, and class ids are assigned by first appearance as the
  code space is scanned ascending (0 .. 2^(k(k−1))−1).

``tests/test_motifs_directed.py`` proves the derived tables equal the
reference's igraph_i_isoclass2_3/_4 entry for entry.

Distributed strategy (size 4): connected induced 4-sets of the weak
skeleton are generated once each via their spanning structures —
3-edge paths plus 3-stars, canonicalized to a sorted quad and
`distinct()`-ed — then one join against the directed edge table
collects each quad's induced arcs, a sum of per-arc bit literals
yields the 12-bit code, and a broadcast join against the 4096-row
derived code→class table buckets the counts. Everything is joins and
aggregates; the optional ``keep_prob`` applies a deterministic
per-quad hash coin BEFORE the classification join (unbiased uniform
subgraph sampling — divide by keep_prob to estimate the census),
which is the scale lever when the quad volume explodes.

Size 3 reuses the existing Batagelj–Mrvar triad census
(operators/structure.py) — the 16 Davis–Leinhardt triad types ARE the
16 directed 3-vertex isoclasses — and relabels it to isoclass order.
Like the reference, disconnected classes are NaN.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _idx_layout(k: int) -> list[int]:
    """The reference's arc→bit layout (topology.c:364,igraph_i_isoclass_
    3_idx): bit weight for arc (i,j) doubles scanning the adjacency
    matrix column-major, skipping the diagonal."""
    idx = [0] * (k * k)
    p = 1
    for j in range(k):
        for i in range(k):
            if i != j:
                idx[k * i + j] = p
                p <<= 1
    return idx


@lru_cache(maxsize=None)
def _isoclass_tables(k: int):
    """(code→class list, set of connected class ids, arc bit dict)."""
    idx = _idx_layout(k)
    arcs = [(i, j) for i in range(k) for j in range(k) if i != j]
    bit = {(i, j): idx[k * i + j] for i, j in arcs}
    perms = list(itertools.permutations(range(k)))

    def canon(code: int) -> int:
        present = [(i, j) for (i, j) in arcs if code & bit[(i, j)]]
        best = None
        for p in perms:
            c = 0
            for i, j in present:
                c |= bit[(p[i], p[j])]
            if best is None or c < best:
                best = c
        return best

    classid: dict[int, int] = {}
    table = []
    connected: set[int] = set()
    for code in range(1 << (k * (k - 1))):
        c = canon(code)
        if c not in classid:
            classid[c] = len(classid)
            # weak connectivity of the representative
            present = [(i, j) for (i, j) in arcs if code & bit[(i, j)]]
            nbr = {i: set() for i in range(k)}
            for i, j in present:
                nbr[i].add(j)
                nbr[j].add(i)
            seen = {0}
            stack = [0]
            while stack:
                u = stack.pop()
                for w in nbr[u]:
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            if len(seen) == k:
                connected.add(classid[c])
        table.append(classid[c])
    return table, connected, bit


def _skeleton(graph: LinkGraph) -> DataFrame:
    e = graph.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    return e


def motifs_randesu_3_directed(graph: LinkGraph) -> DataFrame:
    """Directed size-3 motif census → (isoclass, count double), 16 rows
    in igraph isoclass order; disconnected classes NaN
    (igraph_motifs_randesu, size=3, directed)."""
    from xdata_igraph_spark.operators.structure import triad_census

    _table, connected, bit = _isoclass_tables(3)
    # Davis–Leinhardt order (triad_census output) → representative arcs
    reps = {
        "003": [],
        "012": [(0, 1)],
        "102": [(0, 1), (1, 0)],
        "021D": [(1, 0), (1, 2)],
        "021U": [(0, 1), (2, 1)],
        "021C": [(0, 1), (1, 2)],
        "111D": [(0, 1), (1, 0), (2, 0)],
        "111U": [(0, 1), (1, 0), (0, 2)],
        "030T": [(0, 1), (2, 1), (0, 2)],
        "030C": [(1, 0), (2, 1), (0, 2)],
        "201": [(0, 1), (1, 0), (1, 2), (2, 1)],
        "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],
        "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],
        "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],
        "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],
        "300": [(i, j) for i in range(3) for j in range(3) if i != j],
    }
    table = _table

    def cls(arcs):
        code = 0
        for i, j in arcs:
            code |= bit[(i, j)]
        return table[code]

    census = {r["triad"]: int(r["count"]) for r in triad_census(graph).collect()}
    counts: dict[int, float] = {}
    for name, arcs in reps.items():
        counts[cls(arcs)] = float(census[name])
    rows = [
        (c, counts.get(c, 0.0) if c in connected else float("nan"))
        for c in range(16)
    ]
    return graph.spark.createDataFrame(rows, "isoclass int, count double")


def motifs_randesu_4_directed(
    graph: LinkGraph,
    keep_prob: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Directed size-4 motif census → (isoclass, count double), 218
    rows in igraph isoclass order; disconnected classes NaN
    (igraph_motifs_randesu, size=4, directed).

    ``keep_prob < 1``: deterministic per-quad hash-coin subsampling —
    counts are raw sampled counts like the reference's cut_prob mode
    (each connected quad survives with probability exactly keep_prob;
    divide by it for an unbiased full-census estimate)."""
    if not 0.0 < keep_prob <= 1.0:
        raise ValueError("keep_prob must be in (0, 1]")
    spark = graph.spark
    table, connected, bit = _isoclass_tables(4)

    sk = _skeleton(graph)
    sym = sk.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        sk.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )

    # spanning structures: every connected 4-set contains a 3-edge
    # path or a 3-star of its skeleton; sorted-quad + distinct emits
    # each exactly once
    paths = (
        sym.select(F.col("u").alias("x0"), F.col("v").alias("x1"))
        .join(
            sym.select(F.col("u").alias("x1"), F.col("v").alias("x2")), "x1"
        )
        .filter(F.col("x2") != F.col("x0"))
        .join(
            sym.select(F.col("u").alias("x2"), F.col("v").alias("x3")), "x2"
        )
        .filter((F.col("x3") != F.col("x0")) & (F.col("x3") != F.col("x1")))
        .select(F.array_sort(F.array("x0", "x1", "x2", "x3")).alias("q"))
    )
    stars = (
        sym.select(F.col("u").alias("c"), F.col("v").alias("n1"))
        .join(sym.select(F.col("u").alias("c"), F.col("v").alias("n2")), "c")
        .filter(F.col("n2") > F.col("n1"))
        .join(sym.select(F.col("u").alias("c"), F.col("v").alias("n3")), "c")
        .filter(F.col("n3") > F.col("n2"))
        .select(F.array_sort(F.array("c", "n1", "n2", "n3")).alias("q"))
    )
    quads = paths.union(stars).distinct()
    if keep_prob < 1.0:
        res = 1 << 24
        h = F.abs(F.xxhash64(F.lit(seed), F.col("q"))) % res
        quads = quads.filter((h / F.lit(float(res))) < keep_prob)
    quads = quads.select(
        F.col("q")[0].alias("q0"),
        F.col("q")[1].alias("q1"),
        F.col("q")[2].alias("q2"),
        F.col("q")[3].alias("q3"),
    )

    arcs = graph.edges.select("src", "dst").filter("src != dst").distinct()
    # equi-join on the exploded member column (hash-joinable; a raw
    # quad⋈arc theta join would be a cartesian at scale), then keep
    # arcs whose head also lands inside the quad
    qv = quads.select(
        "q0", "q1", "q2", "q3",
        F.explode(F.array("q0", "q1", "q2", "q3")).alias("src"),
    )
    qa = qv.join(arcs, "src").filter(
        (F.col("dst") == F.col("q0")) | (F.col("dst") == F.col("q1"))
        | (F.col("dst") == F.col("q2")) | (F.col("dst") == F.col("q3"))
    )

    def pos(col):
        return (
            F.when(col == F.col("q0"), 0)
            .when(col == F.col("q1"), 1)
            .when(col == F.col("q2"), 2)
            .otherwise(3)
        )

    idx = _idx_layout(4)
    idx_lit = F.array(*[F.lit(int(x)) for x in idx])
    bitcol = F.element_at(idx_lit, pos(F.col("src")) * 4 + pos(F.col("dst")) + 1)
    codes = (
        qa.select("q0", "q1", "q2", "q3", bitcol.alias("bit"))
        .groupBy("q0", "q1", "q2", "q3")
        .agg(F.sum("bit").alias("code"))
    )
    code_class = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(table)], "code long, isoclass int"
    )
    hist = (
        codes.join(F.broadcast(code_class), "code")
        .groupBy("isoclass")
        .agg(F.count("*").cast("double").alias("count"))
    )
    got = {r["isoclass"]: r["count"] for r in hist.collect()}
    rows = [
        (c, got.get(c, 0.0) if c in connected else float("nan"))
        for c in range(218)
    ]
    return spark.createDataFrame(rows, "isoclass int, count double")
