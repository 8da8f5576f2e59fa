"""Graph generators — deterministic constructors and seeded random
"games".

Semantics follow the reference's generator family
(/root/reference/src/structure_generators.c and /root/reference/src/
games.c); construction is Spark-first: every deterministic generator is
``spark.range`` + column arithmetic (no driver-side edge lists), so a
star with 10^9 leaves or a 10^5 x 10^5 lattice plans as a single
narrow pipeline with no shuffle at all.

Random generators use seeded ``xxhash64`` column expressions instead of
the reference's sequential MT19937 stream (/root/reference/src/
random.c:603-624): the exact edge sets differ from igraph's for the
same seed (a sequential RNG stream cannot be reproduced distributed),
but the distribution semantics match and results are bit-reproducible
for a given (seed, n, m) on any cluster size. The reference's own test
strategy for these is invariant-based, not golden-valued (SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph

__all__ = [
    "star",
    "ring",
    "tree",
    "full",
    "full_citation",
    "lattice",
    "de_bruijn",
    "famous",
    "kautz",
    "lcf",
    "gnm",
    "gnp",
    "barabasi",
    "watts_strogatz",
    "degree_sequence_game",
    "grg",
    "k_regular_game",
    "static_power_law",
    "interconnected_islands",
    "from_adjacency",
    "from_weighted_adjacency",
]


def _graph(edges: DataFrame, directed: bool, n: int) -> LinkGraph:
    return LinkGraph(edges.withColumn("weight", F.lit(1.0)), directed=directed, n=n)


# ---------------------------------------------------------------------------
# deterministic generators
# ---------------------------------------------------------------------------


def star(
    spark: SparkSession, n: int, mode: str = "out", center: int = 0
) -> LinkGraph:
    """Star graph (igraph_star,
    /root/reference/src/structure_generators.c:608): modes ``out``
    (center->leaf), ``in`` (leaf->center), ``undirected``, ``mutual``."""
    if mode not in ("out", "in", "undirected", "mutual"):
        raise ValueError(f"bad star mode {mode!r}")
    leaves = spark.range(n).filter(F.col("id") != center)
    c = F.lit(center).cast("long")
    if mode == "in":
        e = leaves.select(F.col("id").alias("src"), c.alias("dst"))
    else:
        e = leaves.select(c.alias("src"), F.col("id").alias("dst"))
    if mode == "mutual":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph(e, directed=mode != "undirected", n=n)


def ring(
    spark: SparkSession,
    n: int,
    directed: bool = False,
    mutual: bool = False,
    circular: bool = True,
) -> LinkGraph:
    """Cycle / path graph (igraph_ring,
    /root/reference/src/structure_generators.c:844)."""
    base = spark.range(n if circular else n - 1)
    e = base.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    if directed and mutual:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph(e, directed=directed, n=n)


def tree(
    spark: SparkSession, n: int, children: int = 2, mode: str = "out"
) -> LinkGraph:
    """Regular rooted tree (igraph_tree,
    /root/reference/src/structure_generators.c:889): vertex i's parent
    is ``(i-1) div children``; modes ``out`` (parent->child), ``in``,
    ``undirected``."""
    if mode not in ("out", "in", "undirected"):
        raise ValueError(f"bad tree mode {mode!r}")
    kids = spark.range(1, n)
    parent = ((F.col("id") - 1) / children).cast("long")
    if mode == "in":
        e = kids.select(F.col("id").alias("src"), parent.alias("dst"))
    else:
        e = kids.select(parent.alias("src"), F.col("id").alias("dst"))
    return _graph(e, directed=mode != "undirected", n=n)


def full(
    spark: SparkSession, n: int, directed: bool = False, loops: bool = False
) -> LinkGraph:
    """Complete graph (igraph_full,
    /root/reference/src/structure_generators.c:967). O(n^2) edges —
    test scale."""
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    e = a.crossJoin(b)
    if not loops:
        e = e.filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.filter(F.col("src") <= F.col("dst") if loops else F.col("src") < F.col("dst"))
    return _graph(e, directed=directed, n=n)


def full_citation(spark: SparkSession, n: int) -> LinkGraph:
    """Each vertex cites every lower id: i->j for i>j
    (igraph_full_citation,
    /root/reference/src/structure_generators.c:1060)."""
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    e = a.crossJoin(b).filter(F.col("src") > F.col("dst"))
    return _graph(e, directed=True, n=n)


def lattice(
    spark: SparkSession,
    dims: Sequence[int],
    circular: bool = False,
    directed: bool = False,
) -> LinkGraph:
    """Regular (hyper)lattice with nei=1 (igraph_lattice,
    /root/reference/src/structure_generators.c:716). Vertex id is the
    row-major index into ``dims``; one edge per dimension step."""
    n = 1
    for d in dims:
        n *= int(d)
    ids = spark.range(n)
    parts: list[DataFrame] = []
    stride = n
    for d in dims:
        stride //= int(d)
        coord = (F.col("id") / stride).cast("long") % d
        if circular and d > 2:
            nxt = F.col("id") - coord * stride + ((coord + 1) % d) * stride
            sel = ids
        else:
            nxt = F.col("id") + stride
            sel = ids.filter(coord < d - 1)
        parts.append(sel.select(F.col("id").alias("src"), nxt.cast("long").alias("dst")))
    e = parts[0]
    for p in parts[1:]:
        e = e.union(p)
    return _graph(e, directed=directed, n=n)


def de_bruijn(spark: SparkSession, m: int, n: int) -> LinkGraph:
    """De Bruijn graph B(m, n) (igraph_de_bruijn,
    /root/reference/src/structure_generators.c:1371): m^n vertices,
    edges v -> (v*m + j) mod m^n for j in 0..m-1."""
    nv = m**n
    verts = spark.range(nv)
    e = verts.select(
        F.col("id").alias("src"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: (F.col("id") * m + j) % nv,
            )
        ).alias("dst"),
    )
    return _graph(e, directed=True, n=nv)


# Famous graphs: vertex/edge data are published datasets (the reference
# embeds the same numbers, /root/reference/src/structure_generators.c:1922).
_FAMOUS: dict[str, tuple[int, bool, list[tuple[int, int]]]] = {
    # W. W. Zachary's karate club, 34 vertices / 78 undirected edges.
    "zachary": (
        34,
        False,
        [
            (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
            (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
            (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
            (1, 21), (1, 30), (2, 3), (2, 7), (2, 27), (2, 28), (2, 32),
            (2, 9), (2, 8), (2, 13), (3, 7), (3, 12), (3, 13), (4, 6),
            (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
            (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
            (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
            (22, 32), (22, 33), (23, 25), (23, 27), (23, 32), (23, 33),
            (23, 29), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
            (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
            (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
        ],
    ),
    # 5-vertex bull graph (triangle with two horns).
    "bull": (5, False, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]),
    # Petersen graph, 10 vertices / 15 edges.
    "petersen": (
        10,
        False,
        [
            (0, 1), (0, 4), (0, 5), (1, 2), (1, 6), (2, 3), (2, 7),
            (3, 4), (3, 8), (4, 9), (5, 7), (5, 8), (6, 8), (6, 9), (7, 9),
        ],
    ),
    # 5-vertex house graph (square + roof).
    "house": (5, False, [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)]),
}


def famous(spark: SparkSession, name: str) -> LinkGraph:
    """Named graph (igraph_famous,
    /root/reference/src/structure_generators.c:1952). LCF-expressible
    entries build through lcf(); explicit edge lists otherwise (catalog
    extension at the bottom of this module)."""
    key = name.lower()
    if key in _FAMOUS_LCF:
        n, shifts, repeats = _FAMOUS_LCF[key]
        return lcf(spark, n, shifts, repeats)
    if key not in _FAMOUS:
        raise ValueError(
            f"unknown famous graph {name!r}; have "
            f"{sorted(set(_FAMOUS) | set(_FAMOUS_LCF))}"
        )
    n, directed, pairs = _FAMOUS[key]
    return LinkGraph.from_pairs(spark, pairs, directed=directed, n=n)


# ---------------------------------------------------------------------------
# seeded random generators ("games")
# ---------------------------------------------------------------------------


def _decode_directed(idx, n):
    """index in [0, n(n-1)) -> loop-free (src, dst)."""
    src = (idx / (n - 1)).cast("long")
    r = idx % (n - 1)
    dst = F.when(r < src, r).otherwise(r + 1).cast("long")
    return src, dst


def _decode_undirected(idx):
    """index in [0, n(n-1)/2) -> (src < dst) pair via triangular-root."""
    # dst = floor((1+sqrt(1+8*idx))/2), src = idx - dst*(dst-1)/2
    dst = F.floor((F.lit(1.0) + F.sqrt(F.lit(1.0) + 8.0 * idx.cast("double"))) / 2.0)
    # guard float rounding at triangle boundaries
    dst = (
        F.when(dst * (dst - 1) / 2 > idx, dst - 1)
        .when((dst + 1) * dst / 2 <= idx, dst + 1)
        .otherwise(dst)
    ).cast("long")
    src = (idx - dst * (dst - 1) / 2).cast("long")
    return src, dst


def _distinct_indices(spark: SparkSession, space: int, m: int, seed: int):
    """Exactly ``m`` distinct values from ``[0, space)`` as a DataFrame
    ``(edge_idx: long)`` — deterministic for (space, m, seed).

    Dense requests (m > space/2) sample the COMPLEMENT instead: the
    expected distinct count of k uniform draws is space·(1-e^(-k/space)),
    which can never reach m ≳ 0.58·space by oversampling alone (ADVICE
    r1). Sparse requests keep drawing fresh seeded-hash rounds until
    ≥ m distinct indices have accumulated (coupon-collector: a couple of
    rounds in practice), keeping the first m in draw order.
    """
    if m <= 0:
        return spark.range(0).select(F.col("id").alias("edge_idx"))
    if m >= space:
        return spark.range(space).select(F.col("id").alias("edge_idx"))
    if m > space // 2:
        excl = _distinct_indices(spark, space, space - m, seed + 1_000_003)
        return (
            spark.range(space)
            .select(F.col("id").alias("edge_idx"))
            .join(excl, "edge_idx", "left_anti")
        )
    acc = None
    for rnd in range(64):
        k = min(space, int(m * 1.5) + 64)
        draws = spark.range(k).select(
            (F.lit(rnd) * F.lit(1 << 40) + F.col("id")).alias("ord"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(rnd)), F.lit(space)).alias(
                "edge_idx"
            ),
        )
        acc = draws if acc is None else acc.unionByName(draws)
        dedup = acc.groupBy("edge_idx").agg(F.min("ord").alias("ord"))
        dedup = dedup.localCheckpointFlat(eager=True)
        if dedup.count() >= m:
            return dedup.orderBy("ord").limit(m).select("edge_idx")
        acc = dedup
    raise RuntimeError(  # pragma: no cover — 64 rounds cannot all fall short
        f"gnm sampling failed to reach {m} distinct of {space}"
    )


def gnm(
    spark: SparkSession,
    n: int,
    m: int,
    directed: bool = False,
    seed: int = 42,
) -> LinkGraph:
    """Erdos-Renyi G(n, m) (igraph_erdos_renyi_game GNM,
    /root/reference/src/games.c:744-800): m distinct loop-free edges
    sampled uniformly. Sampling = seeded hashes over a dense index
    range, topped up round-by-round until m distinct indices exist
    (dense m samples the complement) — fully parallel and deterministic
    for a (seed, n, m); any m ≤ space is supported like the
    reference."""
    space = n * (n - 1) if directed else n * (n - 1) // 2
    if m > space:
        raise ValueError(f"m={m} exceeds possible {space} edges")
    cand = _distinct_indices(spark, space, m, seed)
    e_idx = F.col("edge_idx")
    if directed:
        src, dst = _decode_directed(e_idx, n)
    else:
        src, dst = _decode_undirected(e_idx)
    e = cand.select(src.alias("src"), dst.alias("dst"))
    return _graph(e, directed=directed, n=n)


def gnp(
    spark: SparkSession,
    n: int,
    p: float,
    directed: bool = False,
    seed: int = 42,
) -> LinkGraph:
    """Erdos-Renyi G(n, p) (igraph_erdos_renyi_game GNP): each
    loop-free pair kept independently with probability p via a seeded
    hash coin. O(n^2) scan — test scale only (the reference's GNP is
    equally quadratic in expectation for dense p)."""
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    pairs = a.crossJoin(b).filter(F.col("src") != F.col("dst"))
    if not directed:
        pairs = pairs.filter(F.col("src") < F.col("dst"))
    # uniform in [0,1): pmod(hash, 2^31) / 2^31
    coin = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1 << 31)) / float(1 << 31)
    e = pairs.filter(coin < p)
    return _graph(e, directed=directed, n=n)


def barabasi(
    spark: SparkSession, n: int, m: int = 1, seed: int = 42
) -> LinkGraph:
    """Barabasi-Albert preferential attachment (igraph_barabasi_game,
    /root/reference/src/games.c:407). Preferential attachment is an
    inherently sequential process (each step's distribution depends on
    all prior steps), so edge construction runs driver-side in numpy at
    test/benchmark scale — the reference's own use of it is exactly
    that (perf fixtures, /root/reference/examples/benchmarks/
    igraph_transitivity.c:34-48). The result is loaded into a
    distributed edge table."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # repeated-nodes list trick: sampling uniformly from the endpoint
    # multiset = degree-proportional sampling
    targets = np.zeros(2 * n * m, dtype=np.int64)
    size = 0
    edges: list[tuple[int, int]] = []
    for v in range(1, n):
        picks: set[int] = set()
        want = min(m, v)
        while len(picks) < want:
            if size == 0:
                picks.add(0)
            else:
                t = int(targets[rng.integers(size)])
                picks.add(t)
        for t in picks:
            edges.append((v, t))
            targets[size] = v
            targets[size + 1] = t
            size += 2
    return LinkGraph.from_pairs(spark, edges, directed=False, n=n)


def watts_strogatz(
    spark: SparkSession,
    size: int,
    nei: int = 1,
    p: float = 0.0,
    seed: int = 42,
) -> LinkGraph:
    """Watts-Strogatz small world (igraph_watts_strogatz_game,
    /root/reference/src/games.c:2895), dim=1: circular lattice where
    each vertex links its ``nei`` clockwise neighbors, then each edge's
    far endpoint is rewired to a uniform vertex with probability p
    (seeded hash coin + hash target; distribution-faithful, see module
    docstring on RNG)."""
    base = spark.range(size).select(F.col("id").alias("src"))
    e = base.select(
        "src",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(nei)),
                lambda j: (F.col("src") + j) % size,
            )
        ).alias("dst"),
    )
    if p > 0:
        coin = (
            F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1 << 31))
            / float(1 << 31)
        )
        rnd = F.pmod(F.xxhash64("dst", "src", F.lit(seed + 1)), F.lit(size))
        e = e.select(
            "src",
            F.when((coin < p) & (rnd != F.col("src")), rnd)
            .otherwise(F.col("dst"))
            .cast("long")
            .alias("dst"),
        )
    return _graph(e, directed=False, n=size)


def kautz(spark: SparkSession, m: int, n: int) -> LinkGraph:
    """Kautz graph (igraph_kautz, /root/reference/src/
    structure_generators.c:1446-1590): vertices are length-(n+1)
    strings over an (m+1)-letter alphabet with no two equal consecutive
    letters; v → w iff dropping v's first letter and appending one
    letter yields w. Vertex ids = rank of the string's base-(m+1)
    value among valid strings — the reference's enumeration order.

    Fully relational: enumerate all (m+1)^(n+1) strings with
    spark.range, keep the valid ones, mint ranked ids (plans/ids.py),
    build edges by value arithmetic + dictionary join.
    """
    if m < 0 or n < 0:
        raise ValueError("`m' and `n' should be non-negative in a Kautz graph")
    if n == 0:
        return full(spark, m + 1, directed=True, loops=False)
    if m == 0:
        return LinkGraph.empty(spark, 0, directed=True)
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    base = m + 1
    allstrings = base ** (n + 1)
    if allstrings > 2**62:
        raise ValueError("kautz string space exceeds 63-bit ids")
    digit = [
        # integer `div` keeps digit extraction exact for any base —
        # float division would round once base**(n+1) nears 2^53
        F.expr(f"value div {base ** (n - i)}") % base
        for i in range(n + 1)
    ]  # digit[0] = most significant
    valid = None
    for i in range(n):
        c = digit[i] != digit[i + 1]
        valid = c if valid is None else (valid & c)
    strings = (
        spark.range(allstrings)
        .select(F.col("id").alias("value"))
        .filter(valid)
    )
    ids = zip_dense_ids(strings, ["value"], out_col="vid").localCheckpointFlat(True)
    # w value = (v value without leading digit) * base + c, c != v's last digit
    tail = F.col("value") % F.lit(base ** n)
    cand = ids.select(
        F.col("vid").alias("src"),
        F.explode(
            F.filter(
                F.transform(F.sequence(F.lit(0), F.lit(m)), lambda c: c.cast("long")),
                lambda c: c != digit[n],
            )
        ).alias("c"),
        tail.alias("tail"),
    ).select("src", (F.col("tail") * base + F.col("c")).alias("value"))
    edges = cand.join(ids.select("value", F.col("vid").alias("dst")), "value").select(
        "src", "dst"
    )
    nv = base * (m ** n)
    return _graph(edges, directed=True, n=nv)


def lcf(spark: SparkSession, n: int, shifts: list[int], repeats: int) -> LinkGraph:
    """LCF-notation graph (igraph_lcf_vector, /root/reference/src/
    structure_generators.c:1596-1655): a ring 0..n-1 plus chords —
    chord j connects (j mod n) to (j + shifts[j mod |shifts|]) mod n,
    kept when from < to; |shifts|·repeats/2 chords total."""
    if repeats < 0:
        raise ValueError("number of repeats must be positive")
    pairs = [(i, (i + 1) % n) for i in range(n)]
    want = n + len(shifts) * repeats // 2
    sptr = 0
    while len(pairs) < want:
        sh = shifts[sptr % len(shifts)]
        frm = sptr % n
        to = (n + sptr + sh) % n
        if frm < to:
            pairs.append((frm, to))
        sptr += 1
    return LinkGraph.from_pairs(spark, pairs, directed=False, n=n)


def degree_sequence_game(
    spark: SparkSession, degrees: list[int] | DataFrame, seed: int = 42
) -> LinkGraph:
    """Configuration-model random graph with the given degree sequence
    (igraph_degree_sequence_game, IGRAPH_DEGSEQ_SIMPLE,
    /root/reference/src/games.c:1189: uniform random stub pairing; may
    contain loops/multi-edges exactly like the reference's SIMPLE
    method).

    Distributed + deterministic: every stub gets a seeded-hash rank
    (plans/ids.py — no global window), consecutive ranks pair up.
    """
    if isinstance(degrees, DataFrame):
        deg = degrees.select(
            F.col(degrees.columns[0]).cast("long").alias("id"),
            F.col(degrees.columns[1]).cast("int").alias("deg"),
        )
    else:
        deg = spark.createDataFrame(
            [(i, int(d)) for i, d in enumerate(degrees)], "id long, deg int"
        )
    total = deg.agg(F.sum("deg")).first()[0] or 0
    if total % 2 != 0:
        raise ValueError("degree sequence sum must be even (igraph errors too)")
    n = deg.count()
    stubs = deg.filter(F.col("deg") > 0).select(
        "id", F.explode(F.sequence(F.lit(1), F.col("deg"))).alias("k")
    )
    hashed = stubs.select(
        "id", F.xxhash64("id", "k", F.lit(seed)).alias("h"), "k"
    )
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    ranked = zip_dense_ids(hashed, ["h", "id", "k"], out_col="r")
    pairs = (
        ranked.select((F.col("r") / 2).cast("long").alias("pair"),
                      (F.col("r") % 2).alias("side"), "id")
        .groupBy("pair")
        .agg(
            F.min(F.when(F.col("side") == 0, F.col("id"))).alias("src"),
            F.min(F.when(F.col("side") == 1, F.col("id"))).alias("dst"),
        )
        .select("src", "dst")
    )
    return _graph(pairs, directed=False, n=n)


# extended famous() catalog — standard published constructions; vertex
# numbering follows the classical construction (LCF ring order,
# hypercube bit order, ...), isomorphic to igraph_famous's embedded
# arrays (/root/reference/src/structure_generators.c:1760-1950), whose
# ad-hoc labeling is presentation, not structure.
_FAMOUS_LCF = {
    "heawood": (14, [5, -5], 7),
    "mcgee": (24, [12, 7, -7], 8),
    "pappus": (18, [5, 7, -7, 7, -7, 5], 3),
    "desargues": (20, [5, -5, 9, -9], 5),
    "mobius_kantor": (16, [5, -5], 8),
    "dodecahedral": (20, [10, 7, 4, -4, -7, 10, -4, 7, -7, 4], 2),
    "frucht": (12, [-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2], 1),
    "levi": (30, [-13, -9, 7, -7, 9, 13], 5),
    "tutte_coxeter": (30, [-13, -9, 7, -7, 9, 13], 5),
}

_FAMOUS.update(
    {
        "diamond": (4, False, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]),
        "tetrahedral": (4, False, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]),
        "cubical": (
            8,
            False,
            # Q3: i ~ i^1, i^2, i^4
            sorted({(min(i, i ^ b), max(i, i ^ b)) for i in range(8) for b in (1, 2, 4)}),
        ),
        "octahedral": (
            6,
            False,
            # K_{2,2,2}: complement of the perfect matching (0,3)(1,4)(2,5)
            [
                (a, b)
                for a in range(6)
                for b in range(a + 1, 6)
                if b - a != 3
            ],
        ),
        "krackhardt_kite": (
            10,
            False,
            [
                (0, 1), (0, 2), (0, 3), (0, 5), (1, 3), (1, 4), (1, 6),
                (2, 3), (2, 5), (3, 4), (3, 5), (3, 6), (4, 6), (5, 6),
                (5, 7), (6, 7), (7, 8), (8, 9),
            ],
        ),
        "chvatal": (
            12,
            False,
            [
                (0, 1), (0, 4), (0, 6), (0, 9), (1, 2), (1, 5), (1, 7),
                (2, 3), (2, 6), (2, 8), (3, 4), (3, 7), (3, 9), (4, 5),
                (4, 8), (5, 10), (5, 11), (6, 10), (6, 11), (7, 8),
                (7, 11), (8, 10), (9, 10), (9, 11),
            ],
        ),
        "grotzsch": (
            11,
            False,
            # Mycielskian of C5: outer cycle 0-4, mirrors 5-9, hub 10
            [(i, (i + 1) % 5) for i in range(5)]
            + [(5 + i, (i + 1) % 5) for i in range(5)]
            + [(5 + i, (i - 1) % 5) for i in range(5)]
            + [(5 + i, 10) for i in range(5)],
        ),
        "icosahedral": (
            12,
            False,
            [
                (0, 1), (0, 2), (0, 3), (0, 4), (0, 8), (1, 2), (1, 6),
                (1, 7), (1, 8), (2, 4), (2, 5), (2, 6), (3, 4), (3, 8),
                (3, 9), (3, 11), (4, 5), (4, 11), (5, 6), (5, 10),
                (5, 11), (6, 7), (6, 10), (7, 8), (7, 9), (7, 10),
                (8, 9), (9, 10), (9, 11), (10, 11),
            ],
        ),
    }
)


def from_adjacency(
    spark: SparkSession,
    matrix: list[list[int]],
    mode: str = "directed",
) -> LinkGraph:
    """Graph from a dense adjacency matrix (igraph_adjacency,
    /root/reference/src/structure_generators.c:206-430): entry (i, j)
    = number of i→j edges. Modes: ``directed``, ``max``/``undirected``
    (max of the two triangles), ``min``, ``plus``, ``upper``,
    ``lower``. Multiplicities are preserved (value c mints c parallel
    edges, like the reference).

    The matrix arrives as a driver literal (the reference takes an
    in-memory igraph_matrix_t the same way) and is melted relationally
    via posexplode — at scale an adjacency should arrive as an edge
    table instead (this constructor is the small-matrix on-ramp).
    """
    n = len(matrix)
    for row in matrix:
        if len(row) != n:
            raise ValueError("non-square matrix in from_adjacency")
    mdf = spark.createDataFrame(
        [(i, [int(x) for x in row]) for i, row in enumerate(matrix)],
        "i long, row array<int>",
    )
    cells = mdf.select(
        "i", F.posexplode("row").alias("j", "c")
    ).filter(F.col("c") != 0)
    if mode == "directed":
        pairs = cells.select("i", "j", "c")
        directed = True
    elif mode in ("max", "undirected", "min", "plus"):
        directed = False
        a = cells.select(
            F.least("i", "j").alias("i"), F.greatest("i", "j").alias("j"),
            F.when(F.col("i") <= F.col("j"), F.col("c")).otherwise(F.lit(0)).alias("up"),
            F.when(F.col("i") > F.col("j"), F.col("c")).otherwise(F.lit(0)).alias("lo"),
            (F.col("i") == F.col("j")).alias("diag"),
        )
        comb = a.groupBy("i", "j").agg(
            F.sum("up").alias("up"), F.sum("lo").alias("lo"), F.max("diag").alias("diag")
        )
        expr = {
            "max": F.greatest("up", "lo"),
            "undirected": F.greatest("up", "lo"),
            "min": F.least("up", "lo"),
            "plus": F.col("up") + F.col("lo"),
        }[mode]
        # diagonal entries live in one triangle only: use their raw value
        pairs = comb.select(
            "i", "j", F.when(F.col("diag"), F.col("up") + F.col("lo")).otherwise(expr).alias("c")
        ).filter(F.col("c") != 0)
    elif mode in ("upper", "lower"):
        directed = False
        keep = (F.col("i") <= F.col("j")) if mode == "upper" else (F.col("i") >= F.col("j"))
        pairs = cells.filter(keep).select(
            F.least("i", "j").alias("i"), F.greatest("i", "j").alias("j"), "c"
        )
    else:
        raise ValueError(f"bad adjacency mode {mode!r}")
    edges = pairs.select(
        F.col("i").alias("src"),
        F.col("j").alias("dst"),
        F.explode(F.sequence(F.lit(1), F.col("c"))).alias("_k"),
    ).select("src", "dst")
    return _graph(edges, directed=directed, n=n)


def from_weighted_adjacency(
    spark: SparkSession,
    matrix: list[list[float]],
    mode: str = "directed",
) -> LinkGraph:
    """Weighted graph from a dense matrix (igraph_weighted_adjacency,
    /root/reference/src/structure_generators.c:431-600): entry (i, j)
    becomes ONE edge of weight A[i,j] (zero = absent). Same modes as
    :func:`from_adjacency`."""
    n = len(matrix)
    for row in matrix:
        if len(row) != n:
            raise ValueError("non-square matrix in from_weighted_adjacency")
    mdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(matrix)],
        "i long, row array<double>",
    )
    cells = mdf.select(
        "i", F.posexplode("row").alias("j", "w")
    ).filter(F.col("w") != 0)
    if mode == "directed":
        pairs = cells.select("i", "j", "w")
        directed = True
    elif mode in ("max", "undirected", "min", "plus"):
        directed = False
        a = cells.select(
            F.least("i", "j").alias("i"), F.greatest("i", "j").alias("j"),
            F.when(F.col("i") <= F.col("j"), F.col("w")).otherwise(F.lit(0.0)).alias("up"),
            F.when(F.col("i") > F.col("j"), F.col("w")).otherwise(F.lit(0.0)).alias("lo"),
            (F.col("i") == F.col("j")).alias("diag"),
        )
        comb = a.groupBy("i", "j").agg(
            F.sum("up").alias("up"), F.sum("lo").alias("lo"), F.max("diag").alias("diag")
        )
        expr = {
            "max": F.greatest("up", "lo"),
            "undirected": F.greatest("up", "lo"),
            "min": F.least("up", "lo"),
            "plus": F.col("up") + F.col("lo"),
        }[mode]
        pairs = comb.select(
            "i", "j", F.when(F.col("diag"), F.col("up") + F.col("lo")).otherwise(expr).alias("w")
        ).filter(F.col("w") != 0)
    elif mode in ("upper", "lower"):
        directed = False
        keep = (F.col("i") <= F.col("j")) if mode == "upper" else (F.col("i") >= F.col("j"))
        pairs = cells.filter(keep).select(
            F.least("i", "j").alias("i"), F.greatest("i", "j").alias("j"), "w"
        )
    else:
        raise ValueError(f"bad adjacency mode {mode!r}")
    edges = pairs.select(
        F.col("i").alias("src"), F.col("j").alias("dst"), F.col("w").alias("weight")
    )
    return LinkGraph(edges, directed=directed, n=n)


def grg(
    spark: SparkSession,
    n: int,
    radius: float,
    torus: bool = False,
    seed: int = 42,
) -> tuple[LinkGraph, DataFrame]:
    """Geometric random graph (igraph_grg_game,
    /root/reference/src/games.c:1971): n points uniform in the unit
    square, undirected edge wherever squared distance < radius²
    (strict, like the reference); ``torus`` wraps both axes.

    Returns (graph, points (id, x, y)) — the reference optionally
    returns the coordinates too.

    Scale plan: grid-bucketed spatial join. Cell width ≥ radius, each
    point probes its 3×3 cell neighborhood, so candidate pairs ∝
    points-per-cell² summed over cells — never n². Coordinates are
    md5-derived uniforms (portable: DuckDB computes identical values,
    making the generator oracle-checkable end-to-end).
    """
    if not 0 < radius:
        raise ValueError("radius must be positive")
    ncells = max(1, int(math.floor(1.0 / radius)))
    cw = 1.0 / ncells

    def unif(tag: str):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{tag}|{seed}|"), F.col("id"))), 1, 8),
                16,
                10,
            ).cast("long")
            / float(1 << 32)
        )

    pts = spark.range(n).select(
        "id", unif("x").alias("x"), unif("y").alias("y")
    ).localCheckpointFlat(eager=True)
    cell = lambda c: F.floor(c / cw).cast("int")
    base = pts.select(
        F.col("id").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"),
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    if torus:
        probe_cells = F.array(
            *[
                F.struct(
                    F.pmod(cell(F.col("x")) + dx, F.lit(ncells)).alias("cx"),
                    F.pmod(cell(F.col("y")) + dy, F.lit(ncells)).alias("cy"),
                )
                for dx, dy in offs
            ]
        )
    else:
        probe_cells = F.array(
            *[
                F.struct(
                    (cell(F.col("x")) + dx).alias("cx"),
                    (cell(F.col("y")) + dy).alias("cy"),
                )
                for dx, dy in offs
            ]
        )
    probes = pts.select(
        F.col("id").alias("a"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.explode(F.array_distinct(probe_cells)).alias("c"),
    ).select("a", "ax", "ay", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    cand = probes.join(base, ["cx", "cy"]).filter(F.col("a") < F.col("b"))
    if torus:
        dx0 = F.abs(F.col("ax") - F.col("bx"))
        dy0 = F.abs(F.col("ay") - F.col("by"))
        dx = F.when(dx0 > 0.5, 1.0 - dx0).otherwise(dx0)
        dy = F.when(dy0 > 0.5, 1.0 - dy0).otherwise(dy0)
    else:
        dx = F.col("ax") - F.col("bx")
        dy = F.col("ay") - F.col("by")
    e = cand.filter(dx * dx + dy * dy < F.lit(radius * radius)).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return _graph(e, directed=False, n=n), pts


def k_regular_game(
    spark: SparkSession,
    n: int,
    k: int,
    multiple: bool = False,
    seed: int = 42,
    max_attempts: int = 50,
) -> LinkGraph:
    """Random k-regular graph (igraph_k_regular_game,
    /root/reference/src/games.c:3800): degree_sequence_game with an
    all-k sequence. ``multiple=True`` = the reference's SIMPLE method
    (one stub pairing, loops/multi-edges possible); ``multiple=False``
    = SIMPLE_NO_MULTIPLE (resample until simple — each attempt redraws
    the whole pairing with a derived seed)."""
    if n < 0 or k < 0:
        raise ValueError("n and k must be non-negative")
    if (n * k) % 2 != 0:
        raise ValueError("n*k must be even for a k-regular graph")
    degs = [k] * n
    g = degree_sequence_game(spark, degs, seed=seed)
    if multiple:
        return g
    for attempt in range(max_attempts):
        if g.is_simple():
            return g
        g = degree_sequence_game(spark, degs, seed=seed + 7919 * (attempt + 1))
    raise RuntimeError(
        f"no simple {k}-regular pairing found in {max_attempts} attempts "
        "(dense k relative to n; raise max_attempts)"
    )


def static_power_law(
    spark: SparkSession,
    n: int,
    m: int,
    exponent_out: float,
    exponent_in: float = -1.0,
    loops: bool = False,
    multiple: bool = False,
    finite_size_correction: bool = False,
    seed: int = 42,
) -> LinkGraph:
    """Static power-law fitness game (igraph_static_power_law_game,
    /root/reference/src/games.c:3656): fitness of vertex i is
    (n-i+corr)^(−1/(γ−1)); m edges sampled with endpoint probability ∝
    fitness (igraph_static_fitness_game, games.c:3470). exponent_in <
    0 → undirected, else directed with separately-exponented (and
    shuffled, like the reference) in-fitness.

    Weighted sampling is inherently a sequential-CDF draw; like
    ``barabasi`` (the documented precedent) the draw runs driver-side
    in numpy at fixture scale — the reference's own uses are test and
    benchmark fixtures. The result loads into a distributed edge
    table."""
    import numpy as np

    if exponent_out < 2:
        raise ValueError("out-degree exponent must be >= 2")
    if 0 <= exponent_in < 2:
        raise ValueError("in-degree exponent must be >= 2 (negative = undirected)")
    directed = exponent_in >= 0

    def fitness(expo: float) -> "np.ndarray":
        alpha = -1.0 / (expo - 1) if math.isfinite(expo) else 0.0
        j0 = float(n)
        if finite_size_correction and alpha < -0.5:
            j0 += n ** (1 + 0.5 / alpha) * (10 * math.sqrt(2) * (1 + alpha)) ** (
                -1.0 / alpha
            ) - 1
        j0 = max(j0, float(n))
        return np.power(j0 - np.arange(n), alpha)

    rng = np.random.default_rng(seed)
    w_out = fitness(exponent_out)
    p_out = w_out / w_out.sum()
    if directed:
        w_in = fitness(exponent_in)
        rng.shuffle(w_in)  # decorrelate in/out, as the reference does
        p_in = w_in / w_in.sum()
    seen: set[tuple[int, int]] = set()
    edges: list[tuple[int, int]] = []
    guard = 0
    while len(edges) < m:
        guard += 1
        if guard > 100 * m + 1000:
            raise RuntimeError("edge sampling rejection loop stalled")
        a = int(rng.choice(n, p=p_out))
        b = int(rng.choice(n, p=p_in if directed else p_out))
        if not loops and a == b:
            continue
        key = (a, b) if directed else (min(a, b), max(a, b))
        if not multiple and key in seen:
            continue
        seen.add(key)
        edges.append(key)
    return LinkGraph.from_pairs(spark, edges, directed=directed, n=n)


def interconnected_islands(
    spark: SparkSession,
    islands_n: int,
    islands_size: int,
    islands_pin: float,
    n_inter: int,
    seed: int = 42,
) -> LinkGraph:
    """Interconnected islands (igraph_simple_interconnected_islands_game,
    /root/reference/src/games.c:3308): islands_n islands of
    islands_size vertices; within an island each pair is an edge with
    probability islands_pin; every ORDERED pair of islands gets
    n_inter random inter-island edges (the reference draws endpoints
    uniformly, so coincidental duplicates collapse — it builds a
    simple graph; same here via distinct).

    Fully distributed: intra edges are a hash coin over within-island
    pairs (quadratic only in islands_size, like the reference's
    geometric skip sampling); inter edges are seeded-hash endpoint
    draws per (island-pair, j) row."""
    if islands_n < 0 or islands_size < 0:
        raise ValueError("invalid island count/size")
    if not 0 <= islands_pin <= 1:
        raise ValueError("invalid intra-island probability")
    if n_inter < 0 or n_inter > islands_size:
        raise ValueError("invalid number of inter-island links")
    n = islands_n * islands_size
    # intra: all within-island pairs, hash coin
    v = spark.range(n).select(
        F.col("id").alias("src"), (F.col("id") / islands_size).cast("long").alias("isl")
    )
    u = spark.range(n).select(
        F.col("id").alias("dst"), (F.col("id") / islands_size).cast("long").alias("isl")
    )
    pairs = v.join(u, "isl").filter(F.col("src") < F.col("dst"))
    coin = (
        F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1 << 31)) / float(1 << 31)
    )
    intra = pairs.filter(coin < islands_pin).select("src", "dst")
    # inter: n_inter seeded draws for each unordered island pair
    ia = spark.range(islands_n).select(F.col("id").alias("i1"))
    ib = spark.range(islands_n).select(F.col("id").alias("i2"))
    ipairs = ia.crossJoin(ib).filter(F.col("i1") < F.col("i2"))
    draws = ipairs.select(
        "i1", "i2", F.explode(F.sequence(F.lit(1), F.lit(n_inter))).alias("j")
    )
    pick = lambda tag, isl: (
        isl * islands_size
        + F.pmod(F.xxhash64("i1", "i2", "j", F.lit(f"{tag}{seed}")), F.lit(islands_size))
    )
    inter = draws.select(
        pick("s", F.col("i1")).alias("src"), pick("d", F.col("i2")).alias("dst")
    )
    e = intra.unionByName(inter).distinct()
    return _graph(e, directed=False, n=n)


def rewire_edges(
    graph: LinkGraph, prob: float, loops: bool = False, seed: int = 42
) -> LinkGraph:
    """Rewire each edge endpoint to a uniform random vertex with
    probability ``prob`` (igraph_rewire_edges,
    /root/reference/src/games.c:2800, the multiple-allowed branch —
    the no-multiple variant (:2645) is an inherently sequential
    stub-list walk; simplify() afterwards collapses duplicates when
    that is the intent).

    Endpoints are decided sequentially like the C (first the tail,
    then the head against the possibly-new tail), with seeded
    xxhash64 coins/targets keyed by the dense edge id. With
    ``loops=False`` targets are drawn from the n−1 non-loop vertices
    (the C redraws; same uniform law without the rejection loop).

    Vertex ids need NOT be dense 0..n−1: the draw is made in a dense
    index space and mapped back through the vertex table (two
    broadcast-able joins); with the implicit dense-id contract
    (explicit n) the map is the identity but the plan is kept uniform.
    The output keeps the input's vertex universe."""
    if not 0.0 <= prob <= 1.0:
        raise ValueError("prob must be in [0, 1]")
    n = graph.vcount()
    if n < 2 or prob == 0.0:
        return graph
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    vix = zip_dense_ids(graph.vertices(), ["id"], out_col="_ix")
    e = (
        graph.edge_ids()
        .join(vix.select(F.col("id").alias("src"), F.col("_ix").alias("_sx")), "src")
        .join(vix.select(F.col("id").alias("dst"), F.col("_ix").alias("_dx")), "dst")
    )

    def coin(tag: str):
        return (
            F.pmod(F.xxhash64("eid", F.lit(seed), F.lit(tag)), F.lit(1 << 31))
            / float(1 << 31)
        ) < prob

    def target(tag: str, avoid):
        if loops:
            return F.pmod(F.xxhash64("eid", F.lit(seed), F.lit(tag + "t")), F.lit(n))
        raw = F.pmod(F.xxhash64("eid", F.lit(seed), F.lit(tag + "t")), F.lit(n - 1))
        return F.when(raw >= avoid, raw + 1).otherwise(raw)

    e = e.withColumn(
        "_nsx",
        F.when(coin("a"), target("a", F.col("_dx"))).otherwise(F.col("_sx")).cast("long"),
    )
    e = e.withColumn(
        "_ndx",
        F.when(coin("b"), target("b", F.col("_nsx"))).otherwise(F.col("_dx")).cast("long"),
    )
    out = (
        e.join(vix.select(F.col("_ix").alias("_nsx"), F.col("id").alias("_ns")), "_nsx")
        .join(vix.select(F.col("_ix").alias("_ndx"), F.col("id").alias("_nd")), "_ndx")
        .select(F.col("_ns").alias("src"), F.col("_nd").alias("dst"), "weight")
    )
    # rewiring never changes the vertex universe; for implicit
    # (endpoint-derived) graphs pin it explicitly, since an endpoint
    # that loses all edges must stay a (now isolated) vertex
    verts = graph._vertices
    if verts is None and graph._n is None:
        verts = graph.vertices()
    return LinkGraph(out, directed=graph.directed, n=graph._n, vertices=verts)


def rewire(
    graph: LinkGraph, n_trials: int, mode: str = "simple", seed: int = 42
) -> LinkGraph:
    """Degree-preserving rewiring by double-edge swaps (igraph_rewire,
    /root/reference/src/structural_properties.c:1544): repeatedly pick
    two edges (a,b), (c,d) and replace them with (a,d), (c,b) when the
    swap creates no loop and no multiple edge ("simple" mode; mode
    "loops" permits loops like IGRAPH_REWIRING_SIMPLE_LOOPS). Every
    vertex keeps its exact in-/out-/total degree.

    The reference draws trials one at a time; here each superstep
    proposes ~|E|/2 swaps at once — edges are hash-paired inside
    random buckets, and a pair commits only if both replacement edges
    (i) are loop-free (simple mode), (ii) do not already exist in the
    graph, and (iii) collide with no other edge proposed this round
    (two global anti-join/count checks). Batched Metropolis-style
    proposal rounds share the sequential walk's stationary law; the
    number of rounds is ceil(n_trials / (|E|/2)).
    """
    if mode not in ("simple", "loops"):
        raise ValueError(f"mode must be 'simple' or 'loops' (got {mode!r})")
    if n_trials < 0:
        raise ValueError("n_trials must be >= 0")
    m = graph.ecount()
    if m < 2 or n_trials == 0:
        return graph
    if graph.vcount() < 4 and mode == "simple":
        raise ValueError(
            "graph unsuitable for rewiring (the reference requires >= 4 "
            "vertices for IGRAPH_REWIRING_SIMPLE)"
        )
    per_round = max(1, m // 2)
    rounds = -(-int(n_trials) // per_round)
    # pin the input rows once: each round's job reads `edges` through
    # several branches (pairing window, existence anti-join, revert
    # paths) — a live upstream plan re-evaluated per branch must not be
    # able to disagree with itself (the superstep-loop discipline of
    # plans/checkpointing.py)
    edges = graph.edges.select("src", "dst", "weight").localCheckpointFlat(
        eager=True
    )

    def canon(s, d):
        if graph.directed:
            return F.struct(s.alias("s"), d.alias("d"))
        return F.struct(F.least(s, d).alias("s"), F.greatest(s, d).alias("d"))

    for r in range(rounds):
        key = F.xxhash64("src", "dst", F.lit(seed), F.lit(r))
        tagged = edges.withColumn("_b", F.pmod(key, F.lit(m))).withColumn("_k", key)
        from pyspark.sql import Window

        w = Window.partitionBy("_b").orderBy("_k", "src", "dst")
        ranked = tagged.withColumn("_rn", F.row_number().over(w))
        first = ranked.filter(F.col("_rn") == 1).select(
            "_b",
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.col("weight").alias("w1"),
        )
        second = ranked.filter(F.col("_rn") == 2).select(
            "_b",
            F.col("src").alias("c"),
            F.col("dst").alias("d"),
            F.col("weight").alias("w2"),
        )
        rest = ranked.filter(F.col("_rn") > 2).select("src", "dst", "weight")
        both = first.join(second, "_b", "left")
        # a bucket that drew a single edge proposes nothing this round
        singles = both.filter(F.col("c").isNull()).select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w1").alias("weight")
        )
        rest = rest.unionByName(singles)
        pairs = both.filter(F.col("c").isNotNull())
        ok = F.lit(True)
        if mode == "simple":
            ok = (F.col("a") != F.col("d")) & (F.col("c") != F.col("b"))
        # proposing (a,d) and (c,b); identity swaps are harmless but
        # wasteful — drop them from the proposal set
        ok = ok & ~((F.col("a") == F.col("c")) & (F.col("b") == F.col("d")))
        prop = pairs.filter(ok)
        keep_pairs = pairs.filter(~ok)
        new1 = prop.select("_b", F.col("a").alias("src"), F.col("d").alias("dst"), F.col("w1").alias("weight"))
        new2 = prop.select("_b", F.col("c").alias("src"), F.col("b").alias("dst"), F.col("w2").alias("weight"))
        cand = new1.unionByName(new2)
        # (ii) replacement must not already exist anywhere in the graph
        exists = (
            cand.select("_b", canon(F.col("src"), F.col("dst")).alias("_e"))
            .join(
                edges.select(canon(F.col("src"), F.col("dst")).alias("_e")).distinct(),
                "_e",
                "left_semi",
            )
            .select("_b")
            .distinct()
        )
        # (iii) nor collide with another proposal from this round
        dup = (
            cand.select("_b", canon(F.col("src"), F.col("dst")).alias("_e"))
            .groupBy("_e")
            .agg(F.count("*").alias("_c"), F.collect_set("_b").alias("_bs"))
            .filter(F.col("_c") > 1)
            .select(F.explode("_bs").alias("_b"))
            .distinct()
        )
        bad = exists.unionByName(dup).distinct()
        applied = cand.join(bad, "_b", "left_anti").select("src", "dst", "weight")
        reverted = (
            prop.join(bad, "_b", "left_semi")
            .select(
                F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w1").alias("weight")
            )
            .unionByName(
                prop.join(bad, "_b", "left_semi").select(
                    F.col("c").alias("src"), F.col("d").alias("dst"), F.col("w2").alias("weight")
                )
            )
        )
        kept = keep_pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w1").alias("weight")
        ).unionByName(
            keep_pairs.select(
                F.col("c").alias("src"), F.col("d").alias("dst"), F.col("w2").alias("weight")
            )
        )
        edges = (
            rest.unionByName(applied).unionByName(reverted).unionByName(kept)
            .localCheckpointFlat(eager=True)
        )
    # swaps never change the vertex universe — carry it through
    # verbatim (an explicit vcount would re-mint dense 0..n-1 ids and
    # corrupt sparse-id graphs' vertex tables)
    return LinkGraph(
        edges, directed=graph.directed, n=graph._n, vertices=graph._vertices
    )
