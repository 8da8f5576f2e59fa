"""Hierarchical random graphs — fit / sample / predict
(igraph_hrg_fit / igraph_hrg_game / igraph_hrg_predict /
igraph_hrg_dendrogram, /root/reference/src/igraph_hrg.cc and the
Clauset-Moore-Newman dendrogram machinery in
/root/reference/src/hrg_dendro.h; model: Clauset, Moore, Newman,
"Hierarchical structure and the prediction of missing links in
networks", Nature 453, 2008).

Model: a binary dendrogram over the n vertices whose n-1 internal
nodes carry probabilities θ_r; a pair (i,j) is connected independently
with probability θ at their lowest common ancestor. The MLE for θ_r is
e_r/(n_Lr·n_Rr) (edges crossing node r over possible pairs), and the
log-likelihood is Σ_r e_r·ln θ_r + (n_Lr·n_Rr − e_r)·ln(1−θ_r).

Dendrogram data model (mirrors igraph_hrg_t,
include/igraph_hrg.h:44-78): a DataFrame
``(node:int, left:int, right:int, prob:double, edges:long,
vertices:long)`` — internal nodes are negative (-1 = root, like the
reference's encoding), leaves are 0..n-1.

Distributed strategy:

- **hrg_game / hrg_predict are relational.** The key identity: every
  unordered leaf pair has exactly ONE internal node at which the two
  leaves sit on opposite sides — its LCA. So the full pair↔θ relation
  is one equi-join of the (leaf, internal, side) ancestor table with
  itself on the internal node (L side × R side), no O(n²) driver loop
  and no double counting; sampling is the package-standard
  deterministic xxhash coin per pair. Candidate volume is inherently
  C(n,2) — the same total the reference's pair loops visit — but
  tree-partitioned, so Spark spreads it across executors.
- **hrg_fit is the reference's sequential Metropolis MCMC**
  (igraph_hrg.cc:85-160 'MCMCEquilibrium_Find' + monteCarloMove):
  nearest-neighbor-interchange moves on the dendrogram with
  likelihood-ratio acceptance. Inherently sequential (each move
  depends on the last), so it runs driver-side behind a size guard —
  the same documented stance as flow.py's Edmonds-Karp and paths.py's
  DFS — on bitset adjacency (Python ints), seeded and deterministic.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph

_DENDRO_SCHEMA = (
    "node int, left int, right int, prob double, edges long, vertices long"
)


class _Dendro:
    """Driver-side dendrogram state for the MCMC fit: children arrays,
    per-internal-node leaf bitsets, crossing-edge counts, and the
    per-node likelihood terms."""

    def __init__(self, n: int, adj: list[int], rng: random.Random):
        self.n = n
        self.adj = adj
        # random recursive bisection init: internal node ids 1..n-1
        # (sign-flipped to the reference's -1..-n+1 on export)
        self.left: list[int] = [0] * n  # index 1..n-1 used
        self.right: list[int] = [0] * n
        self.parent: dict[int, int] = {}
        self._next = 1
        leaves = list(range(n))
        rng.shuffle(leaves)
        root = self._build(leaves, rng)
        assert root == 1
        self.leafset: list[int] = [0] * n  # bitset of leaves under node
        self.cross: list[int] = [0] * n  # edges crossing the node
        self._init_stats(1)

    # node encoding inside the fitter: >0 = internal (1 = root),
    # <=0 = leaf with id = -node
    def _build(self, leaves: list[int], rng: random.Random) -> int:
        if len(leaves) == 1:
            return -leaves[0]
        me = self._next
        self._next += 1
        cut = rng.randint(1, len(leaves) - 1)
        l = self._build(leaves[:cut], rng)
        r = self._build(leaves[cut:], rng)
        self.left[me], self.right[me] = l, r
        if l > 0:
            self.parent[l] = me
        if r > 0:
            self.parent[r] = me
        return me

    def _leafbits(self, node: int) -> int:
        return (1 << -node) if node <= 0 else self.leafset[node]

    def _count_cross(self, lbits: int, rbits: int) -> int:
        e = 0
        b = lbits
        while b:
            low = b & -b
            i = low.bit_length() - 1
            e += (self.adj[i] & rbits).bit_count()
            b ^= low
        return e

    def _init_stats(self, node: int) -> None:
        l, r = self.left[node], self.right[node]
        if l > 0:
            self._init_stats(l)
        if r > 0:
            self._init_stats(r)
        lb, rb = self._leafbits(l), self._leafbits(r)
        self.leafset[node] = lb | rb
        self.cross[node] = self._count_cross(lb, rb)

    def node_ll(self, node: int) -> float:
        lb = self._leafbits(self.left[node])
        rb = self._leafbits(self.right[node])
        pairs = lb.bit_count() * rb.bit_count()
        e = self.cross[node]
        if e == 0 or e == pairs:
            return 0.0
        th = e / pairs
        return e * math.log(th) + (pairs - e) * math.log(1.0 - th)

    def loglik(self) -> float:
        return sum(self.node_ll(v) for v in range(1, self.n))

    def propose(self, rng: random.Random) -> tuple[int, int, bool]:
        """Pick the random NNI move (hrg_dendro.h monteCarloMove's two
        alternate configurations): a non-root internal node c (whose
        parent is p) and which of c's children swaps with c's
        sibling. Selection only — apply_move mutates."""
        c = rng.randrange(2, self.n) if self.n > 2 else 1
        p = self.parent[c]
        swap_left = rng.random() < 0.5
        return c, p, swap_left

    def apply_move(self, c: int, p: int, swap_left: bool) -> tuple:
        """Apply the NNI: swap c's sibling with one of c's children.
        Returns an undo token."""
        sib_is_left = self.right[p] == c
        sib = self.left[p] if sib_is_left else self.right[p]
        child = self.left[c] if swap_left else self.right[c]
        # p's other child becomes `child`; c's chosen slot gets `sib`
        if sib_is_left:
            self.left[p] = child
        else:
            self.right[p] = child
        if swap_left:
            self.left[c] = sib
        else:
            self.right[c] = sib
        if child > 0:
            self.parent[child] = p
        if sib > 0:
            self.parent[sib] = c
        old_leafset, old_cross = self.leafset[c], self.cross[c]
        lb, rb = self._leafbits(self.left[c]), self._leafbits(self.right[c])
        self.leafset[c] = lb | rb
        self.cross[c] = self._count_cross(lb, rb)
        # p's leafset unchanged; p's crossing count changes
        old_pcross = self.cross[p]
        plb = self._leafbits(self.left[p])
        prb = self._leafbits(self.right[p])
        self.cross[p] = self._count_cross(plb, prb)
        return (c, p, sib_is_left, swap_left, sib, child,
                old_leafset, old_cross, old_pcross)

    def undo(self, tok: tuple) -> None:
        c, p, sib_is_left, swap_left, sib, child, ols, olc, opc = tok
        if sib_is_left:
            self.left[p] = sib
        else:
            self.right[p] = sib
        if swap_left:
            self.left[c] = child
        else:
            self.right[c] = child
        if sib > 0:
            self.parent[sib] = p
        if child > 0:
            self.parent[child] = c
        self.leafset[c], self.cross[c] = ols, olc
        self.cross[p] = opc

    def snapshot(self) -> tuple[list[int], list[int], list[int], list[int]]:
        """O(n) state copy (pointer copies — ints are immutable) for
        cheap MAP tracking; export later via _export_rows. Copying the
        four arrays is ~n/64× cheaper than rows()'s popcount sweep, and
        the ascent phase accepts (hence snapshots) nearly every move."""
        return (self.left[:], self.right[:], self.cross[:], self.leafset[:])

    def rows(self) -> list[tuple]:
        """Export as igraph_hrg_t-encoded rows: internal node k
        (1-based here) → -k; leaves stay 0..n-1."""
        return _export_rows(self.n, self.left, self.right, self.cross, self.leafset)


def _export_rows(
    n: int,
    left: list[int],
    right: list[int],
    cross: list[int],
    leafset: list[int],
) -> list[tuple]:
    def bits(node: int) -> int:
        return (1 << -node) if node <= 0 else leafset[node]

    out = []
    for v in range(1, n):
        lb = bits(left[v])
        rb = bits(right[v])
        pairs = lb.bit_count() * rb.bit_count()
        th = cross[v] / pairs if pairs else 0.0
        out.append(
            (
                -v,
                # internal k>0 → -k (reference encoding); leaf stored
                # as -i → i: both are a sign flip
                -left[v],
                -right[v],
                float(th),
                int(cross[v]),
                int((lb | rb).bit_count()),
            )
        )
    return out


def hrg_fit(
    graph: LinkGraph,
    steps: int | None = None,
    seed: int = 42,
    max_vertices: int = 2000,
) -> DataFrame:
    """Fit a hierarchical random graph by Metropolis MCMC over
    dendrograms (igraph_hrg_fit, /root/reference/src/igraph_hrg.cc:
    MCMCEquilibrium_Find) → the dendrogram DataFrame (igraph_hrg_t
    layout, root = node -1 ≡ highest internal id here).

    Driver-side by documented design: the reference's MCMC is a
    sequential chain (each NNI move conditions on the previous state).
    ``steps`` defaults to 100·n ln n moves, the reference's
    equilibrium-heuristic order of magnitude. Deterministic per seed;
    returns the maximum-likelihood dendrogram seen along the chain."""
    best_rows, _ = _run_mcmc(graph, steps, seed, max_vertices, samples=0)
    return graph.spark.createDataFrame(best_rows, _DENDRO_SCHEMA)


def _run_mcmc(
    graph: LinkGraph,
    steps: int | None,
    seed: int,
    max_vertices: int,
    samples: int,
) -> tuple[list[tuple], list[list[tuple]]]:
    """Shared Metropolis chain: burn ``steps`` moves tracking the MAP
    dendrogram, then (if samples > 0) keep sampling and snapshot the
    chain every n moves (igraph_hrg.cc MCMCEquilibrium_Sample's
    cadence). Returns (MAP rows, sampled rows)."""
    n = graph.vcount()
    if n > max_vertices:
        raise ValueError(
            f"hrg fit/sample is a driver-side sequential MCMC (like the "
            f"reference's); n={n} exceeds the guard ({max_vertices})"
        )
    if n < 3:
        raise ValueError("hrg MCMC needs at least 3 vertices")
    adj = [0] * n
    for r in (
        graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).collect()
    ):
        s, d = int(r["src"]), int(r["dst"])
        adj[s] |= 1 << d
        adj[d] |= 1 << s
    rng = random.Random(seed)
    den = _Dendro(n, adj, rng)
    ll = den.loglik()
    best_ll, best_snap = ll, den.snapshot()
    if steps is None:
        steps = int(100 * n * max(1.0, math.log(n)))

    def sweep(k: int) -> None:
        nonlocal ll, best_ll, best_snap
        for _ in range(k):
            # ΔL only touches the two reconfigured internal nodes
            c, p, swap_left = den.propose(rng)
            old_terms = den.node_ll(c) + den.node_ll(p)
            tok = den.apply_move(c, p, swap_left)
            d_ll = den.node_ll(c) + den.node_ll(p) - old_terms
            if d_ll >= 0 or rng.random() < math.exp(d_ll):
                ll += d_ll
                if ll > best_ll:
                    best_ll, best_snap = ll, den.snapshot()
            else:
                den.undo(tok)

    sweep(steps)
    best_rows = _export_rows(n, *best_snap)
    sampled: list[list[tuple]] = []
    for _ in range(samples):
        sweep(n)  # the reference samples the walk once every n moves
        sampled.append(den.rows())
    return best_rows, sampled


def hrg_sample(
    graph: LinkGraph,
    num_samples: int = 25,
    steps: int | None = None,
    seed: int = 42,
    max_vertices: int = 2000,
) -> DataFrame:
    """Sample ``num_samples`` dendrograms from the likelihood-
    proportional posterior (igraph_hrg_sample,
    /root/reference/src/igraph_hrg.cc MCMCEquilibrium_Sample): burn in
    ``steps`` Metropolis moves, then snapshot every n moves. Returns
    ONE stacked DataFrame with a leading ``sample`` column — the shape
    hrg_pair_probs/hrg_predict consume so all samples flow through a
    single distributed plan."""
    _, sampled = _run_mcmc(graph, steps, seed, max_vertices, samples=num_samples)
    rows = [
        (si,) + row for si, rows_i in enumerate(sampled) for row in rows_i
    ]
    return graph.spark.createDataFrame(rows, "sample int, " + _DENDRO_SCHEMA)


def _ancestor_sides(dendro: DataFrame, max_depth: int | None = None) -> DataFrame:
    """(leaf, anc, side [, sample]): every leaf × every ancestor
    internal node, with the side ('L'/'R') of the ancestor's child
    subtree the leaf sits in. Built bottom-up in O(depth) equi-joins
    (tree closure — total rows = Σ_node |subtree|, the same volume the
    reference's recursive traversals touch). A ``sample`` column (a
    stack of dendrograms, hrg_sample) keys every join so ALL samples
    close in the same O(depth) rounds."""
    keyed = "sample" in dendro.columns
    ks = ["sample"] if keyed else []
    if max_depth is None:
        # a dendrogram's depth is at most its internal-node count, so
        # derive the loop bound from the input instead of a fixed cap
        # (a path graph's ML dendrogram is a depth≈n caterpillar);
        # hitting the bound then only means a malformed/cyclic input
        if keyed:
            max_depth = int(
                dendro.groupBy("sample").count().agg(F.max("count")).first()[0] or 0
            ) + 1
        else:
            max_depth = int(dendro.count()) + 1
    arcs = dendro.select(
        *ks, F.col("node").alias("anc"), F.col("left").alias("x"), F.lit("L").alias("side")
    ).unionByName(
        dendro.select(
            *ks,
            F.col("node").alias("anc"),
            F.col("right").alias("x"),
            F.lit("R").alias("side"),
        )
    ).localCheckpointFlat(eager=True)
    # leaves are >= 0, internal children < 0
    acc = arcs.filter(F.col("x") >= 0).select(
        *ks, F.col("x").alias("leaf"), "anc", "side"
    )
    frontier = acc
    up = arcs.select(
        *[F.col(k).alias(f"_k_{k}") for k in ks],
        F.col("x").alias("child"),
        F.col("anc").alias("anc2"),
        F.col("side").alias("side2"),
    )
    for d in range(max_depth):
        cond = frontier.anc == up.child
        for k in ks:
            cond = cond & (frontier[k] == up[f"_k_{k}"])
        nxt = (
            frontier.join(up, cond)
            .select(*ks, "leaf", F.col("anc2").alias("anc"), F.col("side2").alias("side"))
            .localCheckpointFlat(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        acc = acc.unionByName(nxt)
        frontier = nxt
    else:
        raise ValueError(f"dendrogram deeper than max_depth={max_depth}")
    return acc


def hrg_pair_probs(dendro: DataFrame) -> DataFrame:
    """(a, b, prob [, sample]) for EVERY unordered leaf pair a<b: the
    connection probability at the pair's lowest common ancestor. One
    self-join of the ancestor table on the internal node (L side × R
    side) — each pair appears exactly once per dendrogram, at its LCA.
    C(n,2) output rows per sample by construction (the model defines a
    probability for every pair), so callers at scale filter/sample
    INSIDE this plan, not after a materialization."""
    keyed = "sample" in dendro.columns
    ks = ["sample"] if keyed else []
    anc = _ancestor_sides(dendro)
    lhs = anc.filter(F.col("side") == "L").select(
        *ks, "anc", F.col("leaf").alias("_u")
    )
    rhs = anc.filter(F.col("side") == "R").select(
        *ks, "anc", F.col("leaf").alias("_v")
    )
    return (
        lhs.join(rhs, ks + ["anc"])
        .join(dendro.select(*ks, F.col("node").alias("anc"), "prob"), ks + ["anc"])
        .select(
            *ks,
            F.least("_u", "_v").alias("a"),
            F.greatest("_u", "_v").alias("b"),
            "prob",
        )
    )


def hrg_game(dendro: DataFrame, seed: int = 42, sample: int | None = None) -> LinkGraph:
    """Sample a graph from a hierarchical random graph model
    (igraph_hrg_game, /root/reference/src/igraph_hrg.cc): every pair
    connects independently with its LCA's probability. Deterministic
    xxhash coin per (a, b, seed) — the package-standard RNG
    discipline; the Bernoulli filter is fused into the LCA join plan
    (no C(n,2) materialization).

    A stacked multi-sample dendrogram (hrg_sample's output, keyed by a
    ``sample`` column) encodes SEVERAL models; the game draws from one,
    so pass ``sample=k`` to pick it — otherwise each pair would emit up
    to num_samples parallel edges."""
    if "sample" in dendro.columns:
        if sample is None:
            raise ValueError(
                "dendro is a stacked multi-sample dendrogram; pass sample=k "
                "to choose the model to draw from (hrg_predict is the "
                "operator that averages over all samples)"
            )
        dendro = dendro.filter(F.col("sample") == sample).drop("sample")
    pp = hrg_pair_probs(dendro)
    coin = (
        F.pmod(F.xxhash64("a", "b", F.lit(seed)), F.lit(1_000_000_007))
        / F.lit(1_000_000_007.0)
    )
    edges = pp.filter(coin < F.col("prob")).select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    )
    n = dendro.agg(
        F.max(F.greatest(F.col("left"), F.col("right")))
    ).first()[0]
    return LinkGraph(edges, directed=False, n=int(n) + 1)


def hrg_predict(
    graph: LinkGraph,
    hrg: DataFrame | None = None,
    num_samples: int = 1,
    seed: int = 42,
    steps: int | None = None,
    max_vertices: int = 2000,
) -> DataFrame:
    """Predict missing edges (igraph_hrg_predict,
    /root/reference/src/igraph_hrg.cc): score every non-adjacent pair
    by its LCA connection probability averaged over ``num_samples``
    MCMC-sampled dendrograms — NOT the MAP dendrogram, which "explains
    away" exactly the missing edges one wants found (the CMN paper's
    central point; a MAP-only probe on a two-clique fixture ranked the
    planted hole below every cross-clique pair). → (a, b, score)
    sorted descending."""
    if hrg is None:
        hrg = hrg_sample(
            graph,
            num_samples=num_samples,
            steps=steps,
            seed=seed,
            max_vertices=max_vertices,
        )
    nsamp = (
        int(hrg.agg(F.countDistinct("sample")).first()[0])
        if "sample" in hrg.columns
        else 1
    )
    existing = graph.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    scored = (
        hrg_pair_probs(hrg)
        .groupBy("a", "b")
        .agg((F.sum("prob") / F.lit(float(nsamp))).alias("score"))
        .join(existing, ["a", "b"], "left_anti")
        .filter(F.col("a") != F.col("b"))
    )
    return scored.orderBy(F.desc("score"), "a", "b")


def hrg_dendrogram(dendro: DataFrame) -> DataFrame:
    """The dendrogram as a parent→child edge list with the internal
    node's probability (igraph_hrg_dendrogram returns the same tree as
    an igraph graph + prob attribute)."""
    return dendro.select(
        F.col("node").alias("parent"), F.col("left").alias("child"), "prob"
    ).unionByName(
        dendro.select(
            F.col("node").alias("parent"), F.col("right").alias("child"), "prob"
        )
    )


def hrg_create(
    spark,
    left: list[int],
    right: list[int],
    prob: list[float],
) -> DataFrame:
    """Build a dendrogram DataFrame from the igraph_hrg_t vectors
    (igraph_hrg_create, include/igraph_hrg.h:117): internal nodes are
    -1.. -(n-1) in vector order (root first), leaves 0..n-1. The
    derived vertices counts are filled in; crossing-edge counts need a
    graph and stay 0 (the reference leaves them unset here too)."""
    k = len(left)
    if not (len(right) == k == len(prob)):
        raise ValueError("left/right/prob must have equal length")
    sizes: dict[int, int] = {}

    def vsize(x: int) -> int:
        if x >= 0:
            return 1
        if x not in sizes:
            i = -x - 1
            sizes[x] = vsize(left[i]) + vsize(right[i])
        return sizes[x]

    rows = [
        (-(i + 1), int(left[i]), int(right[i]), float(prob[i]), 0, vsize(-(i + 1)))
        for i in range(k)
    ]
    return spark.createDataFrame(rows, _DENDRO_SCHEMA)
