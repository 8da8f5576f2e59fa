"""Spectral coarse graining (SCG) — shrink a graph while preserving
prescribed eigenpairs (igraph_scg_grouping / igraph_scg_adjacency /
igraph_scg_laplacian / igraph_scg_stochastic,
/root/reference/src/scg.c:269-380,760-1000 and the method papers cited
there: Morton de Lachapelle-Gfeller-De Los Rios 2008, Gfeller-De Los
Rios PRL 99/100).

Reference pipeline (scg.c:190-240): (1) compute the eigenpairs of the
adjacency / Laplacian / stochastic matrix to preserve; (2) solve the
SCG grouping problem per eigenvector — exactly (dynamic programming,
scg_optimal_method.c) or approximately by constant interval binning
(scg_approximate_methods.c:94) optionally refined by 1-D Lloyd k-means
(scg_kmeans.c); (3) intersect the per-eigenvector partitions (two
vertices share a final group iff co-grouped in EVERY minimizing
partition, scg.c:295-305); (4) build semiprojectors L, R from the
partition (scg.c:472-720) and output the coarse matrix M' = L·M·Rᵀ as
a graph.

Distributed strategy (all four steps Spark-native):

- **eigenpairs** reuse the block-subspace Rayleigh-Ritz machinery of
  operators/embedding.py — k vertex columns, one edge join + k sums
  per superstep; the Laplacian / stochastic variants run the SAME
  symmetric iteration on a shifted / similarity-transformed operator
  (details on each entry point) so nothing non-symmetric is ever
  iterated;
- **interval grouping** is a pure column expression — one global agg
  for (min, max) of every eigenvector column at once, then
  ``least(floor((x-vmin)/eps), nt-1)``, matching the left-closed
  binning of scg_approximate_methods.c:94-129 (boundary values fall in
  the right bin, vmax clamps into the last);
- **k-means refinement** runs Lloyd over ALL eigenvectors in one pass
  per sweep: assignment is an argmin over ``nt`` literal centers
  (array expression, JVM-side), the recenter step is one groupBy-free
  aggregate of k·nt conditional means; centers live on the driver
  (k·nt doubles);
- **optimum grouping** (scg_optimal_method.c) is the exact 1-D DP —
  inherently sequential over a sorted eigenvector, O(nt·n²); kept
  driver-side behind the same size guard flow.py uses, vectorized with
  numpy prefix sums;
- **final intersection + coarse matrix** are a groupBy on the bin
  tuple (dense group ids via renumber_first_appearance — the
  package-wide label contract) and ONE edges⋈groups⋈groups join with per-mtype
  semiprojector coefficients (scg.c:472-720):
  symmetric L=R: 1/√n_g; laplacian row-norm: L=1/n_g, R=1 (col-norm
  swapped); stochastic row-norm: L=p_i/p(g), R=1 (col-norm swapped).

Everything in the per-edge path is whole-stage-codegen column algebra;
the only collects are k×k driver matrices (embedding), the (min,max)
row, per-sweep center rows, and the guarded optimum DP.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.embedding import adjacency_spectral_embedding
from xdata_igraph_spark.operators.lpa import renumber_first_appearance

_ALGOS = ("interval", "interval_km", "exact", "optimum")


def _interval_bins(
    vectors: DataFrame, xs: list[str], nt: list[int]
) -> DataFrame:
    """Append ``b_{x}`` bin columns: constant interval binning of each
    eigenvector column (scg_approximate_methods.c:94-157, breaks =
    vmin + j·(vmax-vmin)/nt, left-closed so interior boundary values
    go right and vmax clamps to the last bin)."""
    row = vectors.agg(
        *[F.min(x).alias(f"mn_{x}") for x in xs],
        *[F.max(x).alias(f"mx_{x}") for x in xs],
    ).first()
    out = []
    for x, n_i in zip(xs, nt):
        vmin = float(row[f"mn_{x}"] or 0.0)
        vmax = float(row[f"mx_{x}"] or 0.0)
        if vmax <= vmin:
            out.append(F.lit(0).alias(f"b_{x}"))
            continue
        eps = (vmax - vmin) / float(n_i)
        out.append(
            F.least(
                F.floor((F.col(x) - F.lit(vmin)) / F.lit(eps)),
                F.lit(int(n_i) - 1),
            ).cast("int").alias(f"b_{x}")
        )
    return vectors.select(*vectors.columns, *out)


def _kmeans_bins(
    vectors: DataFrame, xs: list[str], nt: list[int], maxiter: int
) -> DataFrame:
    """Append ``b_{x}``: per-eigenvector 1-D Lloyd k-means seeded with
    the equidistant centers of scg_approximate_methods.c:149-160
    (method 2: vmin + eps/2 + j·eps). One aggregate per sweep
    recenters EVERY eigenvector's nt clusters at once."""
    row = vectors.agg(
        *[F.min(x).alias(f"mn_{x}") for x in xs],
        *[F.max(x).alias(f"mx_{x}") for x in xs],
    ).first()
    centers: dict[str, list[float]] = {}
    for x, n_i in zip(xs, nt):
        vmin = float(row[f"mn_{x}"] or 0.0)
        vmax = float(row[f"mx_{x}"] or 0.0)
        if vmax <= vmin:
            centers[x] = [vmin] * int(n_i)
            continue
        eps = (vmax - vmin) / float(n_i)
        centers[x] = [vmin + eps / 2.0 + j * eps for j in range(int(n_i))]

    def assign_col(x: str) -> F.Column:
        cs = centers[x]
        arr = F.array(*[F.abs(F.col(x) - F.lit(c)) for c in cs])
        return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")

    for _sweep in range(maxiter):
        assigned = vectors.select(
            *[F.col(x) for x in xs],
            *[assign_col(x).alias(f"b_{x}") for x in xs],
        )
        aggs = []
        for x, n_i in zip(xs, nt):
            for j in range(int(n_i)):
                aggs.append(
                    F.avg(
                        F.when(F.col(f"b_{x}") == j, F.col(x))
                    ).alias(f"c_{x}_{j}")
                )
        crow = assigned.agg(*aggs).first()
        moved = 0.0
        for x, n_i in zip(xs, nt):
            new = []
            for j in range(int(n_i)):
                v = crow[f"c_{x}_{j}"]
                # empty cluster keeps its previous center (scg_kmeans.c
                # keeps the stale center in place the same way)
                c = centers[x][j] if v is None else float(v)
                moved = max(moved, abs(c - centers[x][j]))
                new.append(c)
            centers[x] = new
        if moved < 1e-12:
            break
    return vectors.select(
        *vectors.columns, *[assign_col(x).alias(f"b_{x}") for x in xs]
    )


def _optimum_bins(
    vectors: DataFrame,
    xs: list[str],
    nt: list[int],
    weights: DataFrame | None,
    max_vertices: int,
) -> DataFrame:
    """Append ``b_{x}``: exact per-eigenvector grouping by the 1-D
    dynamic program of scg_optimal_method.c (optimal partition of a
    sorted eigenvector into nt groups minimizing the within-group
    (p-weighted) sum of squared deviations — the cost the semiprojector
    preserves). Driver-side by design, like the reference's O(nt·n²)
    DP; guarded by ``max_vertices``."""
    n = vectors.count()
    if n > max_vertices:
        raise ValueError(
            f"scg optimum grouping is a driver-side exact DP (like the "
            f"reference's O(nt*n^2) scg_optimal_method.c); n={n} exceeds "
            f"the guard ({max_vertices}). Use algo='interval'/"
            f"'interval_km' at scale or raise max_vertices."
        )
    if weights is not None:
        wname = [c for c in weights.columns if c != "id"][0]
        joined = vectors.join(
            weights.select("id", F.col(wname).alias("_w")), "id", "left"
        ).fillna({"_w": 0.0})
    else:
        joined = vectors.withColumn("_w", F.lit(1.0))
    rows = joined.select("id", "_w", *xs).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    w = np.array([float(r["_w"]) for r in rows])
    bins: dict[str, np.ndarray] = {}
    for x, n_i in zip(xs, nt):
        v = np.array([float(r[x]) for r in rows])
        bins[x] = _dp_1d_groups(v, w, int(n_i))
    out = [(int(i),) + tuple(int(bins[x][j]) for x in xs) for j, i in enumerate(ids)]
    schema = "id long, " + ", ".join(f"b_{x} int" for x in xs)
    bdf = vectors.sparkSession.createDataFrame(out, schema)
    return vectors.join(F.broadcast(bdf), "id")


def _dp_1d_groups(v: np.ndarray, w: np.ndarray, nt: int) -> np.ndarray:
    """Exact weighted 1-D k-partition DP (Fisher / scg_optimal_method.c
    cost_matrix semantics): minimize sum over groups of
    Σ w_i (v_i - weighted_mean)², groups contiguous in sorted order."""
    n = len(v)
    order = np.argsort(v, kind="stable")
    vs, ws = v[order], w[order]
    # prefix sums → cost(a,b) of one group over sorted slice [a,b)
    cw = np.concatenate([[0.0], np.cumsum(ws)])
    cwv = np.concatenate([[0.0], np.cumsum(ws * vs)])
    cwv2 = np.concatenate([[0.0], np.cumsum(ws * vs * vs)])

    def seg_cost(a: np.ndarray, b: int) -> np.ndarray:
        # vectorized over candidate starts a (array), fixed end b
        W = cw[b] - cw[a]
        S = cwv[b] - cwv[a]
        Q = cwv2[b] - cwv2[a]
        with np.errstate(divide="ignore", invalid="ignore"):
            c = Q - np.where(W > 0, S * S / np.where(W > 0, W, 1.0), 0.0)
        return np.maximum(c, 0.0)

    nt = max(1, min(nt, n))
    dp = np.full((nt + 1, n + 1), np.inf)
    back = np.zeros((nt + 1, n + 1), dtype=np.int64)
    dp[0, 0] = 0.0
    starts = np.arange(n + 1)
    for g in range(1, nt + 1):
        for b in range(g, n + 1):
            a = starts[g - 1 : b]
            cand = dp[g - 1, g - 1 : b] + seg_cost(a, b)
            j = int(np.argmin(cand))
            dp[g, b] = cand[j]
            back[g, b] = g - 1 + j
    # backtrack the best over exactly nt groups (empty groups collapse
    # naturally: dp is monotone, ties keep earliest cut)
    labels_sorted = np.zeros(n, dtype=np.int64)
    b = n
    for g in range(nt, 0, -1):
        a = int(back[g, b])
        labels_sorted[a:b] = g - 1
        b = a
    labels = np.zeros(n, dtype=np.int64)
    labels[order] = labels_sorted
    return labels


def scg_grouping(
    vectors: DataFrame,
    nt: int | list[int],
    algo: str = "interval",
    maxiter: int = 100,
    p: DataFrame | None = None,
    max_vertices: int = 20000,
) -> DataFrame:
    """Solve the SCG grouping problem (igraph_scg_grouping,
    /root/reference/src/scg.c:269-470) → ``(id, group)``.

    ``vectors``: ``(id, x0..x{k-1})`` — the eigenvector columns to
    preserve (one minimizing partition is computed per column, the
    final partition is their intersection, scg.c:295-305). ``nt``: the
    number of intervals/groups per eigenvector (int, or one per
    column, the reference's ``nt_vec``). ``algo``: ``interval`` |
    ``interval_km`` | ``exact`` | ``optimum``. ``p``: stationary
    weights for the stochastic-mtype optimum DP (ignored otherwise).
    Group ids are dense 0..K-1 by first appearance in vertex-id order
    (the package-wide label contract)."""
    if algo not in _ALGOS:
        raise ValueError(f"algo must be one of {_ALGOS}")
    xs = [c for c in vectors.columns if c != "id"]
    if not xs:
        raise ValueError("vectors must carry at least one eigenvector column")
    nts = [int(nt)] * len(xs) if isinstance(nt, int) else [int(t) for t in nt]
    if len(nts) != len(xs):
        raise ValueError("nt_vec length must match the eigenvector count")
    if any(t < 1 for t in nts):
        raise ValueError(f"nt must be >= 1 (got {nts})")
    if algo == "exact":
        # group vertices with exactly equal components in every vector
        binned = vectors.select(
            *vectors.columns, *[F.col(x).alias(f"b_{x}") for x in xs]
        )
    elif algo == "interval":
        binned = _interval_bins(vectors, xs, nts)
    elif algo == "interval_km":
        binned = _kmeans_bins(vectors, xs, nts, maxiter)
    else:
        binned = _optimum_bins(vectors, xs, nts, p, max_vertices)
    keys = [f"b_{x}" for x in xs]
    tagged = binned.select(
        "id", F.xxhash64(*keys).alias("label")
    )
    # xxhash64 of the bin tuple is a stable group key; renumber to the
    # dense first-appearance contract (collisions across ≤ a few
    # thousand coarse groups are out of range for a 64-bit hash)
    return renumber_first_appearance(tagged).withColumnRenamed("label", "group")


def _coarse_edges(
    edges: DataFrame,
    groups: DataFrame,
    lcoef: DataFrame,
    rcoef: DataFrame,
) -> DataFrame:
    """M' = L·M·Rᵀ as a join: each edge (i→j, w) contributes
    L[g(i),i]·w·R[g(j),j] to coarse cell (g(i), g(j))
    (scg.c:838-860 via the sparse semiprojector product)."""
    g = groups.select("id", "group")
    return (
        edges.join(g.withColumnRenamed("id", "src").withColumnRenamed("group", "gsrc"), "src")
        .join(g.withColumnRenamed("id", "dst").withColumnRenamed("group", "gdst"), "dst")
        .join(lcoef.withColumnRenamed("id", "src").withColumnRenamed("coef", "_l"), "src")
        .join(rcoef.withColumnRenamed("id", "dst").withColumnRenamed("coef", "_r"), "dst")
        .groupBy(F.col("gsrc").alias("src"), F.col("gdst").alias("dst"))
        .agg(F.sum(F.col("weight") * F.col("_l") * F.col("_r")).alias("weight"))
    )


def _sym_coefs(groups: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Symmetric semiprojectors: L = R, entry 1/√n_g
    (scg.c:472-535)."""
    sizes = groups.groupBy("group").agg(F.count("*").alias("_n"))
    coef = groups.join(F.broadcast(sizes), "group").select(
        "id", (F.lit(1.0) / F.sqrt(F.col("_n"))).alias("coef")
    )
    return coef, coef


def _lap_coefs(
    groups: DataFrame, norm: str
) -> tuple[DataFrame, DataFrame]:
    """Laplacian semiprojectors (scg.c:537-632): row-norm L=1/n_g, R=1;
    col-norm L=1, R=1/n_g."""
    if norm not in ("row", "col"):
        raise ValueError(f"norm must be 'row' or 'col' (got {norm!r})")
    sizes = groups.groupBy("group").agg(F.count("*").alias("_n"))
    inv = groups.join(F.broadcast(sizes), "group").select(
        "id", (F.lit(1.0) / F.col("_n")).alias("coef")
    )
    ones = groups.select("id", F.lit(1.0).alias("coef"))
    return (inv, ones) if norm == "row" else (ones, inv)


def _sto_coefs(
    groups: DataFrame, p: DataFrame, norm: str
) -> tuple[DataFrame, DataFrame]:
    """Stochastic semiprojectors (scg.c:634-760): pnormed_i =
    p_i / Σ_{j∈g(i)} p_j; row-norm L=pnormed, R=1; col-norm swapped."""
    if norm not in ("row", "col"):
        raise ValueError(f"norm must be 'row' or 'col' (got {norm!r})")
    pname = [c for c in p.columns if c != "id"][0]
    gp = groups.join(p.select("id", F.col(pname).alias("_p")), "id")
    psum = gp.groupBy("group").agg(F.sum("_p").alias("_pg"))
    pn = gp.join(F.broadcast(psum), "group").select(
        "id", (F.col("_p") / F.col("_pg")).alias("coef")
    )
    ones = groups.select("id", F.lit(1.0).alias("coef"))
    return (pn, ones) if norm == "row" else (ones, pn)


def scg_adjacency(
    graph: LinkGraph,
    no: int,
    nt: int | list[int],
    algo: str = "interval",
    groups: DataFrame | None = None,
    maxiter: int = 100,
) -> dict:
    """SCG of the adjacency matrix (igraph_scg_adjacency,
    /root/reference/src/scg.c:1470-1600): preserve the top-``no``
    |λ|-eigenpairs of A (the reference's ``ev`` index set realized as
    ARPACK-LM order, same convention as operators/embedding.py).

    Returns ``{"groups", "coarse_edges", "values", "vectors"}`` —
    the partition (id, group), the coarse graph's weighted edge table
    M' = L·A·Lᵀ over group ids, the preserved eigenvalues, and the
    eigenvector columns used."""
    vectors, values = adjacency_spectral_embedding(
        graph, no=no, weighted=True, scaled=False
    )
    if groups is None:
        groups = scg_grouping(vectors, nt, algo=algo, maxiter=maxiter)
    groups = groups.localCheckpointFlat(eager=True)
    lcoef, rcoef = _sym_coefs(groups)
    # full symmetric matrix entries (directed graphs coarse-grain their
    # IGRAPH_ALL symmetrization — the operator the eigenpairs came from)
    coarse = _coarse_edges(
        graph.symmetrized().select("src", "dst", "weight"), groups, lcoef, rcoef
    )
    return {
        "groups": groups,
        "coarse_edges": coarse,
        "values": values,
        "vectors": vectors,
    }


def scg_laplacian(
    graph: LinkGraph,
    no: int,
    nt: int | list[int],
    algo: str = "interval",
    norm: str = "row",
    groups: DataFrame | None = None,
    maxiter: int = 100,
) -> dict:
    """SCG of the Laplacian L = D - A (igraph_scg_laplacian,
    /root/reference/src/scg.c:1600-1750), preserving the ``no``
    SMALLEST eigenpairs (the spectral-gap end that matters for
    diffusion/synchronization, per the PRL 100 paper).

    The smallest eigenpairs come out of the SAME symmetric subspace
    iteration as everything else via a spectral shift: iterate on
    M = A - D + σI (σ = 2·maxdeg ⇒ M PSD by Gershgorin); M's largest
    eigenpairs are exactly L's smallest, eigenvectors unchanged —
    nothing new to iterate, ``cvec`` already plumbs the diagonal."""
    # weighted Laplacian: the diagonal is the strength (weighted
    # degree), and so is the Gershgorin radius bound for the shift
    deg = graph.strength(mode="all", loops=True).select(
        "id", F.col("strength").cast("double").alias("d")
    )
    sigma = 2.0 * float(deg.agg(F.max("d")).first()[0] or 0.0)
    cvec = deg.select("id", (F.lit(sigma) - F.col("d")).alias("c"))
    vectors, shifted = adjacency_spectral_embedding(
        graph, no=no, weighted=True, cvec=cvec, scaled=False
    )
    values = [sigma - v for v in shifted]  # λ_L = σ - λ_M, ascending
    if groups is None:
        groups = scg_grouping(vectors, nt, algo=algo, maxiter=maxiter)
    groups = groups.localCheckpointFlat(eager=True)
    lcoef, rcoef = _lap_coefs(groups, norm)
    # Laplacian as an edge table: off-diagonals -w plus diagonal
    # strength (directed graphs: Laplacian of the ALL-symmetrization,
    # matching the shifted operator the eigenpairs came from)
    sym = graph.symmetrized()
    lap = sym.select("src", "dst", (-F.col("weight")).alias("weight")).unionByName(
        graph.strength(mode="all", loops=True).select(
            F.col("id").alias("src"),
            F.col("id").alias("dst"),
            F.col("strength").cast("double").alias("weight"),
        )
    )
    coarse = _coarse_edges(lap, groups, lcoef, rcoef)
    return {
        "groups": groups,
        "coarse_edges": coarse,
        "values": values,
        "vectors": vectors,
    }


def scg_stochastic(
    graph: LinkGraph,
    no: int,
    nt: int | list[int],
    algo: str = "interval",
    norm: str = "row",
    p: DataFrame | None = None,
    groups: DataFrame | None = None,
    maxiter: int = 100,
) -> dict:
    """SCG of the row-stochastic matrix P = D⁻¹·A
    (igraph_scg_stochastic, /root/reference/src/scg.c:1750-1900),
    preserving the top-``no`` eigenpairs and weighting the
    semiprojectors by the stationary distribution ``p``.

    Undirected graphs only (the reference drives ARPACK's
    non-symmetric solver; here P is iterated through its similarity
    transform D^½·P·D^-½ = D^-½·A·D^-½ — symmetric, same spectrum —
    and right-eigenvectors recovered as D^-½·u, which requires
    symmetry of A). The stationary distribution of an undirected walk
    is exact in closed form, p_i = d_i / 2m — no iteration."""
    if graph.directed:
        raise ValueError(
            "scg_stochastic: directed graphs need a non-symmetric eigensolver; "
            "provide precomputed vectors via scg_grouping + semiprojectors, "
            "or symmetrize first (reference uses ARPACK rnsolve here)"
        )
    deg = graph.strength(mode="all", loops=True).select(
        "id", F.col("strength").cast("double").alias("d")
    ).localCheckpointFlat(eager=True)
    two_m = float(deg.agg(F.sum("d")).first()[0] or 0.0)
    if p is None:
        p = deg.select("id", (F.col("d") / F.lit(two_m)).alias("p"))
    # similarity transform: iterate on N = D^-1/2 A D^-1/2
    sqrt_d = deg.select("id", F.sqrt(F.greatest("d", F.lit(1e-300))).alias("sd"))
    normed = (
        graph.symmetrized()
        .join(sqrt_d.withColumnRenamed("id", "src").withColumnRenamed("sd", "s1"), "src")
        .join(sqrt_d.withColumnRenamed("id", "dst").withColumnRenamed("sd", "s2"), "dst")
        .select("src", "dst", (F.col("weight") / (F.col("s1") * F.col("s2"))).alias("weight"))
    )
    # ``normed`` already carries BOTH directions of every pair; the
    # embedding's internal IGRAPH_ALL union would double each entry, so
    # hand it half the weight (w/2 + reversed w/2 = w)
    ng = LinkGraph(
        normed.withColumn("weight", F.col("weight") / 2.0),
        directed=True,
        n=graph.vcount(),
    )
    u, values = adjacency_spectral_embedding(ng, no=no, weighted=True, scaled=False)
    xs = [c for c in u.columns if c != "id"]
    vectors = u.join(sqrt_d, "id").select(
        "id", *[(F.col(x) / F.col("sd")).alias(x) for x in xs]
    )
    if groups is None:
        groups = scg_grouping(vectors, nt, algo=algo, p=p, maxiter=maxiter)
    groups = groups.localCheckpointFlat(eager=True)
    lcoef, rcoef = _sto_coefs(groups, p, norm)
    sto = (
        graph.symmetrized()
        .join(deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("weight") / F.col("d")).alias("weight"))
    )
    coarse = _coarse_edges(sto, groups, lcoef, rcoef)
    return {
        "groups": groups,
        "coarse_edges": coarse,
        "values": values,
        "vectors": vectors,
        "p": p,
    }
