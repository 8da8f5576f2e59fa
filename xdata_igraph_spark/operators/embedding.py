"""Adjacency spectral embedding — the XDATA fork's latent-position
estimator (igraph_adjacency_spectral_embedding,
/root/reference/src/embedding.c:747-830).

Reference semantics: rank-``no`` spectral decomposition of A (+ an
optional diagonal augmentation ``cvec``); undirected graphs return
X = U·D^(1/2) over the top-|λ| eigenpairs (ARPACK); directed graphs do
the SVD pair. The reference drives ARPACK's restarted Lanczos through a
matvec callback (src/embedding.c:40-130) — a sequential in-memory
strategy.

Distributed strategy: **block orthogonal (subspace) iteration with
Rayleigh–Ritz extraction** — the standard cluster-scale replacement for
Lanczos when the operator only exists as a distributed matvec:

- the k-column iterate lives as k DOUBLE columns of a vertex DataFrame
  (k is small — everything stays in whole-stage codegen; no arrays, no
  UDFs);
- one superstep = one edge join + k sum-aggregates (the matvec
  A·X for all k columns at once) + a k×k Gram aggregate collected to
  the driver (numpy Cholesky/eigh on a k×k matrix is free);
- Rayleigh–Ritz: B = Xᵀ(AX) (k×k, same aggregate pass), eigh on the
  driver, rotate the columns by literal coefficients — convergence to
  the top-|λ| eigenpairs for symmetric A (same pairs ARPACK LM finds);
- per-superstep driver traffic: one k(k+1)-element row. Lineage cut per
  superstep via localCheckpoint like every other iterative operator.

Tests verify against a dense numpy eigendecomposition (allclose up to
column sign).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def adjacency_spectral_embedding(
    graph: LinkGraph,
    no: int,
    weighted: bool = True,
    cvec: DataFrame | None = None,
    scaled: bool = True,
    max_iter: int = 200,
    tol: float = 1e-9,
    krylov_snapshots: int = 0,
    krylov_guards: int = 2,
) -> tuple[DataFrame, list[float]]:
    """Undirected ASE → ((id, x0..x{no-1}), eigenvalues).

    ``cvec``: optional (id, c) diagonal augmentation (the reference's
    ``cvec`` parameter — commonly degree/(n-1) for the Laplacian-flavored
    variant). ``scaled``: return X = U·|D|^(1/2) (reference default
    path); otherwise the orthonormal U. Eigenvalues are ordered by
    descending |λ| (ARPACK LM). Directed graphs are symmetrized the
    IGRAPH_ALL way first (use the SVD pair semantics at your own
    column interpretation — the reference's directed mode is the
    A·Aᵀ analogue of the same iteration).

    ``krylov_snapshots``: when > 0, the last that-many iterate blocks
    are retained and the final Rayleigh–Ritz runs over their combined
    span (a block-Krylov subspace, Musco & Musco 2015) instead of the
    final block alone. Plain subspace iteration converges a pair at
    the edge of a near-degenerate spectral bulk like (gap ratio)^t —
    effectively never (the sf0.01 dense fixture has |λ3/λ2| = 0.986
    and the 2nd pair stalls at -16.7 vs the true -22.1); the Krylov
    span recovers it to ~1e-3 absolute residual with the same number
    of matvecs. Cost: K·no Gram columns in ONE extra aggregate pass
    (K = snapshots), plus one matvec over the stacked block; 6-10
    snapshots is plenty. While Krylov mode is on, the block also
    iterates ``krylov_guards`` extra guard columns (the snapshots of a
    bare k-block are too redundant — measured: guards take the bulk
    pair's residual from 1.7e-2 to 1.2e-3 at the same matvec count);
    only the top ``no`` pairs are returned. Off by default
    (bit-compatible with r4).
    """
    if no < 1:
        raise ValueError("embedding dimension must be >= 1")
    spark = graph.spark
    # guard columns enrich the Krylov span; plain mode keeps the exact
    # r4 block size
    k = int(no) + (int(krylov_guards) if krylov_snapshots > 0 else 0)

    e = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    # symmetric matvec in BOTH cases: undirected graphs store each edge
    # once and use it both ways; directed graphs embed the IGRAPH_ALL
    # symmetrization
    sym = e.select("src", "dst", "weight")
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).repartition("src").localCheckpointFlat(eager=True)

    verts = graph.vertices()
    if cvec is not None:
        base = verts.join(
            cvec.select("id", F.col(cvec.columns[1]).alias("_c")), "id", "left"
        ).select("id", F.coalesce("_c", F.lit(0.0)).alias("_c"))
    else:
        base = verts.withColumn("_c", F.lit(0.0))
    base = base.repartition("id").localCheckpointFlat(eager=True)

    xs = [f"x{j}" for j in range(k)]
    # deterministic pseudo-random start: k independent ±-ish columns
    init_cols = [
        (
            (F.pmod(F.xxhash64("id", F.lit(j), F.lit(977)), F.lit(2_000_001))
             - F.lit(1_000_000)) / F.lit(1_000_000.0)
        ).alias(f"x{j}")
        for j in range(k)
    ]
    state = base.select("id", "_c", *init_cols).localCheckpointFlat(eager=True)

    snaps: list[DataFrame] = []
    prev_evals: np.ndarray | None = None
    evals = np.zeros(k)
    rot_applied = None

    for _it in range(max_iter):
        # ---- matvec: Y = A·X + diag(c)·X, all k columns in one pass ----
        msgs = (
            state.select(F.col("id").alias("src"), *xs)
            .join(sym, "src")
            .groupBy("dst")
            .agg(*[F.sum(F.col("weight") * F.col(x)).alias(f"y_{x}") for x in xs])
        )
        y = (
            state.join(msgs, state.id == msgs.dst, "left")
            .select(
                "id",
                "_c",
                *[
                    (
                        F.coalesce(F.col(f"y_{x}"), F.lit(0.0))
                        + F.col("_c") * F.col(x)
                    ).alias(f"y_{x}")
                    for x in xs
                ],
                *xs,
            )
            .localCheckpointFlat(eager=False)
        )
        # ---- one aggregate: Gram(Y) and Xᵀ·Y (k×k each) ----
        aggs = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(F.col(f"y_x{i}") * F.col(f"y_x{j}")).alias(f"g_{i}_{j}")
                )
        for i in range(k):
            aggs.append(F.sum(F.col(f"x{i}") * F.col(f"y_x{i}")).alias(f"r_{i}"))
        row = y.agg(*aggs).first()
        G = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                G[i, j] = G[j, i] = float(row[f"g_{i}_{j}"] or 0.0)
        rayleigh = np.array([float(row[f"r_{i}"] or 0.0) for i in range(k)])

        # ---- orthonormalize + Rayleigh-Ritz rotation on the driver ----
        # eigh of G gives Y's column space basis; project: with X
        # orthonormal, XᵀY ≈ diag(λ) at convergence → current estimates
        w, V = np.linalg.eigh(G)  # ascending
        w = np.maximum(w, 1e-300)
        # B maps Y to an orthonormal basis ordered by descending ‖Y·b‖
        order = np.argsort(w)[::-1]
        B = V[:, order] / np.sqrt(w[order])
        new_evals = np.sqrt(w[order])  # ‖A·u‖ ≈ |λ| for unit u
        coef = B  # column j of new X = Σ_i coef[i, j]·y_i

        new_state = y.select(
            "id",
            "_c",
            *[
                sum(
                    (F.col(f"y_x{i}") * float(coef[i, j]) for i in range(1, k)),
                    F.col("y_x0") * float(coef[0, j]),
                ).alias(f"x{j}")
                for j in range(k)
            ],
        ).localCheckpointFlat(eager=True)
        state = new_state
        evals = new_evals
        rot_applied = rayleigh
        if krylov_snapshots > 0:
            snaps.append(new_state)
            snaps = snaps[-int(krylov_snapshots):]
        if prev_evals is not None:
            denom = np.maximum(np.abs(new_evals), 1e-30)
            if float(np.max(np.abs(new_evals - prev_evals) / denom)) < tol:
                break
        prev_evals = new_evals
    del rot_applied

    if len(snaps) >= 2:
        return _krylov_rayleigh_ritz(
            spark, sym, snaps, k, int(no), scaled
        )

    # ---- final Rayleigh–Ritz on A itself: B = Xᵀ·(A + diag(c))·X ----
    # The loop's G = YᵀY is a Ritz step w.r.t. A², which cannot split
    # degenerate ±λ pairs (guaranteed on bipartite graphs). Projecting
    # A onto the converged subspace and rotating X by eigh(B)'s
    # eigenvectors recovers the true signed eigenpairs — the same pairs
    # ARPACK LM returns.
    msgs = (
        state.select(F.col("id").alias("src"), *xs)
        .join(sym, "src")
        .groupBy("dst")
        .agg(*[F.sum(F.col("weight") * F.col(x)).alias(f"y_{x}") for x in xs])
    )
    z = state.join(msgs, state.id == msgs.dst, "left").select(
        "id",
        "_c",
        *xs,
        *[
            (F.coalesce(F.col(f"y_{x}"), F.lit(0.0)) + F.col("_c") * F.col(x)).alias(
                f"y_{x}"
            )
            for x in xs
        ],
    )
    row = z.agg(
        *[
            F.sum(F.col(f"x{i}") * F.col(f"y_x{j}")).alias(f"b_{i}_{j}")
            for i in range(k)
            for j in range(i, k)
        ]
    ).first()
    B = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            B[i, j] = B[j, i] = float(row[f"b_{i}_{j}"] or 0.0)
    w, V = np.linalg.eigh(B)  # ascending, orthonormal V
    order = np.argsort(-np.abs(w))  # |λ| descending like ARPACK LM
    lambdas_sorted = [float(w[j]) for j in order]

    out_cols = []
    for pos, j in enumerate(order):
        col = sum(
            (F.col(f"x{i}") * float(V[i, j]) for i in range(1, k)),
            F.col("x0") * float(V[0, j]),
        )
        if scaled:
            col = col * float(math.sqrt(abs(w[j])))
        out_cols.append(col.alias(f"x{pos}"))
    return state.select("id", *out_cols), lambdas_sorted


def eigenpair_residuals(
    graph: LinkGraph,
    X: DataFrame,
    eigenvalues: list[float],
    pairs: list[int] | None = None,
    weighted: bool = True,
) -> DataFrame:
    """Per-vertex eigenpair residuals |(A·x_j)_i − λ_j·x_j[i]| →
    (id, r_x{j}...) for the requested pairs.

    A is the same symmetrized (IGRAPH_ALL) weighted adjacency the
    embedding iterated, so the residual is an exact a-posteriori
    convergence certificate for `adjacency_spectral_embedding`'s
    output: a converged pair has r ≈ 0 at every vertex regardless of
    the column scaling (A·(u·s) = λ·(u·s) for any scalar s). Used by
    the driver contract to turn the eigensolve into an oracle-checkable
    query. One edge join + one aggregate — no driver-side matrices.
    """
    pairs = list(range(len(eigenvalues))) if pairs is None else pairs
    xs = [f"x{j}" for j in pairs]
    e = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    e = e.select("src", "dst", "weight")
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    msgs = (
        X.select(F.col("id").alias("src"), *xs)
        .join(sym, "src")
        .groupBy("dst")
        .agg(*[F.sum(F.col("weight") * F.col(x)).alias(f"y_{x}") for x in xs])
    )
    return X.join(msgs, X.id == msgs.dst, "left").select(
        "id",
        *[
            F.abs(
                F.coalesce(F.col(f"y_{x}"), F.lit(0.0))
                - F.lit(float(eigenvalues[j])) * F.col(x)
            ).alias(f"r_{x}")
            for x, j in zip(xs, pairs)
        ],
    )


def _krylov_rayleigh_ritz(spark, sym, snaps, k, no, scaled):
    """Rayleigh–Ritz over the span of the retained iterate blocks.

    Z = [snap_1 | … | snap_K] (K·k columns). One matvec pass gives
    AZ (+ diag(c)·Z), one aggregate gives both Gram matrices
    M = ZᵀZ and B = Zᵀ(A+diag(c))Z; the driver filters M's
    numerically-dependent directions (the snapshots overlap heavily —
    that is fine, the span is what matters), solves the projected
    symmetric eigenproblem, and emits the top-k pairs as literal
    column combinations. See `adjacency_spectral_embedding`'s
    ``krylov_snapshots`` docs."""
    import math as _math

    K = len(snaps)
    cols = []
    z = snaps[0].select(
        "id", "_c", *[F.col(f"x{j}").alias(f"z_{j}") for j in range(k)]
    )
    cols.extend(f"z_{j}" for j in range(k))
    for s_i, s in enumerate(snaps[1:], start=1):
        z = z.join(
            s.select(
                "id",
                *[
                    F.col(f"x{j}").alias(f"z_{s_i * k + j}")
                    for j in range(k)
                ],
            ),
            "id",
        )
        cols.extend(f"z_{s_i * k + j}" for j in range(k))
    z = z.localCheckpointFlat(eager=True)

    msgs = (
        z.select(F.col("id").alias("src"), *cols)
        .join(sym, "src")
        .groupBy("dst")
        .agg(*[F.sum(F.col("weight") * F.col(c)).alias(f"a_{c}") for c in cols])
    )
    y = z.join(msgs, z.id == msgs.dst, "left").select(
        "id",
        *cols,
        *[
            (
                F.coalesce(F.col(f"a_{c}"), F.lit(0.0)) + F.col("_c") * F.col(c)
            ).alias(f"a_{c}")
            for c in cols
        ],
    )
    aggs = []
    n_z = len(cols)
    for i in range(n_z):
        for j in range(i, n_z):
            aggs.append(
                F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"m_{i}_{j}")
            )
            aggs.append(
                F.sum(F.col(cols[i]) * F.col(f"a_{cols[j]}")).alias(f"b_{i}_{j}")
            )
    row = y.agg(*aggs).first()
    M = np.zeros((n_z, n_z))
    B = np.zeros((n_z, n_z))
    for i in range(n_z):
        for j in range(i, n_z):
            M[i, j] = M[j, i] = float(row[f"m_{i}_{j}"] or 0.0)
            B[i, j] = B[j, i] = float(row[f"b_{i}_{j}"] or 0.0)

    w_m, V_m = np.linalg.eigh(M)
    keep = w_m > 1e-10 * max(float(w_m.max()), 1e-300)
    T = V_m[:, keep] / np.sqrt(w_m[keep])
    Bs = T.T @ B @ T
    Bs = (Bs + Bs.T) / 2
    w, V = np.linalg.eigh(Bs)
    order = np.argsort(-np.abs(w))[:no]
    lambdas = [float(w[j]) for j in order]
    C = T @ V[:, order]  # n_z × k literal coefficients

    out_cols = []
    for pos in range(no):
        col = sum(
            (F.col(cols[i]) * float(C[i, pos]) for i in range(1, n_z)),
            F.col(cols[0]) * float(C[0, pos]),
        )
        if scaled:
            col = col * float(_math.sqrt(abs(lambdas[pos])))
        out_cols.append(col.alias(f"x{pos}"))
    return z.select("id", *out_cols), lambdas
