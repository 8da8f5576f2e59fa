"""HITS (hub/authority) and eigenvector centrality — the same
superstep family as PageRank.

Reference semantics:
- ``igraph_hub_score`` / ``igraph_authority_score``
  (/root/reference/src/centrality.c:840-911) compute the principal
  eigenvectors of A·Aᵀ and Aᵀ·A via ARPACK; equivalently the HITS
  fixpoint hub = A·auth, auth = Aᵀ·hub with renormalization each
  round. igraph scales results so the maximum score is 1 and treats
  undirected graphs symmetrically.
- ``igraph_eigenvector_centrality``
  (/root/reference/src/centrality.c:484-600): principal eigenvector of
  the (weighted) adjacency, max-1 scaled.

Distributed strategy: synchronous power iteration — per superstep one
edge-size join + aggregate against a once-shuffled cached contribution
table, exactly the PageRank message plan. ARPACK's restarted Arnoldi
(/root/reference/src/arpack.c) is a sequential in-memory refinement;
power iteration converges to the same principal eigenvector for these
nonnegative matrices (Perron–Frobenius). Tests verify against dense
numpy eigensolves.

Scale/efficiency notes:
- ONE driver action per superstep: the convergence aggregate computes
  ``S2 = Σ x_new²`` and ``cross = Σ x_new · x_old_unit`` together; the
  L2 norm and the direction change ``delta = √(2·(1-cos))`` (an upper
  bound on the max-norm change of the unit vector) both derive from it
  driver-side, and renormalization is folded into the next superstep's
  expressions as a literal scalar — no second pass over the data;
- state rows carry the *raw* (unnormalized) iterate; since only one
  step of growth accumulates between normalizations, no overflow.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def _prep_edges(graph: LinkGraph, weighted: bool, reverse: bool = False) -> DataFrame:
    e = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    e = e.select("src", "dst", "weight")
    if not graph.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    elif reverse:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    return e.repartition("src").localCheckpointFlat(eager=True)


def _delta_from(S2: float, cross: float, n: int) -> tuple[float, float]:
    """(norm, unit-direction delta) from the fused aggregate."""
    nrm = math.sqrt(S2) if S2 > 0 else 1.0
    cos = min(1.0, abs(cross) / nrm) if nrm > 0 else 0.0
    return nrm, math.sqrt(max(0.0, 2.0 * (1.0 - cos)))


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 200,
    tol: float = 1e-9,
    weighted: bool = True,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Eigenvector centrality → (id, centrality), max-1 scaled
    (igraph_eigenvector_centrality semantics: symmetric/ALL adjacency)."""
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "evcent")
    e = graph.edges if weighted else graph.edges.withColumn("weight", F.lit(1.0))
    sym = (
        e.select("src", "dst", "weight")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        .repartition("src")
        .localCheckpointFlat(eager=True)
    )
    verts = graph.vertices().localCheckpointFlat(eager=True)
    n = graph.vcount()
    # state: raw iterate; scale = L2 norm of the current raw state
    state = verts.withColumn("x", F.lit(1.0))
    scale = math.sqrt(float(n)) or 1.0

    for it in range(max_iter):
        inv = 1.0 / scale
        msgs = (
            state.select(F.col("id").alias("src"), (F.col("x") * inv).alias("xu"))
            .join(sym, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("xu")).alias("x_new"))
        )
        new_state = (
            state.select("id", (F.col("x") * inv).alias("_old"))
            .join(msgs.withColumnRenamed("dst", "id"), "id", "left")
            .select("id", "_old", F.coalesce("x_new", F.lit(0.0)).alias("x"))
        )
        new_state = runner.materialize(new_state, it)
        row = new_state.agg(
            F.sum(F.col("x") * F.col("x")).alias("S2"),
            F.sum(F.col("x") * F.col("_old")).alias("cross"),
        ).first()
        scale, delta = _delta_from(float(row["S2"] or 0.0), float(row["cross"] or 0.0), n)
        runner.finish_iteration(it, delta, extra={"norm": scale})
        state = new_state.drop("_old")
        if delta < tol:
            break

    mx = float(state.agg(F.max("x")).first()[0] or 1.0) or 1.0
    return state.select("id", (F.col("x") / mx).alias("centrality"))


def hits(
    graph: LinkGraph,
    max_iter: int = 200,
    tol: float = 1e-9,
    weighted: bool = True,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """HITS → (id, hub, authority), each scaled to max 1.

    Per round (hub_k = A·Aᵀ·hub_{k-1} with inline normalization):
    ``auth = Aᵀ·hub`` then ``hub' = A·auth`` — two edge joins, one
    driver action. Convergence is tested on the hub direction; the
    authority vector is the last computed ``Aᵀ·hub`` (same fixpoint).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "hits")
    fwd = _prep_edges(graph, weighted)                 # u→v: hub(u) feeds auth(v)
    rev = _prep_edges(graph, weighted, reverse=True)   # v→u: auth(v) feeds hub(u)

    verts = graph.vertices().localCheckpointFlat(eager=True)
    n = graph.vcount()
    state = verts.withColumn("hub", F.lit(1.0)).withColumn("authority", F.lit(0.0))
    scale = math.sqrt(float(n)) or 1.0

    for it in range(max_iter):
        inv = 1.0 / scale
        auth = (
            state.select(F.col("id").alias("src"), (F.col("hub") * inv).alias("hu"))
            .join(fwd, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("hu")).alias("a_new"))
            .withColumnRenamed("dst", "id")
        )
        hub = (
            auth.select(F.col("id").alias("src"), "a_new")
            .join(rev, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("a_new")).alias("h_new"))
            .withColumnRenamed("dst", "id")
        )
        new_state = (
            state.select("id", (F.col("hub") * inv).alias("_old"))
            .join(auth, "id", "left")
            .join(hub, "id", "left")
            .select(
                "id",
                "_old",
                F.coalesce("h_new", F.lit(0.0)).alias("hub"),
                F.coalesce("a_new", F.lit(0.0)).alias("authority"),
            )
        )
        new_state = runner.materialize(new_state, it)
        row = new_state.agg(
            F.sum(F.col("hub") * F.col("hub")).alias("S2"),
            F.sum(F.col("hub") * F.col("_old")).alias("cross"),
        ).first()
        scale, delta = _delta_from(float(row["S2"] or 0.0), float(row["cross"] or 0.0), n)
        runner.finish_iteration(it, delta, extra={"norm": scale})
        state = new_state.drop("_old")
        if delta < tol:
            break

    mx = state.agg(F.max("hub").alias("mh"), F.max("authority").alias("ma")).first()
    mh = float(mx["mh"] or 1.0) or 1.0
    ma = float(mx["ma"] or 1.0) or 1.0
    return state.select(
        "id",
        (F.col("hub") / mh).alias("hub"),
        (F.col("authority") / ma).alias("authority"),
    )


def betweenness(
    graph: LinkGraph,
    pivots: list[int] | DataFrame | None = None,
    directed: bool = True,
    max_depth: int = 200,
    _collect_edges: bool = False,
) -> DataFrame:
    """Vertex betweenness → (id, betweenness) (igraph_betweenness,
    /root/reference/src/centrality.c:1527-1569; estimate variant
    :1746): for each pair, geodesics through a vertex weighted by one
    over the number of geodesics; directed graphs use directed paths
    when ``directed`` (igraph ignores the flag for undirected graphs);
    undirected results are halved (each unordered pair is counted from
    both endpoints), matching the reference.

    Algorithm: Brandes dependency accumulation, batched over all pivot
    sources at once — the forward sweep is a layered multi-source BFS
    carrying geodesic counts sigma (state keyed (source, id)); the
    backward sweep walks layers deepest-first, each layer one edge-size
    join + aggregate: delta(u) += sigma_u/sigma_w · (1 + delta(w)) over
    tree-DAG edges u→w. Supersteps = 2 · depth, independent of |pivots|.

    ``pivots=None`` → exact (every vertex a source, O(|V||E|) — the
    reference's own complexity). A pivot subset gives the Brandes–Pich
    estimate scaled by |V|/|pivots| (the distributed answer to
    igraph_betweenness_estimate's cutoff).
    """
    spark = graph.spark
    use_directed = directed and graph.directed
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if not use_directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    e = e.repartition("src").localCheckpointFlat(eager=True)

    n = graph.vcount()
    if pivots is None:
        src_df = graph.vertices().select(F.col("id").alias("source"))
        scale = 1.0
    else:
        if isinstance(pivots, DataFrame):
            src_df = pivots.select(F.col(pivots.columns[0]).alias("source"))
        else:
            src_df = spark.createDataFrame(
                [(int(p),) for p in pivots], "source long"
            )
        k = src_df.count()
        scale = float(n) / k if k else 1.0

    # ---- forward: layered BFS with geodesic counts ----
    layer0 = src_df.select(
        "source", F.col("source").alias("id"), F.lit(1.0).alias("sigma")
    ).localCheckpointFlat(eager=True)
    layers = [layer0]
    reached = layer0.select("source", "id").localCheckpointFlat(eager=True)
    for _d in range(max_depth):
        frontier = layers[-1]
        nxt = (
            frontier.select("source", F.col("id").alias("src"), "sigma")
            .join(e, "src")
            .select("source", F.col("dst").alias("id"), "sigma")
            .join(reached, ["source", "id"], "left_anti")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpointFlat(eager=True)
        )
        if nxt.isEmpty():
            break
        layers.append(nxt)
        reached = reached.unionByName(nxt.select("source", "id")).localCheckpointFlat(
            eager=True
        )

    # ---- backward: dependency accumulation, deepest layer first ----
    # delta rows exist only once a vertex receives a contribution
    verts = graph.vertices()
    acc = None  # (id, betweenness) accumulated over (source, v≠source)
    eacc = None  # (src, dst, b) per-edge contributions (edge betweenness)
    delta_prev = None  # (source, id, delta) for the layer below
    for d in range(len(layers) - 1, 0, -1):
        w_layer = layers[d].select(
            "source", F.col("id").alias("dst"), F.col("sigma").alias("sigma_w")
        )
        if delta_prev is not None:
            w_layer = w_layer.join(delta_prev, ["source", "dst"], "left").select(
                "source", "dst", "sigma_w",
                F.coalesce("delta", F.lit(0.0)).alias("delta_w"),
            )
        else:
            w_layer = w_layer.withColumn("delta_w", F.lit(0.0))
        u_layer = layers[d - 1].select(
            "source", F.col("id").alias("src"), F.col("sigma").alias("sigma_u")
        )
        # per-DAG-edge dependency rows: the edge-betweenness terms AND
        # (summed per tail) the vertex deltas, from one join
        rows = (
            u_layer.join(e, "src")
            .join(w_layer, ["source", "dst"])
            .select(
                "source",
                "src",
                "dst",
                (
                    F.col("sigma_u") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                ).alias("val"),
            )
            .localCheckpointFlat(eager=True)
        )
        contrib = (
            rows.groupBy("source", F.col("src").alias("id"))
            .agg(F.sum("val").alias("delta"))
            .localCheckpointFlat(eager=True)
        )
        if _collect_edges:
            epart = rows.groupBy("src", "dst").agg(F.sum("val").alias("b"))
            eacc = epart if eacc is None else eacc.unionByName(epart)
        # delta of layer d-1 = contributions from layer d (a vertex's
        # shortest-path successors all sit exactly one layer deeper)
        delta_prev = contrib.withColumnRenamed("id", "dst").select(
            "source", "dst", "delta"
        )
        part = contrib.filter(F.col("source") != F.col("id")).groupBy("id").agg(
            F.sum("delta").alias("b")
        )
        acc = part if acc is None else acc.unionByName(part)
    factor = scale * (0.5 if not use_directed else 1.0)
    if _collect_edges:
        if eacc is None:
            return e.select("src", "dst", F.lit(0.0).alias("betweenness")).filter(
                F.lit(False)
            )
        eb = eacc.groupBy("src", "dst").agg(F.sum("b").alias("b"))
        if not use_directed:
            eb = (
                eb.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "b",
                )
                .groupBy("src", "dst")
                .agg(F.sum("b").alias("b"))
            )
        return eb.select(
            "src", "dst", (F.col("b") * F.lit(factor)).alias("betweenness")
        )
    if acc is None:
        return verts.select("id", F.lit(0.0).alias("betweenness"))
    total = acc.groupBy("id").agg(F.sum("b").alias("b"))
    return (
        verts.join(total, "id", "left")
        .select(
            "id",
            (F.coalesce("b", F.lit(0.0)) * F.lit(factor)).alias("betweenness"),
        )
    )


def edge_betweenness(
    graph: LinkGraph,
    pivots: list[int] | DataFrame | None = None,
    directed: bool = True,
    max_depth: int = 200,
) -> DataFrame:
    """Edge betweenness → (src, dst, betweenness)
    (igraph_edge_betweenness, /root/reference/src/centrality.c:2178):
    geodesics through each edge, weighted by 1/#geodesics per pair.
    Same batched-Brandes sweep as ``betweenness`` — the per-DAG-edge
    dependency terms are aggregated per (src, dst) instead of per tail;
    undirected edges report on the canonical (low, high) pair, halved
    like the vertex scores. Only edges on ≥1 geodesic appear (others
    are 0)."""
    return betweenness(
        graph,
        pivots=pivots,
        directed=directed,
        max_depth=max_depth,
        _collect_edges=True,
    )


def centralization(scores: DataFrame, theoretical_max: float,
                   score_col: str | None = None) -> float:
    """Freeman centralization of a per-vertex score vector
    (igraph_centralization, /root/reference/src/centrality.c:2756):
    Σ (max score − score_v) / theoretical_max; pass the family-specific
    maximum (igraph's *_tmax helpers, e.g. degree:
    (n−1)·(n−1+loops-adjust), betweenness: (n−1)²·(n−2)/... per mode) —
    one aggregate pass over the score DataFrame."""
    col = score_col or scores.columns[1]
    row = scores.agg(F.max(col).alias("mx"), F.sum(col).alias("s"),
                     F.count("*").alias("n")).first()
    if not row["n"] or not theoretical_max:
        return float("nan")
    total = row["mx"] * row["n"] - row["s"]
    return float(total) / float(theoretical_max)


def centralization_degree(graph: LinkGraph, mode: str = "all",
                          loops: bool = False) -> float:
    """Degree centralization (igraph_centralization_degree,
    /root/reference/src/centrality.c:2824; tmax :2904): undirected
    no-loops tmax = (n−1)·(n−2); directed all-mode = 2(n−1)² (in/out:
    (n−1)²); loops add n−1 per vertex slot."""
    n = graph.vcount()
    deg = graph.degrees(mode, loops=loops)
    if graph.directed and mode in ("in", "out"):
        tmax = (n - 1) * (n - 1 + (1 if loops else 0))
    elif graph.directed:
        tmax = 2 * (n - 1) * (n - 1 + (1 if loops else 0))
    else:
        tmax = (n - 1) * (n - 2 + (2 if loops else 0))
    return centralization(deg, float(tmax), "degree")


def constraint(graph: LinkGraph, weighted: bool = False) -> DataFrame:
    """Burt's constraint (structural holes) → (id, constraint)
    (igraph_constraint, /root/reference/src/structural_properties.c:
    2418-2700).

    Reference semantics: with tie strength ā[i,j] = Σ weights of all
    arcs between i and j in either direction (loops excluded; an
    unweighted reciprocal pair counts 2), s[i] = Σ_j ā[i,j] and
    proportional strength p[i,j] = ā[i,j]/s[i],

        C[i] = Σ_{j ∈ N(i)} ( p[i,j] + Σ_{q ≠ i,j} p[i,q]·p[q,j] )²

    Isolated vertices return NaN (src/structural_properties.c:2520-2524).

    Relational plan: the p table is one symmetrize + groupBy of the
    edge list (|E| rows); the indirect term is one self-join of p on
    the shared middle vertex (wedge-sized, the triangle-counting cost
    class — hub skew handled by AQE skew-join; at crawl scale cap or
    salt hub middles exactly like triangles); one final groupBy-sum.
    All JVM column arithmetic, no UDFs.
    """
    e = graph.edges.select("src", "dst", "weight") if weighted else (
        graph.edges.select("src", "dst", F.lit(1.0).alias("weight"))
    )
    e = e.filter(F.col("src") != F.col("dst"))
    ab = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("a"))
    )
    s = ab.groupBy("src").agg(F.sum("a").alias("s"))
    p = ab.join(s, "src").select(
        F.col("src").alias("i"), F.col("dst").alias("j"), (F.col("a") / F.col("s")).alias("p")
    ).localCheckpointFlat(eager=True)

    # indirect: ind(i, j) = Σ_q p(i, q) · p(q, j), q ≠ j (q ≠ i is free:
    # p(i, q) rows imply q ∈ N(i), i ∉ N(i) after the loop filter)
    pq = p.select(F.col("i"), F.col("j").alias("q"), F.col("p").alias("p_iq"))
    qj = p.select(F.col("i").alias("q"), F.col("j"), F.col("p").alias("p_qj"))
    ind = (
        pq.join(qj, "q")
        .filter(F.col("q") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("p_iq") * F.col("p_qj")).alias("ind"))
    )
    per_pair = p.join(ind, ["i", "j"], "left").select(
        "i",
        F.pow(F.col("p") + F.coalesce(F.col("ind"), F.lit(0.0)), F.lit(2.0)).alias("c2"),
    )
    cons = per_pair.groupBy("i").agg(F.sum("c2").alias("constraint"))
    verts = graph.vertices()
    return verts.join(cons, verts.id == cons.i, "left").select(
        "id", F.coalesce("constraint", F.lit(float("nan"))).alias("constraint")
    )
