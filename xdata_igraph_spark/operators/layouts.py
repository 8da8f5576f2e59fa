"""Graph drawing layouts — coordinate tables as DataFrames.

Reference: igraph_layout_random (/root/reference/src/layout.c:76),
igraph_layout_circle (:148), igraph_layout_star (:191),
igraph_layout_grid (:299), igraph_layout_fruchterman_reingold
(/root/reference/src/layout_fr.c:349; grid-accelerated variant
igraph_layout_i_grid_fr :180), igraph_layout_reingold_tilford
(/root/reference/src/layout.c:968), igraph_layout_bipartite (:2217).

Every layout returns a coordinate DataFrame ``(id, x, y)`` — the
distributed analogue of the reference's n x 2 result matrix. The
deterministic layouts (circle/star/grid/random) are pure column
expressions over the dense vertex ids. Fruchterman-Reingold is the
scale path: the O(n^2) repulsion term is grid-binned exactly like the
reference's own grid variant (and like the spatial join in the grg
generator) — each vertex only repels vertices in its 3x3 cell
neighborhood, so per-iteration cost is edges + near-pairs, not n^2.
Reingold-Tilford is re-expressed as a leaf-interval embedding (BFS
depth = y, subtree leaf-count intervals = x) because the reference's
contour-packing walk (layout.c:737) is inherently sequential; the
result preserves RT's invariants — parents centered over their
children, rows = depth levels, no subtree overlap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from xdata_igraph_spark.graph import LinkGraph


def layout_random(graph: LinkGraph, seed: int = 42) -> DataFrame:
    """Uniform positions in [-1, 1]^2 (igraph_layout_random,
    layout.c:76) — deterministic per (id, seed) via xxhash64."""

    def coord(salt: str):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))
        return (F.pmod(h, F.lit(2_000_001)) / 1_000_000.0 - 1.0).alias(salt)

    return graph.vertices().select("id", coord("x"), coord("y"))


def layout_circle(graph: LinkGraph) -> DataFrame:
    """Unit circle, vertex i at angle 2*pi*i/n (layout.c:148)."""
    n = graph.vcount()
    phi = F.col("id") * (2.0 * math.pi / max(n, 1))
    return graph.vertices().select(
        "id", F.cos(phi).alias("x"), F.sin(phi).alias("y")
    )


def layout_star(graph: LinkGraph, center: int = 0) -> DataFrame:
    """Center at the origin, the rest on the unit circle in id order
    (layout.c:191 — the angle index skips the center vertex)."""
    n = graph.vcount()
    if n <= 1:
        return graph.vertices().select(
            "id", F.lit(0.0).alias("x"), F.lit(0.0).alias("y")
        )
    step = 2.0 * math.pi / (n - 1)
    idx = F.when(F.col("id") < center, F.col("id")).otherwise(F.col("id") - 1)
    phi = idx * step
    return graph.vertices().select(
        "id",
        F.when(F.col("id") == center, 0.0).otherwise(F.cos(phi)).alias("x"),
        F.when(F.col("id") == center, 0.0).otherwise(F.sin(phi)).alias("y"),
    )


def layout_grid(graph: LinkGraph, width: int = 0) -> DataFrame:
    """Row-major integer lattice (layout.c:299); width <= 0 derives
    ceil(sqrt(n)) like the reference."""
    if width <= 0:
        width = int(math.ceil(math.sqrt(max(graph.vcount(), 1))))
    return graph.vertices().select(
        "id",
        (F.col("id") % width).cast("double").alias("x"),
        F.floor(F.col("id") / width).cast("double").alias("y"),
    )


def layout_bipartite(
    graph: LinkGraph, types: DataFrame, hgap: float = 1.0, vgap: float = 1.0
) -> DataFrame:
    """Two horizontal rows (igraph_layout_bipartite, layout.c:2217):
    type-0 vertices at y=0, type-1 at y=vgap, x = rank within the row
    spaced by ``hgap``. ``types`` is ``(id, type: 0/1)``."""
    w = Window.partitionBy("type").orderBy("id")
    return (
        graph.vertices()
        .join(types, "id")
        .select(
            "id",
            ((F.row_number().over(w) - 1) * hgap).cast("double").alias("x"),
            (F.col("type") * vgap).cast("double").alias("y"),
        )
    )


def layout_fruchterman_reingold(
    graph: LinkGraph,
    n_iter: int = 50,
    seed: int = 42,
    use_weights: bool = False,
) -> DataFrame:
    """Force-directed layout (igraph_layout_fruchterman_reingold,
    layout_fr.c:349) with the grid-accelerated repulsion of the
    reference's own large-graph variant (layout_fr.c:180).

    Plan shape per iteration (all JVM column ops, ~3 shuffles):
    - attraction: one join of the symmetrized arc table against the
      position table on each endpoint; per-arc pull d^2/k toward the
      neighbor (weight-scaled when ``use_weights``), aggregated by
      vertex;
    - repulsion: positions bucketed into cells of side 2k; a 3x3
      neighbor-cell self-join yields only near pairs (push k^2/d per
      pair) — the candidate set scales with local density, never n^2;
    - displacement capped by the linearly cooling temperature and
      clamped to the sqrt(n)-sided frame, exactly the reference's
      cooling/bounding scheme.

    Deterministic: hash-seeded initial positions, no RNG state.
    """
    n = max(graph.vcount(), 1)
    side = math.sqrt(n)  # frame side; area = n so ideal dist k = 1
    k = 1.0
    cell = 2.0 * k
    eps = 1e-9

    def coord(salt: str):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))
        return (F.pmod(h, F.lit(1_000_001)) / 1_000_000.0 * side).alias(salt)

    pos = (
        graph.vertices()
        .select("id", coord("x"), coord("y"))
        .localCheckpointFlat(eager=True)
    )
    arcs = (
        graph.symmetrized()
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .localCheckpointFlat(eager=True)
    )
    w_mult = F.col("weight") if use_weights else F.lit(1.0)

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for it in range(n_iter):
        temp = (side / 10.0) * (1.0 - it / n_iter)

        p_src = pos.select(
            F.col("id").alias("src"), F.col("x").alias("xs"), F.col("y").alias("ys")
        )
        p_dst = pos.select(
            F.col("id").alias("dst"), F.col("x").alias("xd"), F.col("y").alias("yd")
        )
        att = (
            arcs.join(p_src, "src")
            .join(p_dst, "dst")
            .select(
                F.col("src").alias("id"),
                (F.col("xd") - F.col("xs")).alias("dx"),
                (F.col("yd") - F.col("ys")).alias("dy"),
                w_mult.alias("wm"),
            )
            .select(
                "id",
                (F.sqrt(F.col("dx") ** 2 + F.col("dy") ** 2) + eps).alias("d"),
                "dx", "dy", "wm",
            )
            .select(
                "id",
                (F.col("dx") * F.col("d") / k * F.col("wm")).alias("fx"),
                (F.col("dy") * F.col("d") / k * F.col("wm")).alias("fy"),
            )
        )

        binned = pos.select(
            "id", "x", "y",
            F.floor(F.col("x") / cell).alias("cx"),
            F.floor(F.col("y") / cell).alias("cy"),
        )
        probes = binned.select(
            F.col("id").alias("oid"), F.col("x").alias("ox"), F.col("y").alias("oy"),
            F.explode(
                F.array(*[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx, dy in offsets
                ])
            ).alias("c"),
        ).select("oid", "ox", "oy", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
        rep = (
            binned.join(probes, ["cx", "cy"])
            .filter(F.col("id") != F.col("oid"))
            .select(
                "id",
                (F.col("x") - F.col("ox")).alias("dx"),
                (F.col("y") - F.col("oy")).alias("dy"),
            )
            .select(
                "id", "dx", "dy",
                (F.col("dx") ** 2 + F.col("dy") ** 2 + eps).alias("d2"),
            )
            .select(
                "id",
                (F.col("dx") * k * k / F.col("d2")).alias("fx"),
                (F.col("dy") * k * k / F.col("d2")).alias("fy"),
            )
        )

        disp = (
            att.unionByName(rep)
            .groupBy("id")
            .agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy"))
        )
        mag = F.sqrt(F.col("fx") ** 2 + F.col("fy") ** 2) + eps
        scale = F.least(F.lit(1.0), F.lit(temp) / mag)
        pos = (
            pos.join(disp, "id", "left")
            .fillna(0.0, subset=["fx", "fy"])
            .select(
                "id",
                F.greatest(
                    F.lit(0.0),
                    F.least(F.lit(side), F.col("x") + F.col("fx") * scale),
                ).alias("x"),
                F.greatest(
                    F.lit(0.0),
                    F.least(F.lit(side), F.col("y") + F.col("fy") * scale),
                ).alias("y"),
            )
            .localCheckpointFlat(eager=True)
        )
    return pos


def layout_reingold_tilford(
    graph: LinkGraph, root: int = 0, max_depth: int = 10_000
) -> DataFrame:
    """Tree layout (igraph_layout_reingold_tilford, layout.c:968):
    y = BFS depth below ``root``, x = midpoint of the subtree's
    leaf-count interval (children ordered by id under their parent).

    The reference packs subtree contours in a sequential post-order
    walk (layout.c:737); the interval embedding keeps its invariants —
    each parent horizontally centered over its children's span, one
    row per depth level, disjoint subtree spans — with two
    O(depth)-superstep passes (leaf counts up, offsets down), which is
    the distributed-friendly formulation. Vertices unreachable from
    ``root`` are omitted (the reference attaches extra components to a
    pseudo-root instead; pass their own roots separately)."""
    sym = (
        graph.symmetrized()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    spark = graph.spark

    # BFS: parent = lowest-id neighbor one level up (deterministic)
    frontier = spark.createDataFrame(
        [(int(root), 0, None)], "id long, depth int, parent long"
    )
    tree = frontier
    depth = 0
    while True:
        depth += 1
        if depth > max_depth:
            raise ValueError(f"BFS exceeded max_depth={max_depth}")
        nxt = (
            frontier.select(F.col("id").alias("src"))
            .join(sym, "src")
            .select(F.col("dst").alias("id"), F.col("src").alias("parent"))
            .join(tree.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("parent").alias("parent"))
            .select("id", F.lit(depth).alias("depth"), "parent")
            .localCheckpointFlat(eager=True)
        )
        if nxt.count() == 0:
            break
        tree = tree.unionByName(nxt).localCheckpointFlat(eager=True)
        frontier = nxt

    # pass 1 (up): subtree leaf counts, depth supersteps
    child_counts = (
        tree.filter(F.col("parent").isNotNull())
        .groupBy("parent")
        .agg(F.count("*").alias("nchild"))
        .withColumnRenamed("parent", "id")
    )
    leaves = (
        tree.join(child_counts, "id", "left_anti")
        .select("id", F.lit(1).alias("nleaf"))
    )
    nleaf = leaves
    for d in range(depth - 1, 0, -1):
        lifted = (
            tree.filter(F.col("depth") == d)
            .join(nleaf, "id")
            .groupBy("parent")
            .agg(F.sum("nleaf").alias("nleaf"))
            .withColumnRenamed("parent", "id")
        )
        nleaf = (
            nleaf.join(lifted.select("id"), "id", "left_anti")
            .unionByName(lifted)
            .localCheckpointFlat(eager=True)
        )

    # pass 2 (down): interval offsets — siblings ordered by id take
    # consecutive leaf-count blocks inside the parent's interval
    sib = Window.partitionBy("parent").orderBy("id")
    spans = tree.join(nleaf, "id").withColumn(
        "sib_off",
        F.sum("nleaf").over(sib) - F.col("nleaf"),
    )
    offsets = spans.filter(F.col("depth") == 0).select(
        "id", F.lit(0.0).alias("lo")
    )
    acc = offsets
    for d in range(1, depth):
        par = acc.select(F.col("id").alias("parent"), F.col("lo").alias("plo"))
        nx = (
            spans.filter(F.col("depth") == d)
            .join(par, "parent")
            .select("id", (F.col("plo") + F.col("sib_off")).alias("lo"))
            .localCheckpointFlat(eager=True)
        )
        acc = nx
        offsets = offsets.unionByName(nx)

    return (
        offsets.join(nleaf, "id")
        .join(tree.select("id", "depth"), "id")
        .select(
            "id",
            (F.col("lo") + F.col("nleaf") / 2.0).alias("x"),
            F.col("depth").cast("double").alias("y"),
        )
    )


def layout_kamada_kawai(
    graph: LinkGraph,
    n_pivots: int = 64,
    n_iter: int = 50,
    tol: float = 1e-4,
    weighted: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Kamada-Kawai layout (igraph_layout_kamada_kawai,
    /root/reference/src/layout.c — stress over graph-theoretic
    distances) as pivot-based sparse stress majorization.

    The reference minimizes sum_{i<j} (|p_i - p_j| - d_ij)^2 / d_ij^2
    over ALL vertex pairs, which needs the full O(n^2) distance matrix
    — a non-starter at web scale. The established sparse relaxation
    (pivot MDS / sparse stress) keeps only the terms anchored at p
    pivot vertices, so the state is the (vertex, pivot) distance table
    — O(n * p) rows, linear in n for fixed p — and each majorization
    sweep is ONE broadcast join + ONE groupBy("id") aggregate:

    - pivots: the p vertices with the smallest xxhash64(id, seed) —
      a deterministic uniform sample (no RNG state, reproducible on
      any cluster size);
    - distances: one batched multi-source BFS (operators/paths.py)
      over mode="all" — p sources advance together, supersteps =
      graph diameter, not p * diameter; unreachable pairs (disconnected
      graphs) take d_max + 1, the same finite-surrogate the dense
      solvers use;
    - update: simultaneous (Jacobi) SMACOF — every vertex, pivots
      included, moves to the weighted barycenter of its pivot targets
      computed from the PREVIOUS sweep's positions; pivot positions
      (p rows) are collected and broadcast, so the big table joins a
      tiny one and never self-joins;
    - convergence: the pivot-restricted stress is re-aggregated from
      the checkpointed positions each sweep; the loop stops when its
      relative drop falls below ``tol``.

    With n_pivots >= n every vertex is a pivot and this IS full
    Kamada-Kawai stress (up to the majorization fixpoint); the tests
    exercise that limit against the embedded-vs-graph distance
    correlation on paths and rings.
    """
    from xdata_igraph_spark.operators.paths import shortest_paths

    spark = graph.spark
    n = graph.vcount()
    if n == 0:
        return spark.createDataFrame([], "id long, x double, y double")
    if n == 1:
        return graph.vertices().select(
            "id", F.lit(0.0).alias("x"), F.lit(0.0).alias("y")
        )

    p = min(n, n_pivots)
    pivot_ids = [
        r["id"]
        for r in graph.vertices()
        .select("id", F.xxhash64(F.col("id"), F.lit(seed)).alias("h"))
        .orderBy("h", "id")
        .limit(p)
        .collect()
    ]

    dist = shortest_paths(graph, sources=pivot_ids, mode="all", weighted=weighted)
    d_max = dist.agg(F.max("dist")).first()[0] or 1.0
    # complete (vertex x pivot) grid; unreachable -> d_max + 1
    piv_df = spark.createDataFrame([(int(s),) for s in pivot_ids], "source long")
    grid = (
        graph.vertices()
        .crossJoin(F.broadcast(piv_df))
        .join(dist, ["source", "id"], "left")
        .select(
            "source",
            "id",
            F.coalesce("dist", F.lit(float(d_max) + 1.0)).alias("d"),
        )
        .filter(F.col("d") > 0)  # drop pivot self-terms (1/d^2 pole)
        .withColumn("w", 1.0 / (F.col("d") * F.col("d")))
        .repartition("id")
        .localCheckpointFlat(eager=True)
    )

    # circle start at the distance scale of the graph (the reference
    # also seeds KK from a circle when no initial layout is given)
    r0 = float(d_max) / 2.0
    phi = F.col("id") * (2.0 * math.pi / n)
    pos = graph.vertices().select(
        "id", (F.lit(r0) * F.cos(phi)).alias("x"), (F.lit(r0) * F.sin(phi)).alias("y")
    ).localCheckpointFlat(eager=True)

    eps = 1e-9
    prev_stress = None
    for _ in range(n_iter):
        prows = {
            r["id"]: (r["x"], r["y"])
            for r in pos.join(F.broadcast(piv_df.withColumnRenamed("source", "id")), "id").collect()
        }
        ppos = spark.createDataFrame(
            [(int(s), float(x), float(y)) for s, (x, y) in prows.items()],
            "source long, px double, py double",
        )
        pairs = (
            grid.join(F.broadcast(ppos), "source")
            .join(pos, "id")
            .withColumn(
                "delta",
                F.sqrt(
                    (F.col("x") - F.col("px")) ** 2 + (F.col("y") - F.col("py")) ** 2
                )
                + eps,
            )
        )
        agg = (
            pairs.groupBy("id")
            .agg(
                F.sum(
                    F.col("w")
                    * (F.col("px") + F.col("d") * (F.col("x") - F.col("px")) / F.col("delta"))
                ).alias("nx"),
                F.sum(
                    F.col("w")
                    * (F.col("py") + F.col("d") * (F.col("y") - F.col("py")) / F.col("delta"))
                ).alias("ny"),
                F.sum("w").alias("sw"),
                F.sum(F.col("w") * (F.col("delta") - F.col("d")) ** 2).alias("s"),
            )
        )
        # left join keeps a vertex whose every pivot term was the
        # dropped self-pair (only possible when p == 1)
        pos = (
            pos.withColumnRenamed("x", "_x").withColumnRenamed("y", "_y")
            .join(agg, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("nx") / F.col("sw"), F.col("_x")).alias("x"),
                F.coalesce(F.col("ny") / F.col("sw"), F.col("_y")).alias("y"),
                F.coalesce("s", F.lit(0.0)).alias("s"),
            )
            .localCheckpointFlat(eager=True)
        )
        stress = pos.agg(F.sum("s")).first()[0]
        pos = pos.drop("s")
        if prev_stress is not None and prev_stress > 0:
            if abs(prev_stress - stress) / prev_stress < tol:
                break
        prev_stress = stress

    return pos
