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
