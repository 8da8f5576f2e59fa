"""Minimum spanning tree / forest — distributed Borůvka.

Reference: igraph_minimum_spanning_tree
(/root/reference/src/spanning_trees.c:78; unweighted :123, Prim
:187). Prim grows one tree one edge at a time — inherently
sequential; the distributed classic is Borůvka: every component picks
its lightest outgoing edge, components merge, repeat. The number of
components at least halves per round, so there are <= log2(n) rounds,
each of which is joins + aggregates:

- per-round min edge: tag each inter-component edge with both
  endpoint components, take the per-component min by a total order
  (weight, src, dst) — deterministic tie-break, so the edge SET is
  reproducible; with tied weights it may differ from the reference's
  insertion-order Prim pick, but the total weight (unique for any
  MST) always matches;
- merge: chosen edges form a functional graph on component labels
  whose only cycles are mutual picks (broken toward the smaller
  label); the remaining forest is collapsed by pointer jumping —
  O(log chain) self-joins, immune to the long-chain worst case that
  plain label propagation would hit (a path graph with monotone
  weights chains ALL components in one round);
- disconnected inputs yield the minimum spanning forest, exactly like
  the reference.

Returns the tree's edge DataFrame (src, dst, weight) — n - #components
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def minimum_spanning_tree(
    graph: LinkGraph, max_rounds: int = 64
) -> DataFrame:
    """Minimum spanning forest edges (igraph_minimum_spanning_tree,
    spanning_trees.c:78). Edge direction is ignored (the reference
    treats the graph as undirected for MST); weights default to 1.0,
    reproducing the unweighted variant (:123)."""
    edges = (
        graph.edges.select("src", "dst", "weight")
        .filter(F.col("src") != F.col("dst"))
        .localCheckpointFlat(eager=True)
    )
    spark = graph.spark

    comp = graph.vertices().select("id", F.col("id").alias("comp"))
    comp = comp.localCheckpointFlat(eager=True)
    chosen_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        cs = comp.select(F.col("id").alias("src"), F.col("comp").alias("ca"))
        cd = comp.select(F.col("id").alias("dst"), F.col("comp").alias("cb"))
        inter = (
            edges.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpointFlat(eager=True)
        )
        if inter.isEmpty():
            break
        # per-component lightest incident inter-edge, total-order tie-break
        both = inter.select(
            F.col("ca").alias("c"), "src", "dst", "weight", F.col("cb").alias("other")
        ).unionByName(
            inter.select(
                F.col("cb").alias("c"), "src", "dst", "weight",
                F.col("ca").alias("other"),
            )
        )
        pick = both.groupBy("c").agg(
            F.min(F.struct("weight", "src", "dst", "other")).alias("m")
        ).select(
            "c",
            F.col("m.weight").alias("weight"),
            F.col("m.src").alias("src"),
            F.col("m.dst").alias("dst"),
            F.col("m.other").alias("other"),
        ).localCheckpointFlat(eager=True)

        # forest edges: each picked original edge once (both sides may pick it)
        chosen_parts.append(
            pick.select("src", "dst", "weight").distinct()
        )

        # hooking: parent[c] = other; break mutual 2-cycles toward the
        # smaller label, then collapse by pointer jumping
        peer = pick.select(F.col("c").alias("other"), F.col("other").alias("peer"))
        parent = (
            pick.select("c", "other")
            .join(peer, "other", "left")
            .select(
                "c",
                F.when(
                    (F.col("peer") == F.col("c")) & (F.col("c") < F.col("other")),
                    F.col("c"),
                )
                .otherwise(F.col("other"))
                .alias("p"),
            )
            .localCheckpointFlat(eager=True)
        )
        while True:
            gp = parent.select(F.col("c").alias("p"), F.col("p").alias("g"))
            jumped = (
                parent.join(gp, "p", "left")
                .select("c", F.coalesce("g", "p").alias("p"))
                .localCheckpointFlat(eager=True)
            )
            changed = (
                jumped.join(parent.withColumnRenamed("p", "p0"), "c")
                .filter(F.col("p") != F.col("p0"))
                .isEmpty()
            )
            parent = jumped
            if changed:
                break
        root = parent.withColumnRenamed("c", "comp").withColumnRenamed("p", "newc")
        comp = (
            comp.join(root, "comp", "left")
            .select("id", F.coalesce("newc", "comp").alias("comp"))
            .localCheckpointFlat(eager=True)
        )
    else:
        raise RuntimeError(f"Boruvka did not converge in {max_rounds} rounds")

    if not chosen_parts:
        return spark.createDataFrame([], "src long, dst long, weight double")
    out = chosen_parts[0]
    for df in chosen_parts[1:]:
        out = out.unionByName(df)
    return out


def mst_total_weight(graph: LinkGraph) -> float:
    """Total weight of the minimum spanning forest — the value every
    MST of the graph shares."""
    row = minimum_spanning_tree(graph).agg(F.sum("weight").alias("s")).first()
    return float(row["s"] or 0.0)
