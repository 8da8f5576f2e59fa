"""Batched random walks — DeepWalk/node2vec-style corpus sampling.

Not in the reference's API surface (its walk machinery is internal to
walktrap, /root/reference/src/walktrap_communities.cpp); exposed here
as a training-data pipeline operator: random-walk corpora are the
standard input for skip-gram graph embeddings (DeepWalk, KDD'14;
node2vec, KDD'16), and sampling them is exactly the kind of job a
100-TB link graph needs to run distributed.

Scale shape: ALL walks advance together in one (walk_id, cur) state
DataFrame — a step is one join against the indexed neighbor table.
The unweighted path picks the i-th neighbor by a per-(walk, step)
xxhash64 index, so each step joins on (src, rank) equality — no
fan-out, no RNG state, bit-identical on any cluster size. The
weighted path joins the full neighbor list of each frontier vertex
and range-filters on cumulative weight (fan-out = frontier degree
sum; documented cost of weighted sampling without alias tables).

Dead ends (out-degree 0 in directed graphs) terminate a walk early,
like every walk sampler; finished walks simply leave the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _neighbor_index(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """(nbr, deg): neighbor table with a dense per-source rank, plus
    out-degrees. Undirected graphs walk the symmetrized arcs."""
    arcs = graph.edges if graph.directed else graph.symmetrized()
    arcs = arcs.select("src", "dst", "weight")
    w = Window.partitionBy("src").orderBy("dst", "weight")
    nbr = arcs.select(
        "src", "dst", "weight",
        (F.row_number().over(w) - 1).alias("rank"),
        (F.sum("weight").over(w)).alias("cumw"),
    )
    deg = nbr.groupBy("src").agg(
        F.count("*").alias("deg"), F.sum("weight").alias("totw")
    )
    return nbr, deg


def random_walks(
    graph: LinkGraph,
    length: int = 10,
    n_per_start: int = 1,
    starts: DataFrame | None = None,
    weighted: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Sample ``n_per_start`` walks of ``length`` steps from every
    start vertex (default: all vertices) → ``(walk_id, step, vertex)``
    with step 0 = the start. Deterministic per seed.

    ``weighted=True`` draws each step proportionally to edge weight
    (cumulative-weight range filter); the default uniform path is the
    rank-equality join fast path.
    """
    if length < 0 or n_per_start < 1:
        raise ValueError("length must be >= 0 and n_per_start >= 1")
    nbr, deg = _neighbor_index(graph)
    nbr = nbr.localCheckpointFlat(eager=True)
    deg = deg.localCheckpointFlat(eager=True)

    if starts is None:
        starts = graph.vertices()
    reps = F.explode(F.array(*[F.lit(k) for k in range(n_per_start)])).alias("rep")
    state = starts.select(F.col("id"), reps).select(
        (F.col("id") * n_per_start + F.col("rep")).alias("walk_id"),
        F.col("id").alias("cur"),
    )
    state = state.localCheckpointFlat(eager=True)
    # per-step levels collect in a Python list and union ONCE at the
    # end (cliques.py/mst.py pattern): each level is already a severed
    # checkpoint via `state`, so re-checkpointing the growing union
    # every step would materialize O(length^2) rows
    levels = [
        state.select(
            "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
        )
    ]

    for t in range(1, length + 1):
        coin = F.pmod(
            F.xxhash64(F.col("walk_id"), F.lit(t), F.lit(seed)), F.lit(1_000_000_000)
        )
        if weighted:
            r = (coin / 1_000_000_000.0) * F.col("totw")
            nxt = (
                state.join(deg.select(F.col("src").alias("cur"), "totw"), "cur")
                .join(
                    nbr.select(
                        F.col("src").alias("cur"), "dst", "weight", "cumw"
                    ),
                    "cur",
                )
                .filter(
                    (F.col("cumw") - F.col("weight") <= r) & (r < F.col("cumw"))
                )
                .select("walk_id", F.col("dst").alias("cur"))
            )
        else:
            idx = F.pmod(coin, F.col("deg"))
            nxt = (
                state.join(deg.select(F.col("src").alias("cur"), "deg"), "cur")
                .select("walk_id", F.col("cur"), idx.alias("rank"))
                .join(
                    nbr.select(F.col("src").alias("cur"), "dst", "rank"),
                    ["cur", "rank"],
                )
                .select("walk_id", F.col("dst").alias("cur"))
            )
        state = nxt.localCheckpointFlat(eager=True)
        levels.append(
            state.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def walk_sentences(walks: DataFrame) -> DataFrame:
    """Collapse a walk table into skip-gram-ready sentences
    ``(walk_id, sentence: array<long>)`` ordered by step."""
    return walks.groupBy("walk_id").agg(
        F.array_sort(
            F.collect_list(F.struct("step", "vertex"))
        ).alias("sv")
    ).select(
        "walk_id", F.transform("sv", lambda s: s["vertex"]).alias("sentence")
    )
