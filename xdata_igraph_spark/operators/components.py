"""Connected components — WCC (min-label propagation) and SCC
(trim + forward-coloring + backward-reach).

Reference semantics:
- WCC: igraph_clusters_weak (/root/reference/src/components.c:88-161)
  BFS-scans vertices in increasing id order and numbers components
  0,1,2,… in scan order — equivalently, **component id = rank of the
  component's minimum vertex id**. The distributed algorithm below
  computes the min vertex id per component directly (label = smallest
  id seen), then densifies, so the numbering is bit-identical to the
  reference's.
- SCC: igraph_clusters_strong (/root/reference/src/components.c:
  163-273) is Kosaraju DFS whose numbering depends on sequential DFS
  tie-breaking; the *partition* is unique, the numbering is
  presentation. We return the canonical numbering (rank of min member
  id) — tests compare the reference's output after the same canonical
  relabel (contract documented in SURVEY.md §5).

Scale design:
- WCC label propagation converges in O(diameter) supersteps (a web
  graph's WCC diameter is small); each superstep is one edge-size join
  + vertex-size aggregate, with the symmetrized edge table shuffled
  once, cached, and reused;
- convergence is detected from the same aggregate that computes the
  new labels (count of changed labels — one scalar action/superstep);
- SCC does iterative trimming first (resolves all chain-shaped SCC
  DAGs in one peeling loop) and only colors what remains — the
  standard FW-BW-Trim decomposition for distributed SCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def _densify_by_min_id(labels: DataFrame, label_col: str = "label") -> DataFrame:
    """(id, label=min-member-id) → (id, component) with components
    numbered 0.. by ascending min member id — igraph's WCC numbering
    (/root/reference/src/components.c:119-145).

    The rank runs over the distinct-label table only — but on a crawl
    graph even the component COUNT is huge (singleton tail), so it uses
    the range-partition + prefix-offset plan (plans/ids.py), not a
    global window, and the join back is a plain hash join (AQE
    broadcasts it when the label table is actually small).
    """
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    comps = labels.select(label_col).distinct()
    ranked = zip_dense_ids(comps, [label_col], out_col="component")
    return labels.join(ranked, label_col).select("id", "component")


def wcc(
    graph: LinkGraph,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    runner: SuperstepRunner | None = None,
    bucket_edges: bool = False,
) -> DataFrame:
    """Weakly connected components → (id: long, component: long).

    ``bucket_edges``: write the symmetrized edge table bucketed+sorted
    (plans/layout.py) so supersteps join it exchange-free; worth it on
    large graphs / high-diameter label propagation."""
    spark = graph.spark
    runner = runner or SuperstepRunner(
        spark,
        "wcc",
        checkpoint_dir=checkpoint_dir,
        fingerprint=f"wcc|n={graph._n}|directed={graph.directed}",
    )
    # localCheckpoint: materialize AND cut the ingest lineage so each
    # superstep plans over a LogicalRDD, not the full upstream tree.
    # Stock (non-severed) checkpoint: it PRESERVES the src hash
    # partitioning, so no superstep re-exchanges the edge table (the
    # severed wrap drops partitioning and would cost an edge-size
    # exchange EVERY superstep — r6 traced the 4x run-to-run wcc
    # variance to exactly this, the global flat-every-3rd counter
    # deciding the edge table's layout by luck of the draw).
    # canonical-pair build: ONE scan + ONE distinct (the old
    # symmetrize-then-distinct unioned two scans of the edge lineage
    # and deduped the doubled row set); (hi, lo) ∪ (lo, hi) with
    # hi != lo can contain no duplicates, so no second distinct
    canon = (
        graph.edges_cached().select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    with runner.loop_conf():
        # loop partitions from the measured edge count (see pagerank)
        runner.tune_loop_partitions(graph.ecount())
        if bucket_edges:
            from xdata_igraph_spark.plans.layout import bucketize

            sym = bucketize(sym, ["src"], name="wcc_sym")
        else:
            n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            # partition AND sort once: supersteps then stream the edge
            # side of the sort-merge join with no per-superstep sort
            # (see pagerank's contrib checkpoint)
            sym = (
                sym.repartition(n_parts, "src")
                .sortWithinPartitions("src")
                .localCheckpoint(eager=True)
            )
    resumed = runner.resume()
    if resumed is not None:
        labels, start = resumed
    else:
        labels = graph.vertices().withColumn("label", F.col("id"))
        start = 0

    with runner.loop_conf():
        for it in range(start, max_iter):
            msgs = (
                labels.select(F.col("id").alias("src"), "label")
                .join(sym, "src")
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_min"))
            )
            new_labels = labels.join(msgs, labels.id == msgs.dst, "left").select(
                "id",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
            )
            new_labels = runner.materialize(new_labels, it)
            changed = new_labels.filter(F.col("label") != F.col("_old")).count()
            runner.finish_iteration(it, float(changed))
            labels = new_labels.drop("_old")
            if changed == 0:
                labels = runner.finalize(labels, it, 0.0)
                break
        else:
            import warnings

            warnings.warn(
                f"wcc did not reach fixpoint within max_iter={max_iter} "
                f"({changed} labels still changing); components may be split — "
                "raise max_iter",
                RuntimeWarning,
            )

        # densify inside the same conf scope: its shapes are as fixed
        # as the loop's (range-partition rank + two hash joins)
        return _densify_by_min_id(labels)


def component_sizes(membership: DataFrame) -> DataFrame:
    """csize analogue: (component, csize)."""
    return membership.groupBy("component").agg(F.count("*").alias("csize"))


def is_connected(graph: LinkGraph, mode: str = "weak") -> bool:
    """igraph_is_connected (/root/reference/src/components.c:300-340)."""
    m = wcc(graph) if mode == "weak" else scc(graph)
    return m.select("component").distinct().count() <= 1


def _min_propagate(
    labels: DataFrame,
    edges: DataFrame,
    runner: SuperstepRunner,
    phase: str,
    max_iter: int = 200,
) -> DataFrame:
    """Propagate min ``label`` along directed edges src→dst to fixpoint."""
    with runner.loop_conf():
        for it in range(max_iter):
            msgs = (
                labels.select(F.col("id").alias("src"), "label")
                .join(edges, "src")
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_min"))
            )
            new_labels = labels.join(msgs, labels.id == msgs.dst, "left").select(
                "id",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
            )
            new_labels = runner.materialize(new_labels, it)
            changed = new_labels.filter(F.col("label") != F.col("_old")).count()
            runner.finish_iteration(it, float(changed), extra={"phase": phase})
            labels = new_labels.drop("_old")
            if changed == 0:
                break
    return labels


def scc(
    graph: LinkGraph,
    max_rounds: int = 50,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Strongly connected components → (id, component), canonical
    numbering (rank of min member id).

    Algorithm: FW-Trim-coloring —
    1. *trim*: peel vertices with zero in- or out-degree within the
       active subgraph (each is its own singleton SCC); resolves any
       DAG-shaped remainder without coloring rounds;
    2. *color*: propagate min vertex id along forward edges to
       fixpoint; a vertex whose color equals its own id is a root;
    3. *backward reach*: from each root, follow reverse edges
       restricted to its color class; everything reached is that
       root's SCC; remove and repeat.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "scc")
    if not graph.directed:
        return wcc(graph)

    active_e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    active_v = graph.vertices().localCheckpointFlat(eager=True)
    assigned_parts: list[DataFrame] = []

    for _round in range(max_rounds):
        # --- trim loop: in-degree-0 / out-degree-0 peeling ---
        while True:
            srcs = active_e.select(F.col("src").alias("id")).distinct()
            dsts = active_e.select(F.col("dst").alias("id")).distinct()
            trivial = active_v.join(srcs, "id", "left_anti").unionByName(
                active_v.join(dsts, "id", "left_anti")
            ).distinct()
            trivial = trivial.localCheckpointFlat(eager=True)
            n_triv = trivial.count()
            if n_triv == 0:
                break
            # localCheckpoint the part: the `id AS label` alias otherwise
            # carries an equality constraint that trips Catalyst's
            # Union.rewriteConstraints when the parts are unioned later
            assigned_parts.append(
                trivial.select("id", F.col("id").alias("label")).localCheckpointFlat(True)
            )
            active_v = active_v.join(trivial, "id", "left_anti").localCheckpointFlat(True)
            active_e = (
                active_e.join(trivial.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(trivial.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .select("src", "dst")
                .localCheckpointFlat(True)
            )
        if active_v.count() == 0:
            break

        # --- forward coloring: min id along out-edges ---
        colors = _min_propagate(
            active_v.withColumn("label", F.col("id")), active_e, runner, "color"
        ).withColumnRenamed("label", "color")

        # --- backward reach from roots within color class ---
        rev = active_e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        # edge u→v in original == rev edge v→u; restrict both ends to same color
        csrc = colors.select(F.col("id").alias("src"), F.col("color").alias("c1"))
        cdst = colors.select(F.col("id").alias("dst"), F.col("color").alias("c2"))
        rev_same = (
            rev.join(csrc, "src").join(cdst, "dst").filter(F.col("c1") == F.col("c2"))
            .select("src", "dst")
            .localCheckpointFlat(True)
        )
        reached = (
            colors.filter(F.col("id") == F.col("color"))
            .select("id", F.col("color").alias("label"))
            .localCheckpointFlat(True)
        )
        frontier = reached
        for _bfs in range(200):
            nxt = (
                frontier.select(F.col("id").alias("src"), "label")
                .join(rev_same, "src")
                .select(F.col("dst").alias("id"), "label")
                .distinct()
                .join(reached, "id", "left_anti")
                .localCheckpointFlat(True)
            )
            if nxt.count() == 0:
                break
            reached = reached.unionByName(nxt).localCheckpointFlat(True)
            frontier = nxt
        assigned_parts.append(reached.localCheckpointFlat(True))
        active_v = active_v.join(reached, "id", "left_anti").localCheckpointFlat(True)
        active_e = (
            active_e.join(reached.select(F.col("id").alias("src")), "src", "left_anti")
            .join(reached.select(F.col("id").alias("dst")), "dst", "left_anti")
            .localCheckpointFlat(True)
        )

    if not assigned_parts:
        # empty graph: the reference returns an empty membership
        return spark.createDataFrame([], "id long, component long")
    labels = assigned_parts[0]
    for p in assigned_parts[1:]:
        labels = labels.unionByName(p)
    return _densify_by_min_id(labels)


def subcomponent(graph: LinkGraph, v: int, mode: str = "all") -> DataFrame:
    """Vertex set reachable from/to ``v`` → (id)
    (igraph_subcomponent, /root/reference/src/structural_properties.c:
    1349-1430): mode 'out' = reachable from v, 'in' = reaching v,
    'all' = weak component of v. A BFS of the existing multi-source
    machinery with one source."""
    from xdata_igraph_spark.operators.paths import shortest_paths

    return shortest_paths(graph, [int(v)], mode=mode).select("id")


def decompose(
    graph: LinkGraph,
    mode: str = "weak",
    maxcompno: int | None = None,
    minelements: int = 1,
) -> list[LinkGraph]:
    """Split into connected-component subgraphs (igraph_decompose,
    /root/reference/src/components.c:350-480): components ordered by
    canonical component id; ``maxcompno`` caps how many, ``minelements``
    drops small ones. Vertex ids keep their original values (the
    distributed contract; the reference renumbers each piece —
    renumber() densifies when needed).

    Returns a Python list of LinkGraphs, so the driver holds one row
    per *selected component* (fine for the reference's use: a handful
    of pieces), never per vertex."""
    membership = wcc(graph) if mode == "weak" else scc(graph)
    sizes = membership.groupBy("component").agg(F.count("*").alias("csize"))
    chosen = sizes.filter(F.col("csize") >= minelements).orderBy("component")
    if maxcompno is not None:
        chosen = chosen.limit(maxcompno)
    comp_ids = [int(r["component"]) for r in chosen.collect()]
    mem = membership.localCheckpointFlat(eager=True)
    out = []
    for c in comp_ids:
        vs = mem.filter(F.col("component") == c).select("id")
        out.append(graph.induced_subgraph(vs))
    return out


def is_bipartite(graph: LinkGraph) -> tuple[bool, DataFrame]:
    """(bipartite?, types (id, type)) — igraph_is_bipartite
    (/root/reference/src/bipartite.c): 2-color each component by BFS
    layer parity from its minimum-id vertex, then check that no edge
    (and no loop) joins two same-colored endpoints.

    Distributed plan: one WCC (component representatives), one
    multi-source BFS (each vertex is reached only by its own
    component's root, so all roots batch into a single loop), one
    edge-size conflict join — the same superstep shapes as WCC itself.
    The returned coloring is valid iff the graph is bipartite
    (the reference's `types` output contract).
    """
    from xdata_igraph_spark.operators.paths import shortest_paths

    spark = graph.spark
    comp = wcc(graph)
    roots = comp.groupBy("component").agg(F.min("id").alias("root")).select(
        F.col("root").alias("id")
    )
    dist = shortest_paths(graph, roots, mode="all")
    types = dist.select(
        "id", (F.col("dist").cast("long") % 2 == 1).alias("type")
    )
    e = graph.edges.select("src", "dst")
    loops = e.filter(F.col("src") == F.col("dst")).limit(1).count()
    if loops:
        return False, types
    ts = types.select(F.col("id").alias("src"), F.col("type").alias("tsrc"))
    td = types.select(F.col("id").alias("dst"), F.col("type").alias("tdst"))
    conflict = (
        e.join(ts, "src").join(td, "dst")
        .filter(F.col("tsrc") == F.col("tdst"))
        .limit(1)
        .count()
    )
    return conflict == 0, types
