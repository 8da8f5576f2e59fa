"""Label propagation communities — semi-synchronous, deterministic.

Reference: igraph_community_label_propagation
(/root/reference/src/community.c:2124-2340), Raghavan-Albert-Kumara.
The reference is *asynchronous*: it shuffles vertex order each sweep
(src/community.c:2245) and breaks dominant-label ties uniformly at
random (src/community.c:2300-2301) — inherently nondeterministic, and
its own tests assert only invariants or convergence-forced fixtures
(tests/community.at:64; interfaces/python/igraph/test/
decomposition.py:216-231).

Distributed variant implemented here (contract documented in
SURVEY.md §5): **synchronous sweeps with deterministic tie-breaking**
(smallest label among the dominant ones). Matched semantics:

- weights: a vertex adopts the label with the max total incident edge
  weight among labeled neighbors (unweighted = max count)
  (src/community.c:2250-2296);
- ``initial`` labels with negatives meaning *unlabeled* (NULL here),
  ``fixed`` vertices never update (src/community.c:2163-2232);
  unlabeled neighbors contribute nothing (src/community.c:2260-2282);
- directed graphs listen to IN-neighbors (src/community.c:2204-2210);
  undirected use both endpoints;
- post-processing renumbers labels 0..k-1 **in order of first
  appearance by vertex id** (src/community.c:2320-2340) — the step that
  makes the reference's "all converged to the fixed label" fixtures
  come out as all-zeros.

Synchronous LPA can 2-cycle on bipartite structures; the sweep cap
bounds it, and the update only fires when the dominant weight strictly
beats the current label's weight (damping that also matches the
reference's "keep running while not dominant" criterion).

Scale: one superstep = edge-size join + (dst,label)-keyed aggregate +
per-dst argmax via max_by — two shuffles of message-size data; the
symmetrized edge table is cached across sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.plans.superstep import SuperstepRunner


def label_propagation(
    graph: LinkGraph,
    initial: DataFrame | None = None,
    fixed: DataFrame | None = None,
    weighted: bool = True,
    max_sweeps: int = 50,
    runner: SuperstepRunner | None = None,
    bucket_edges: bool = False,
    damping: str = "none",
) -> DataFrame:
    """Communities → (id: long, label: long), labels dense 0..k-1 by
    first appearance in vertex-id order.

    ``initial``: (id, label) with label NULL or <0 meaning unlabeled.
    ``fixed``: (id) set of vertices whose label never changes.
    ``damping``: "none" = every vertex updates each sweep (classic
    synchronous LPA — can 2-cycle forever on bipartite structure);
    "half" = only a seeded-hash half of the vertices may CHANGE label
    per sweep, the split redrawn every other sweep (louvain.py's
    oscillation breaker) — bounded-sweep runs land on a meaningful
    labeling instead of a mid-oscillation snapshot. First-time label
    adoption (NULL → label) is never damped.
    """
    if damping not in ("none", "half"):
        raise ValueError(f"damping must be 'none' or 'half', got {damping!r}")
    spark = graph.spark
    runner = runner or SuperstepRunner(spark, "lpa")

    # messages flow from the neighbor TO the updating vertex; the
    # reference listens to IN-neighbors, so messages run along src→dst
    # for directed graphs and both ways for undirected.
    adj_all = graph.adjacency("out" if graph.directed else "all")
    if not weighted:
        adj_all = adj_all.withColumn("weight", F.lit(1.0))
    # materialize AND cut lineage (see pagerank.py). Stock checkpoint:
    # preserves the src hash partitioning, so the per-sweep join is
    # exchange-free on the edge side without the bucketed-table write
    # (the severed wrap would drop partitioning and re-exchange the
    # edge table every sweep — see wcc). Loops are filtered AFTER the
    # checkpoint so that, for endpoint-derived vertex sets, the vertex
    # table can also come from the cached rows — ONE scan of the
    # (possibly expensive) edge lineage per call instead of one per
    # derivation.
    with runner.loop_conf():
        # loop partitions from the measured edge count (see pagerank)
        runner.tune_loop_partitions(graph.ecount())
        if bucket_edges:
            from xdata_igraph_spark.plans.layout import bucketize

            adj_all = bucketize(adj_all, ["src"], name="lpa_adj")
        else:
            n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            # partition AND sort once so the per-sweep join streams the
            # edge side sort-free (see pagerank's contrib checkpoint)
            adj_all = (
                adj_all.repartition(n_parts, "src")
                .sortWithinPartitions("src")
                .localCheckpoint(eager=True)
            )
    adj = adj_all.filter(F.col("src") != F.col("dst"))
    if graph._n is None and graph._vertices is None:
        # endpoint-derived vertex set == distinct endpoints of the
        # cached adjacency (loops included, so loop-only vertices keep
        # their row exactly as graph.vertices() would give them)
        verts = (
            adj_all.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
        )
    else:
        verts = graph.vertices()
    if initial is not None:
        labels = verts.join(
            initial.select(
                "id",
                F.when(F.col("label") >= 0, F.col("label"))
                .otherwise(F.lit(None))
                .cast("long")
                .alias("label"),
            ),
            "id",
            "left",
        )
    else:
        labels = verts.withColumn("label", F.col("id"))
    if fixed is not None:
        labels = labels.join(
            fixed.select("id").withColumn("_fx", F.lit(True)), "id", "left"
        ).select("id", "label", F.coalesce("_fx", F.lit(False)).alias("fixed"))
    else:
        labels = labels.withColumn("fixed", F.lit(False))

    zero_streak = 0
    with runner.loop_conf():
        for sweep in range(max_sweeps):
            # neighbor label weight histogram per updating vertex
            # messages repartition by dst ONCE: hash(dst) clusters
            # (dst, nbr_label) too, so the histogram aggregate, the
            # per-dst fold below, AND the join with `cur` all reuse this
            # single exchange (the groupBy-planned exchange on
            # (dst, nbr_label) forced a SECOND dst exchange before the
            # cur join — 2 message-size exchanges per sweep instead of 1)
            hist = (
                labels.select(F.col("id").alias("src"), F.col("label").alias("nbr_label"))
                .filter(F.col("nbr_label").isNotNull())
                .join(adj, "src")
                .repartition("dst")
                .groupBy("dst", "nbr_label")
                .agg(F.sum("weight").alias("w"))
            )
            # attach the updating vertex's CURRENT label to its
            # histogram rows, then fold dominant label AND the current
            # label's own weight into ONE per-dst aggregate (r6: the
            # old plan ran a second hist-size join + filter just for
            # cur_w and joined the two back together — one histogram
            # exchange and one join fewer per sweep, same values:
            # sum(w | nbr_label == cur) is exactly the filtered row's
            # w, and NULL→0 when the current label got no votes).
            cur = labels.select(F.col("id").alias("dst"), F.col("label").alias("cur"))
            upd = (
                hist.join(cur, "dst")
                .groupBy("dst")
                .agg(
                    F.max_by(
                        F.col("nbr_label"), F.struct(F.col("w"), -F.col("nbr_label"))
                    ).alias("dom_label"),
                    F.max("w").alias("dom_w"),
                    F.sum(
                        F.when(F.col("nbr_label") == F.col("cur"), F.col("w"))
                    ).alias("cur_w"),
                )
                .select(
                    "dst",
                    "dom_label",
                    (F.col("dom_w") > F.coalesce("cur_w", F.lit(0.0))).alias("improves"),
                )
            )
            eligible = (
                F.lit(True)
                if damping == "none"
                else (
                    # half-split redrawn every other sweep; NULL-label
                    # vertices always adopt
                    (F.pmod(F.xxhash64(F.col("id"), F.lit(sweep // 2)), F.lit(2))
                     == F.lit(sweep % 2))
                    | F.col("label").isNull()
                )
            )
            new_labels = labels.join(upd, labels.id == upd.dst, "left").select(
                "id",
                "fixed",
                F.col("label").alias("_old"),
                F.when(
                    (~F.col("fixed"))
                    & F.col("dom_label").isNotNull()
                    & (F.col("improves") | F.col("label").isNull())
                    & eligible,
                    F.col("dom_label"),
                )
                .otherwise(F.col("label"))
                .alias("label"),
            )
            new_labels = runner.materialize(new_labels, sweep)
            changed = new_labels.filter(
                ~(
                    (F.col("label") == F.col("_old"))
                    | (F.col("label").isNull() & F.col("_old").isNull())
                )
            ).count()
            runner.finish_iteration(sweep, float(changed))
            labels = new_labels.drop("_old")
            if damping == "none":
                if changed == 0:
                    break
            else:
                # fixpoint only after a full SAME-SEED parity cycle with no
                # move (sweeps 2k/2k+1 share a hash draw; a quiet pair that
                # straddles two draws leaves ~25% of vertices untested)
                zero_streak = zero_streak + 1 if changed == 0 else 0
                if zero_streak >= 2 and sweep % 2 == 1:
                    break
        else:
            # synchronous LPA can 2-cycle on bipartite structures; hitting
            # the sweep cap is a documented stop, but say so (ADVICE r1)
            import warnings

            warnings.warn(
                f"label_propagation stopped at max_sweeps={max_sweeps} with "
                f"{changed} labels still changing (synchronous LPA may "
                "oscillate); result is the last sweep's labeling",
                RuntimeWarning,
            )

        # renumbering's eager steps (rank minting, counts) share the
        # loop's conf scope — fixed shapes, no AQE re-planning.
        # initial=None seeds every vertex with its own id and updates
        # never null a label, so the NULL-label scan is skipped
        return renumber_first_appearance(
            labels.select("id", "label"), may_have_nulls=initial is not None
        )


def renumber_first_appearance(
    labels: DataFrame, may_have_nulls: bool = True
) -> DataFrame:
    """Labels → 0..k-1 by first appearance in ascending vertex id
    (/root/reference/src/community.c:2320-2340). NULL labels (never
    labeled — isolated vertices) each become their own community,
    appended after, matching the reference's fresh-label assignment.

    Both rankings use the range-partition + prefix-offset plan
    (plans/ids.py): on a crawl graph the number of communities is
    itself huge, so even the distinct-label rank must not funnel
    through one partition.
    """
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    firsts = labels.filter(F.col("label").isNotNull()).groupBy("label").agg(
        F.min("id").alias("first_id")
    )
    ranked = zip_dense_ids(firsts, ["first_id"], out_col="new_label")
    labeled = labels.join(ranked.select("label", "new_label"), "label").select(
        "id", F.col("new_label").alias("label")
    )
    unlabeled = labels.filter(F.col("label").isNull()).select("id")
    if may_have_nulls and unlabeled.limit(1).count() > 0:
        # k (the rank count) is only needed to offset the fresh labels
        # of never-labeled vertices — skip the extra count job in the
        # common all-labeled case
        k = ranked.count()
        fresh = zip_dense_ids(unlabeled, ["id"], out_col="label", start=k)
        labeled = labeled.unionByName(fresh.select("id", "label"))
    return labeled


def modularity(
    graph: LinkGraph, membership: DataFrame, weighted: bool = True
) -> float:
    """Newman modularity of a partition (igraph_modularity,
    /root/reference/src/community.c:837-940).

    Q = Σ_c [ e_c/m − (d_c/(2m))² ] over communities c, with e_c the
    total weight of intra-community edges, d_c the total strength of
    the community's vertices, m the total edge weight. Directed graphs
    are treated as undirected (the reference ignores direction here).
    """
    e = graph.edges.filter(F.col("src") != F.col("dst"))
    if not weighted:
        e = e.withColumn("weight", F.lit(1.0))
    mem = membership.select("id", F.col(membership.columns[1]).alias("c"))
    m_tot = e.agg(F.sum("weight")).first()[0]
    if not m_tot:
        return float("nan")
    ej = (
        e.join(mem.withColumnRenamed("id", "src").withColumnRenamed("c", "c_src"), "src")
        .join(mem.withColumnRenamed("id", "dst").withColumnRenamed("c", "c_dst"), "dst")
    )
    intra = (
        ej.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy("c_src")
        .agg(F.sum("weight").alias("e_c"))
        .withColumnRenamed("c_src", "c")
    )
    strength = (
        ej.select(F.col("c_src").alias("c"), "weight")
        .unionByName(ej.select(F.col("c_dst").alias("c"), "weight"))
        .groupBy("c")
        .agg(F.sum("weight").alias("d_c"))
    )
    parts = strength.join(intra, "c", "left").select(
        (
            F.coalesce("e_c", F.lit(0.0)) / F.lit(float(m_tot))
            - (F.col("d_c") / (2.0 * float(m_tot))) ** 2
        ).alias("q")
    )
    return float(parts.agg(F.sum("q")).first()[0])
