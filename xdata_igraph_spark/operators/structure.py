"""Structural reshaping & census operators: k-hop neighborhoods, ANND,
dyad census, line graph, vertex permutation.

All are pure relational compositions (joins + aggregates) of the edge
table — the operator family the reference implements as CSR walks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def _khop_reached(graph: LinkGraph, order: int, mode: str) -> DataFrame:
    """(id, nbr, dist) — every vertex ``nbr`` within ``order`` hops of
    ``id``, with dist = the FIRST hop at which nbr was seen (BFS
    layering), so each expansion round joins only the newest frontier,
    not the whole reached set."""
    if order < 0:
        raise ValueError("order must be >= 0")
    adj = (
        graph.adjacency(mode)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    verts = graph.vertices()
    reached = verts.select(
        F.col("id"), F.col("id").alias("nbr"), F.lit(0).alias("dist")
    ).localCheckpointFlat(eager=True)
    frontier = reached
    for k in range(1, order + 1):
        nxt = (
            frontier.select("id", F.col("nbr").alias("src"))
            .join(adj, "src")
            .select("id", F.col("dst").alias("nbr"))
            .distinct()
            .join(reached.select("id", "nbr"), ["id", "nbr"], "left_anti")
            .withColumn("dist", F.lit(k))
            .localCheckpointFlat(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpointFlat(eager=True)
        frontier = nxt
    return reached


def neighborhood_size(
    graph: LinkGraph, order: int = 1, mode: str = "all", mindist: int = 0
) -> DataFrame:
    """Vertices within ``order`` hops → (id, size)
    (igraph_neighborhood_size, /root/reference/src/
    structural_properties.c:2806): counts vertices at distance
    mindist..order from each vertex (the vertex itself included when
    mindist=0)."""
    reached = _khop_reached(graph, order, mode)
    counted = (
        reached.filter(F.col("dist") >= mindist)
        .groupBy("id")
        .agg(F.count("*").alias("size"))
    )
    return graph.vertices().join(counted, "id", "left").select(
        "id", F.coalesce("size", F.lit(0)).cast("long").alias("size")
    )


def neighborhood(
    graph: LinkGraph, order: int = 1, mode: str = "all", mindist: int = 0
) -> DataFrame:
    """k-hop member lists → (id, members: array<long> ascending)
    (igraph_neighborhood, /root/reference/src/
    structural_properties.c:2928): the vertices at distance
    mindist..order from each vertex, the vertex itself first when
    mindist=0 (igraph lists the seed first; ascending sort puts the
    seed first too since every BFS stays within one id space — the
    array is canonical-sorted for order-insensitive comparison).

    Scale note: output rows = Σ|N_k(v)| — on small-world graphs this
    grows sharply with order; it is the same bound neighborhood_size
    pays, just with the members materialized.
    """
    reached = _khop_reached(graph, order, mode)
    members = (
        reached.filter(F.col("dist") >= mindist)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("nbr")).alias("members"))
    )
    return graph.vertices().join(members, "id", "left").select(
        "id",
        F.coalesce("members", F.array().cast("array<bigint>")).alias("members"),
    )


def neighborhood_graphs(
    graph: LinkGraph, order: int = 1, mode: str = "all", mindist: int = 0
) -> DataFrame:
    """Induced ego-subgraph edges → (ego, src, dst, weight)
    (igraph_neighborhood_graphs, /root/reference/src/
    structural_properties.c:3067): for each vertex, the edges of the
    subgraph induced by its mindist..order neighborhood (original
    vertex ids, original edge multiplicity/weights; the reference
    returns one igraph per vertex — the relational form keys the union
    of those graphs by ego).

    Plan: membership set M = (ego, v), then edges ⋈ M on src ⋈ M on
    dst for the same ego — output ∝ Σ|E(N_k(v))|, the inherent
    ego-graph volume."""
    reached = _khop_reached(graph, order, mode).filter(F.col("dist") >= mindist)
    m_src = reached.select(F.col("id").alias("ego"), F.col("nbr").alias("src"))
    m_dst = reached.select(F.col("id").alias("ego"), F.col("nbr").alias("dst"))
    return (
        graph.edges.join(m_src, "src")
        .join(m_dst, ["ego", "dst"])
        .select("ego", "src", "dst", "weight")
    )


def avg_nearest_neighbor_degree(graph: LinkGraph) -> DataFrame:
    """ANND → (id, knn) (igraph_avg_nearest_neighbor_degree,
    /root/reference/src/structural_properties.c:5766): mean degree of
    each vertex's neighbors, ALL-mode degrees, loops excluded. Isolated
    vertices get NULL (the reference returns NaN)."""
    adj = (
        graph.adjacency("all")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
    )
    deg = graph.degrees("all", loops=False)
    nbr_deg = adj.join(
        deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "nbr_degree"),
        "dst",
    )
    knn = nbr_deg.groupBy(F.col("src").alias("id")).agg(
        F.avg("nbr_degree").alias("knn")
    )
    return graph.vertices().join(knn, "id", "left").select("id", "knn")


def diversity(graph: LinkGraph) -> DataFrame:
    """(id, diversity) — structural diversity index: the normalized
    Shannon entropy of each vertex's incident edge weights
    (igraph_diversity, /root/reference/src/structural_properties.c:6455
    — Eagle, Macy & Claxton, Science 328, 2010).

    D(i) = (ln s_i − (Σ_e w_e ln w_e) / s_i) / ln k_i, where the sum
    runs over i's incident edges, s_i is their weight sum and k_i the
    ALL-mode degree. The reference's exact expression is reproduced,
    including its edge cases: k=0 (isolated) and k=1 (leaf) yield NaN
    (0/0 in the C), and a loop contributes both of its endpoints (the
    degree-ALL convention). One union + one aggregate — no iteration,
    no Python; scales as a map-side-combinable groupBy on vertex id.
    """
    e = graph.edges
    incid = e.select(F.col("src").alias("id"), "weight").unionAll(
        e.select(F.col("dst").alias("id"), "weight")
    )
    stats = incid.groupBy("id").agg(
        F.count("*").alias("_k"),
        F.sum("weight").alias("_s"),
        F.sum(F.col("weight") * F.log("weight")).alias("_ent"),
    )
    nan = F.lit(float("nan"))
    return (
        graph.vertices()
        .join(stats, "id", "left")
        .select(
            "id",
            F.when(
                F.col("_k") >= 2,
                (F.log("_s") - F.col("_ent") / F.col("_s")) / F.log("_k"),
            )
            .otherwise(nan)
            .alias("diversity"),
        )
    )


def get_laplacian(graph: LinkGraph, normalized: bool = False) -> DataFrame:
    """Graph Laplacian as distributed sparse triples (row, col, value)
    (igraph_laplacian, /root/reference/src/spectral_properties.c:272,
    weighted form :30).

    Matches the C exactly, with ``weight`` playing the weights vector
    (all-1.0 defaults reproduce the unweighted form): the degree is the
    non-loop OUT-strength (undirected = total strength); unnormalized
    L = D − A with parallel-edge weights accumulating; normalized is
    the C's random-walk/symmetric split — directed: diag 1 (0 for
    isolated), off-diag −w/d(from); undirected: diag 1/0, off-diag
    −w/√(d_from·d_to), both orientations emitted. Loops are ignored
    everywhere (the C skips from==to). One aggregate + one broadcast-
    able degree join — the sparse output stays a DataFrame; a dense
    matrix at test scale is one pivot away (get_adjacency's guard
    applies)."""
    e = graph.edges.filter(F.col("src") != F.col("dst"))
    if not graph.directed:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    # after symmetrization, OUT-strength == the C's degree in both modes
    deg = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("_d"))
    deg = graph.vertices().join(deg, "id", "left").select(
        "id", F.coalesce("_d", F.lit(0.0)).alias("_d")
    )
    offdiag = e.groupBy("src", "dst").agg(F.sum("weight").alias("_w"))
    if not normalized:
        diag = deg.select(
            F.col("id").alias("row"), F.col("id").alias("col"), F.col("_d").alias("value")
        )
        off = offdiag.select(
            F.col("src").alias("row"), F.col("dst").alias("col"), (-F.col("_w")).alias("value")
        )
        return diag.unionByName(off)
    diag = deg.select(
        F.col("id").alias("row"),
        F.col("id").alias("col"),
        F.when(F.col("_d") > 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("value"),
    )
    dl = deg.withColumnRenamed("id", "src").withColumnRenamed("_d", "_df")
    if graph.directed:
        off = offdiag.join(dl, "src").select(
            F.col("src").alias("row"),
            F.col("dst").alias("col"),
            (-F.col("_w") / F.col("_df")).alias("value"),
        )
    else:
        dr = deg.withColumnRenamed("id", "dst").withColumnRenamed("_d", "_dt")
        off = (
            offdiag.join(dl, "src")
            .join(dr, "dst")
            .select(
                F.col("src").alias("row"),
                F.col("dst").alias("col"),
                (-F.col("_w") / F.sqrt(F.col("_df") * F.col("_dt"))).alias("value"),
            )
        )
    return diag.unionByName(off)


def convergence_degree(
    graph: LinkGraph, sources: DataFrame | None = None
) -> DataFrame:
    """(src, dst, ins, outs, convergence) — per-edge convergence degree
    (igraph_convergence_degree,
    /root/reference/src/structural_properties.c:4011, an XDATA-era
    extension): ins(e) counts the BFS roots from which e lies on a
    shortest path into its head ("input field"), outs(e) the roots of
    the reverse BFS ("output field"); convergence =
    (ins − outs)/(ins + outs), NaN when the edge lies on no geodesic
    (the reference's 0/0).

    Directed (the C's two-pass loop): ins(e=(u,v)) = |{s : d(s,u)+1 =
    d(s,v)}|, outs(e) = |{t : d(v,t)+1 = d(u,t)}|. Undirected (the C's
    actnode<neighbor split): the tight direction low→high counts into
    ins, high→low into outs.

    Plan: the same all-sources BFS table the closeness/path-hist
    family uses — (source, id, dist) — then ONE tight-edge equi-join
    per field; no per-root Python. Exact over all roots by default
    (O(n·reached) state, test-scale like the reference's O(V·E));
    pass ``sources`` (a 1-column DataFrame) to pivot-sample roots —
    the betweenness-style 100-TB path — where ins/outs become sampled
    field sizes and the ratio stays an unbiased estimate."""
    from xdata_igraph_spark.operators.paths import shortest_paths

    # one row per distinct arc; loops are dropped (never on a geodesic
    # — the reference reports 0/0 = NaN for them), parallel edges share
    # their pair's row rather than repeating it per edge id
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if graph.directed:
        d_out = shortest_paths(graph, sources=sources, mode="out")
        d_in = shortest_paths(graph, sources=sources, mode="in")
        ins = (
            e.join(
                d_out.select("source", F.col("id").alias("src"), F.col("dist").alias("_du")),
                "src",
            )
            .join(
                d_out.select("source", F.col("id").alias("dst"), F.col("dist").alias("_dv")),
                ["source", "dst"],
            )
            .filter(F.col("_du") + 1 == F.col("_dv"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("ins"))
        )
        outs = (
            e.join(
                d_in.select("source", F.col("id").alias("dst"), F.col("dist").alias("_dv")),
                "dst",
            )
            .join(
                d_in.select("source", F.col("id").alias("src"), F.col("dist").alias("_du")),
                ["source", "src"],
            )
            .filter(F.col("_dv") + 1 == F.col("_du"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("outs"))
        )
        keyed = e
    else:
        d_all = shortest_paths(graph, sources=sources, mode="all")
        keyed = (
            e.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .distinct()
        )
        lo = d_all.select("source", F.col("id").alias("src"), F.col("dist").alias("_dl"))
        hi = d_all.select("source", F.col("id").alias("dst"), F.col("dist").alias("_dh"))
        both = keyed.join(lo, "src").join(hi, ["source", "dst"])
        ins = (
            both.filter(F.col("_dl") + 1 == F.col("_dh"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("ins"))
        )
        outs = (
            both.filter(F.col("_dh") + 1 == F.col("_dl"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("outs"))
        )
    nan = F.lit(float("nan"))
    return (
        keyed.join(ins, ["src", "dst"], "left")
        .join(outs, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.coalesce("ins", F.lit(0)).alias("ins"),
            F.coalesce("outs", F.lit(0)).alias("outs"),
        )
        .select(
            "src",
            "dst",
            "ins",
            "outs",
            F.when(
                F.col("ins") + F.col("outs") > 0,
                (F.col("ins") - F.col("outs"))
                / (F.col("ins") + F.col("outs")),
            )
            .otherwise(nan)
            .alias("convergence"),
        )
    )


def dyad_census(graph: LinkGraph) -> tuple[int, int, int]:
    """(mutual, asymmetric, null) unordered vertex-pair counts
    (igraph_dyad_census, /root/reference/src/motifs.c:818). Loops
    ignored; requires a directed graph like the reference (undirected
    graphs have only mutual/null dyads)."""
    n = graph.vcount()
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pairs = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    counts = pairs.groupBy("a", "b").agg(F.count("*").alias("arcs"))
    row = counts.agg(
        F.sum(F.when(F.col("arcs") == 2, 1).otherwise(0)).alias("mut"),
        F.sum(F.when(F.col("arcs") == 1, 1).otherwise(0)).alias("asym"),
    ).first()
    mut = int(row["mut"] or 0)
    asym = int(row["asym"] or 0)
    null = n * (n - 1) // 2 - mut - asym
    return mut, asym, null


def linegraph(graph: LinkGraph) -> DataFrame:
    """Line graph edges → (src, dst) over edge ids
    (igraph_linegraph, /root/reference/src/structural_properties.c:
    3930-4040). Edge ids are minted as the row order of the edge table
    (the reference's edge ids are positions in the edge columns).

    Directed: edge a=(u,v) connects to edge b=(v,w) — a's head is b's
    tail (self-pair a→a excluded only when a isn't a loop-to-itself
    composition, matching the reference which includes loops' self
    adjacency; we exclude a==b for simple graphs).
    Undirected: two edges are adjacent iff they share an endpoint.

    Edge ids are minted with the range-partition + prefix-offset plan
    (plans/ids.py) — the edge table never funnels through one
    partition.
    """
    from xdata_igraph_spark.plans.ids import zip_dense_ids

    e = zip_dense_ids(
        graph.edges.select("src", "dst"), ["src", "dst"], out_col="eid"
    )
    if graph.directed:
        a = e.select(F.col("eid").alias("src"), F.col("dst").alias("mid"))
        b = e.select(F.col("eid").alias("dst"), F.col("src").alias("mid"))
        out = a.join(b, "mid").select("src", "dst").filter(F.col("src") != F.col("dst"))
        return out
    ends = e.select("eid", F.explode(F.array("src", "dst")).alias("v")).distinct()
    pairs = (
        ends.alias("x")
        .join(ends.alias("y"), "v")
        .select(F.col("x.eid").alias("src"), F.col("y.eid").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    return pairs


def permute_vertices(graph: LinkGraph, mapping: DataFrame) -> LinkGraph:
    """Relabel vertex ids via a (id, new_id) table
    (igraph_permute_vertices, /root/reference/src/topology.c:2690).
    The mapping must be a bijection over the vertex set."""
    m_src = mapping.select(F.col("id").alias("src"), F.col("new_id").alias("nsrc"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("ndst"))
    e = (
        graph.edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(
            F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "weight"
        )
    )
    if graph._n is not None:
        return LinkGraph(e, directed=graph.directed, n=graph._n)
    # carry the permuted vertex set — deriving it from edges would drop
    # isolated vertices (they exist in the reference's permutation too)
    verts = (
        graph.vertices()
        .join(mapping, "id")
        .select(F.col("new_id").alias("id"))
    )
    return LinkGraph(e, directed=graph.directed, vertices=verts)


TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _triad_class():
    """Column expression: Davis-Leinhardt class index (0..15) of a
    sorted triple (x<y<z) from its six arc flags ``xy_f`` (x→y),
    ``xy_b`` (y→x), ``xz_f``, ``xz_b``, ``yz_f``, ``yz_b``
    (igraph_triad_census order, /root/reference/src/motifs.c:976-1040).
    """
    def typ(fwd, bwd):
        return F.col(fwd).cast("int") + F.col(bwd).cast("int")

    t_xy, t_xz, t_yz = typ("xy_f", "xy_b"), typ("xz_f", "xz_b"), typ("yz_f", "yz_b")
    m = (t_xy == 2).cast("int") + (t_xz == 2).cast("int") + (t_yz == 2).cast("int")
    a = (t_xy == 1).cast("int") + (t_xz == 1).cast("int") + (t_yz == 1).cast("int")

    # out-degree of each triple member over the asymmetric arcs only
    def asym(fwd, bwd):
        return (F.col(fwd) & ~F.col(bwd)).cast("int")

    out_x = asym("xy_f", "xy_b") + asym("xz_f", "xz_b")
    out_y = asym("xy_b", "xy_f") + asym("yz_f", "yz_b")
    out_z = asym("xz_b", "xz_f") + asym("yz_b", "yz_f")
    in_x = asym("xy_b", "xy_f") + asym("xz_b", "xz_f")
    in_y = asym("xy_f", "xy_b") + asym("yz_b", "yz_f")
    in_z = asym("xz_f", "xz_b") + asym("yz_f", "yz_b")

    # vertex roles relative to the mutual pair (for 111/120): which
    # pair is mutual → the "third" vertex is the one not in it
    third_out = F.when(t_xy == 2, out_z).when(t_xz == 2, out_y).otherwise(out_x)
    third_in = F.when(t_xy == 2, in_z).when(t_xz == 2, in_y).otherwise(in_x)

    return (
        F.when((m == 0) & (a == 0), F.lit(0))                      # 003
        .when((m == 0) & (a == 1), F.lit(1))                       # 012
        .when((m == 1) & (a == 0), F.lit(2))                       # 102
        .when(
            (m == 0) & (a == 2),
            # two asym arcs: common tail → 021D, common head → 021U,
            # else chain → 021C
            F.when(
                (out_x == 2) | (out_y == 2) | (out_z == 2), F.lit(3)
            ).when((in_x == 2) | (in_y == 2) | (in_z == 2), F.lit(4)).otherwise(F.lit(5)),
        )
        .when(
            (m == 1) & (a == 1),
            # arc from the third vertex INTO the dyad → 111D, out → 111U
            F.when(third_out == 1, F.lit(6)).otherwise(F.lit(7)),
        )
        .when(
            (m == 0) & (a == 3),
            # 3-cycle iff every vertex has asym out-degree exactly 1
            F.when((out_x == 1) & (out_y == 1) & (out_z == 1), F.lit(9)).otherwise(
                F.lit(8)
            ),                                                     # 030C / 030T
        )
        .when((m == 2) & (a == 0), F.lit(10))                      # 201
        .when(
            (m == 1) & (a == 2),
            # 120D = A<-B->C plus A<->C: both asym arcs LEAVE the third
            # vertex (its asym in-degree is 0); 120U = both ENTER it
            # (asym out-degree 0); one each → 120C
            F.when(third_in == 0, F.lit(11))
            .when(third_out == 0, F.lit(12))
            .otherwise(F.lit(13)),
        )
        .when((m == 2) & (a == 1), F.lit(14))                      # 210
        .otherwise(F.lit(15))                                      # 300
    )


def triad_census(graph: LinkGraph) -> DataFrame:
    """Davis-Leinhardt triad census → (triad: string, count: long),
    16 rows in igraph's order (igraph_triad_census,
    /root/reference/src/motifs.c:976-1100). Directed graphs only, like
    the reference (it warns on undirected input); loops and multi-arcs
    ignored.

    Relational Batagelj–Mrvar plan: enumerate only triples with ≥ 2
    connected pairs (connected pair × neighbor-of-either-endpoint,
    deduped on the sorted triple), classify each via its six arc flags;
    the single-arc classes come analytically — 012 = A·(n−2) − Σ asym
    pairs over enumerated triples, 102 = M·(n−2) − Σ mutual pairs,
    003 = C(n,3) − everything else. Cost ∝ Σ_pairs (deg(a)+deg(b)),
    never n³.
    """
    if not graph.directed:
        import warnings

        warnings.warn("triad census called on an undirected graph (igraph warns too)")
    spark = graph.spark
    n = graph.vcount()
    arcs = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointFlat(eager=True)
    )
    # unordered connected pairs with both arc flags (fwd = low → high)
    pairs = (
        arcs.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("is_f"),
        )
        .groupBy("a", "b")
        .agg(
            F.max(F.col("is_f")).alias("f"),
            F.max(~F.col("is_f")).alias("bwd"),
        )
        .localCheckpointFlat(eager=True)
    )
    sym = (
        arcs.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(arcs.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    # triples with >= 2 connected pairs: pair + neighbor of either end
    cand_a = pairs.select("a", "b").join(
        sym.withColumnRenamed("u", "a").withColumnRenamed("v", "c"), "a"
    )
    cand_b = pairs.select("a", "b").join(
        sym.withColumnRenamed("u", "b").withColumnRenamed("v", "c"), "b"
    )
    triples = (
        cand_a.unionByName(cand_b.select("a", "b", "c"))
        .filter((F.col("c") != F.col("a")) & (F.col("c") != F.col("b")))
        .select(
            F.least("a", "b", "c").alias("x"),
            F.expr("array_sort(array(a, b, c))[1]").alias("y"),
            F.greatest("a", "b", "c").alias("z"),
        )
        .distinct()
    )

    def pair_flags(p1, p2, prefix):
        pr = pairs.select(
            F.col("a").alias(p1),
            F.col("b").alias(p2),
            F.col("f").alias(f"{prefix}_f"),
            F.col("bwd").alias(f"{prefix}_b"),
        )
        return pr

    flagged = (
        triples.join(pair_flags("x", "y", "xy"), ["x", "y"], "left")
        .join(pair_flags("x", "z", "xz"), ["x", "z"], "left")
        .join(pair_flags("y", "z", "yz"), ["y", "z"], "left")
        .na.fill(False)
    )
    # ONE pass over the (expensive) flagged triples: per-class counts
    # AND the asym/mutual pair incidences — r4's plan ran the whole
    # triple build twice (separate groupBy + agg actions on the same
    # unpersisted lineage)
    per_cls = (
        flagged.select(
            _triad_class().alias("cls"),
            (
                (F.col("xy_f") != F.col("xy_b")).cast("long")
                + (F.col("xz_f") != F.col("xz_b")).cast("long")
                + (F.col("yz_f") != F.col("yz_b")).cast("long")
            ).alias("asym_terms"),
            (
                (F.col("xy_f") & F.col("xy_b")).cast("long")
                + (F.col("xz_f") & F.col("xz_b")).cast("long")
                + (F.col("yz_f") & F.col("yz_b")).cast("long")
            ).alias("mut_terms"),
        )
        .groupBy("cls")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("asym_terms").alias("asym_inc"),
            F.sum("mut_terms").alias("mut_inc"),
        )
        .collect()
    )
    counted = {int(r["cls"]): int(r["cnt"]) for r in per_cls}
    asym_inc = sum(int(r["asym_inc"] or 0) for r in per_cls)
    mut_inc = sum(int(r["mut_inc"] or 0) for r in per_cls)
    # analytic classes from the pair census
    prow = pairs.agg(
        F.sum(F.when(F.col("f") & F.col("bwd"), 1).otherwise(0)).alias("M"),
        F.sum(F.when(F.col("f") != F.col("bwd"), 1).otherwise(0)).alias("A"),
    ).first()
    M, A = int(prow["M"] or 0), int(prow["A"] or 0)
    counts = [0] * 16
    for k, v in counted.items():
        counts[k] = v
    counts[1] = A * (n - 2) - asym_inc
    counts[2] = M * (n - 2) - mut_inc
    counts[0] = n * (n - 1) * (n - 2) // 6 - sum(counts[1:])
    return spark.createDataFrame(
        [(TRIAD_NAMES[i], counts[i]) for i in range(16)], "triad string, count long"
    )
