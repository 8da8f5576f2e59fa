"""Structural reshaping & census operators: k-hop neighborhoods, ANND,
dyad census, line graph, vertex permutation.

All are pure relational compositions (joins + aggregates) of the edge
table — the operator family the reference implements as CSR walks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph


def neighborhood_size(
    graph: LinkGraph, order: int = 1, mode: str = "all", mindist: int = 0
) -> DataFrame:
    """Vertices within ``order`` hops → (id, size)
    (igraph_neighborhood_size, /root/reference/src/
    structural_properties.c:2806): counts vertices at distance
    mindist..order from each vertex (the vertex itself included when
    mindist=0).

    Implementation: k rounds of frontier expansion over the cached
    adjacency — the reached set is (id, nbr, dist) with dist = first
    hop at which nbr was seen (BFS layering), so each round joins only
    the newest frontier, not the whole reached set.
    """
    if order < 0:
        raise ValueError("order must be >= 0")
    adj = (
        graph.adjacency(mode)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = graph.vertices()
    reached = verts.select(
        F.col("id"), F.col("id").alias("nbr"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = reached
    for k in range(1, order + 1):
        nxt = (
            frontier.select("id", F.col("nbr").alias("src"))
            .join(adj, "src")
            .select("id", F.col("dst").alias("nbr"))
            .distinct()
            .join(reached.select("id", "nbr"), ["id", "nbr"], "left_anti")
            .withColumn("dist", F.lit(k))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    counted = (
        reached.filter(F.col("dist") >= mindist)
        .groupBy("id")
        .agg(F.count("*").alias("size"))
    )
    return verts.join(counted, "id", "left").select(
        "id", F.coalesce("size", F.lit(0)).cast("long").alias("size")
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
    return LinkGraph(e, directed=graph.directed, n=graph._n)
