"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline operator) run over a graph/table derived
deterministically from the sf parquet tables; ``oracle_sql()`` holds
the equivalent DuckDB SQL. Derived-graph conventions (identical on
both sides):

- dense directed graph: ``src = l_orderkey % 1000, dst = l_partkey %
  1000`` from lineitem, self-loops dropped, weight = multiplicity
  (the igraph_simplify form);
- sparse directed graph (for component structure): the same mod-4000,
  restricted to ``l_quantity <= 2`` rows, distinct edges.

Float-valued results are rounded identically on both sides so the
driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph

# ---------------------------------------------------------------------------
# shared derived tables
# ---------------------------------------------------------------------------

DENSE_MOD = 1000
SPARSE_MOD = 4000

DENSE_EDGES_SQL = f"""
edges AS (
  SELECT l_orderkey % {DENSE_MOD} AS src,
         l_partkey  % {DENSE_MOD} AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem
  WHERE l_orderkey % {DENSE_MOD} <> l_partkey % {DENSE_MOD}
  GROUP BY 1, 2
),
verts AS (
  SELECT src AS id FROM edges UNION SELECT dst FROM edges
)"""

SPARSE_EDGES_SQL = f"""
edges AS (
  SELECT DISTINCT l_orderkey % {SPARSE_MOD} AS src,
                  l_partkey  % {SPARSE_MOD} AS dst
  FROM lineitem
  WHERE l_quantity <= 2
    AND l_orderkey % {SPARSE_MOD} <> l_partkey % {SPARSE_MOD}
),
verts AS (
  SELECT src AS id FROM edges UNION SELECT dst FROM edges
)"""

TOKENS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dense_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _li(spark, sf_dir)
    e = (
        li.select(
            (F.col("l_orderkey") % DENSE_MOD).alias("src"),
            (F.col("l_partkey") % DENSE_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return LinkGraph(e, directed=True)


def _sparse_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _li(spark, sf_dir)
    e = (
        li.filter(F.col("l_quantity") <= 2)
        .select(
            (F.col("l_orderkey") % SPARSE_MOD).alias("src"),
            (F.col("l_partkey") % SPARSE_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return LinkGraph(e, directed=True)


# ---------------------------------------------------------------------------
# entry — flagship smoke query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the dense derived link graph at sf0.001,
    top-20 vertices by rank."""
    from xdata_igraph_spark.operators.pagerank import pagerank

    g = _dense_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank(g, tol=1e-8, max_iter=200)
    return (
        pr.orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
        .select("id", F.round("rank", 8).alias("rank"))
    )


# ---------------------------------------------------------------------------
# queries — Spark implementations
# ---------------------------------------------------------------------------


def _q_degree(mode: str):
    def q(spark, sf_dir):
        g = _dense_graph(spark, sf_dir)
        return g.degrees(mode).orderBy("id")

    return q


def _q_strength(spark, sf_dir):
    g = _dense_graph(spark, sf_dir)
    return g.strength("all")


def _q_simplify(spark, sf_dir):
    g = _dense_graph(spark, sf_dir)
    return g.edges.select("src", "dst", "weight")


def _q_reciprocity(spark, sf_dir):
    g = _dense_graph(spark, sf_dir)
    e = g.edges.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst")).withColumn(
        "m", F.lit(1)
    )
    flagged = e.join(rev, ["src", "dst"], "left")
    return flagged.agg(
        F.count("*").alias("total_edges"),
        F.sum(F.coalesce("m", F.lit(0))).alias("mutual_edges"),
        F.round(F.sum(F.coalesce("m", F.lit(0))) / F.count("*"), 9).alias("reciprocity"),
    )


def _q_triangle_count(spark, sf_dir):
    from xdata_igraph_spark.operators.triangles import list_triangles

    g = _dense_graph(spark, sf_dir)
    return list_triangles(g).agg(F.count("*").alias("n_triangles"))


def _q_triangles_per_vertex(spark, sf_dir):
    from xdata_igraph_spark.operators.triangles import adjacent_triangles

    g = _dense_graph(spark, sf_dir)
    return adjacent_triangles(g).filter(F.col("triangles") > 0)


def _q_transitivity(spark, sf_dir):
    from xdata_igraph_spark.operators.triangles import transitivity_undirected

    g = _dense_graph(spark, sf_dir)
    t = transitivity_undirected(g)
    return spark.createDataFrame([(round(t, 9),)], "transitivity double")


def _q_pagerank(spark, sf_dir):
    from xdata_igraph_spark.operators.pagerank import pagerank

    g = _dense_graph(spark, sf_dir)
    pr = pagerank(g, max_iter=5, tol=0.0)
    return pr.select("id", F.round("rank", 8).alias("rank"))


def _q_cocitation(spark, sf_dir):
    from xdata_igraph_spark.operators.similarity import cocitation

    g = _dense_graph(spark, sf_dir)
    return cocitation(g).filter(F.col("n_common") >= 3)


def _q_jaccard(spark, sf_dir):
    from xdata_igraph_spark.operators.similarity import jaccard_edge_pairs

    g = _dense_graph(spark, sf_dir)
    return jaccard_edge_pairs(g).select(
        "a", "b", F.round("jaccard", 9).alias("jaccard")
    )


def _q_assortativity(spark, sf_dir):
    from xdata_igraph_spark.operators.similarity import assortativity_degree

    g = _dense_graph(spark, sf_dir)
    r = assortativity_degree(g)
    return spark.createDataFrame([(round(r, 9),)], "assortativity double")


def _q_scan1(spark, sf_dir):
    from xdata_igraph_spark.operators.scan_stats import scan1

    g = _dense_graph(spark, sf_dir)
    return scan1(g)


def _us_them(spark, sf_dir):
    li = _li(spark, sf_dir)

    def side(parity):
        return LinkGraph(
            li.filter(F.col("l_linenumber") % 2 == parity)
            .select(
                (F.col("l_orderkey") % DENSE_MOD).alias("src"),
                (F.col("l_partkey") % DENSE_MOD).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct(),
            directed=True,
        )

    return side(0), side(1)


def _q_scan0_them(spark, sf_dir):
    from xdata_igraph_spark.operators.scan_stats import scan0_them

    us, them = _us_them(spark, sf_dir)
    return scan0_them(us, them)


def _q_wcc(spark, sf_dir):
    from xdata_igraph_spark.operators.components import wcc

    g = _sparse_graph(spark, sf_dir)
    return wcc(g)


def _q_scc(spark, sf_dir):
    from xdata_igraph_spark.operators.components import scc

    g = _sparse_graph(spark, sf_dir)
    return scc(g)


def _q_kcore(spark, sf_dir):
    from xdata_igraph_spark.operators.kcore import coreness

    g = _sparse_graph(spark, sf_dir)
    return coreness(g)


def _q_fingerprints(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select("fingerprint", "n_docs")


def _q_token_stats(spark, sf_dir):
    from xdata_igraph_spark.operators.textstats import token_stats

    return token_stats(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    from xdata_igraph_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    from xdata_igraph_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_minhash(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(_docs(spark, sf_dir), num_hashes=8, shingle_n=3)
    return sig.select(
        "doc_id", *[F.col("sig").getItem(i).alias(f"h{i}") for i in range(8)]
    )


def _q_ngram_jaccard(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), shingle_n=3, threshold=0.2
    ).select("a", "b", F.round("jaccard", 9).alias("jaccard"))


def _q_lsh_candidates(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _docs(spark, sf_dir), num_hashes=8, bands=4, shingle_n=3
    )


def _q_simhash(spark, sf_dir):
    from xdata_igraph_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def _q_embedding_topk(spark, sf_dir):
    from xdata_igraph_spark.operators.ann import cosine_topk

    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") < 100)
    return cosine_topk(emb, k=3, probe=probe).select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine")
    )


def _q_srp_topk(spark, sf_dir):
    from xdata_igraph_spark.operators.ann import srp_topk

    return srp_topk(_emb(spark, sf_dir), k=3, n_planes=8, dim=64, n_tables=4).select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine")
    )


def _q_dice(spark, sf_dir):
    from xdata_igraph_spark.operators.similarity import dice_edge_pairs

    g = _dense_graph(spark, sf_dir)
    return dice_edge_pairs(g).select("a", "b", F.round("dice", 9).alias("dice"))


def _q_invlog(spark, sf_dir):
    from xdata_igraph_spark.operators.similarity import inverse_log_weighted

    g = _dense_graph(spark, sf_dir)
    return inverse_log_weighted(g).select("a", "b", F.round("sim", 8).alias("sim"))


def _q_hits(spark, sf_dir):
    from xdata_igraph_spark.operators.centrality import hits

    g = _dense_graph(spark, sf_dir)
    h = hits(g, max_iter=3, tol=0.0)
    return h.select(
        "id", F.round("hub", 8).alias("hub"), F.round("authority", 8).alias("authority")
    )


def _q_eigenvector(spark, sf_dir):
    from xdata_igraph_spark.operators.centrality import eigenvector_centrality

    g = _dense_graph(spark, sf_dir)
    ev = eigenvector_centrality(g, max_iter=3, tol=0.0)
    return ev.select("id", F.round("centrality", 8).alias("centrality"))


def _q_bfs_hops(spark, sf_dir):
    from xdata_igraph_spark.operators.paths import shortest_paths

    g = _dense_graph(spark, sf_dir)
    src = g.vertices().agg(F.min("id")).first()[0]
    d = shortest_paths(g, [int(src)], mode="out")
    return d.select("id", F.col("dist").cast("bigint").alias("dist"))


def _dag_graph(spark, sf_dir):
    """Leveled DAG: lvl(x)=x%8; keep (a,b) edges with lvl(b)=lvl(a)+1 —
    bounded 8-layer depth so the recursive-SQL oracle terminates."""
    li = _li(spark, sf_dir)
    e = (
        li.select(
            (F.col("l_orderkey") % DENSE_MOD).alias("src"),
            (F.col("l_partkey") % DENSE_MOD).alias("dst"),
        )
        .filter((F.col("src") % 8) + 1 == F.col("dst") % 8)
        .distinct()
    )
    return LinkGraph(e, directed=True)


def _q_topo_layers(spark, sf_dir):
    from xdata_igraph_spark.operators.paths import topological_sorting

    g = _dag_graph(spark, sf_dir)
    return topological_sorting(g).select("id", "layer", "order")


def _q_neighborhood2(spark, sf_dir):
    from xdata_igraph_spark.operators.structure import neighborhood_size

    g = _sparse_graph(spark, sf_dir)
    return neighborhood_size(g, order=2, mode="all")


def _q_annd(spark, sf_dir):
    from xdata_igraph_spark.operators.structure import avg_nearest_neighbor_degree

    g = _dense_graph(spark, sf_dir)
    return avg_nearest_neighbor_degree(g).select(
        "id", F.round("knn", 9).alias("knn")
    )


def _q_dyad_census(spark, sf_dir):
    from xdata_igraph_spark.operators.structure import dyad_census

    g = _dense_graph(spark, sf_dir)
    mut, asym, null = dyad_census(g)
    return spark.createDataFrame(
        [(mut, asym, null)], "mut long, asym long, nulls long"
    )


def _q_linegraph(spark, sf_dir):
    from xdata_igraph_spark.operators.structure import linegraph

    g = _sparse_graph(spark, sf_dir)
    return linegraph(g)


def _q_gen_tree_degrees(spark, sf_dir):
    from xdata_igraph_spark.sources.generators import tree

    g = tree(spark, 3000, children=3)
    return g.degrees("all").select("id", F.col("degree").cast("bigint").alias("degree"))


def _q_events_windowed(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree_out": _q_degree("out"),
        "degree_in": _q_degree("in"),
        "degree_all": _q_degree("all"),
        "strength_all": _q_strength,
        "simplify_edges": _q_simplify,
        "reciprocity": _q_reciprocity,
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "transitivity_global": _q_transitivity,
        "pagerank_5iter": _q_pagerank,
        "cocitation_min3": _q_cocitation,
        "jaccard_edges": _q_jaccard,
        "assortativity_degree": _q_assortativity,
        "scan1": _q_scan1,
        "scan0_them": _q_scan0_them,
        "wcc_sparse": _q_wcc,
        "scc_sparse": _q_scc,
        "kcore_sparse": _q_kcore,
        "doc_fingerprints": _q_fingerprints,
        "dedup_exact": _q_dedup_exact,
        "doc_token_stats": _q_token_stats,
        "doc_quality": _q_quality,
        "doc_lang_id": _q_lang_id,
        "minhash_signatures": _q_minhash,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "minhash_lsh_candidates": _q_lsh_candidates,
        "simhash": _q_simhash,
        "embedding_topk": _q_embedding_topk,
        "srp_topk": _q_srp_topk,
        "events_windowed": _q_events_windowed,
        "dice_edges": _q_dice,
        "invlogweighted": _q_invlog,
        "hits_3iter": _q_hits,
        "eigenvector_3iter": _q_eigenvector,
        "bfs_hops": _q_bfs_hops,
        "topo_layers": _q_topo_layers,
        "neighborhood2": _q_neighborhood2,
        "annd_dense": _q_annd,
        "dyad_census_dense": _q_dyad_census,
        "linegraph_sparse": _q_linegraph,
        "gen_tree_degrees": _q_gen_tree_degrees,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------


def _deg_sql(side: str) -> str:
    if side == "all":
        counts = """
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
  ) GROUP BY id"""
    else:
        col = "src" if side == "out" else "dst"
        counts = f"SELECT {col} AS id, count(*) AS d FROM edges GROUP BY {col}"
    return f"""WITH {DENSE_EDGES_SQL},
counts AS ({counts})
SELECT v.id, CAST(coalesce(c.d, 0) AS BIGINT) AS degree
FROM verts v LEFT JOIN counts c ON v.id = c.id"""


def _pagerank_sql(iters: int = 5, d: float = 0.85) -> str:
    parts = [
        f"WITH {DENSE_EDGES_SQL},",
        "outs AS (SELECT src, sum(weight) AS w FROM edges GROUP BY src),",
        "contrib AS (SELECT e.src, e.dst, e.weight / o.w AS p"
        " FROM edges e JOIN outs o ON e.src = o.src),",
        "nv AS (SELECT count(*) AS n FROM verts),",
        "dang AS (SELECT v.id FROM verts v LEFT JOIN outs o ON v.id = o.src"
        " WHERE o.src IS NULL),",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts)",
    ]
    for k in range(iters):
        parts.append(
            f""", s{k} AS (SELECT sum(rank) AS s FROM r{k})
, d{k} AS (SELECT coalesce(sum(r.rank), 0) AS dm
           FROM r{k} r JOIN dang g ON r.id = g.id)
, acc{k} AS (SELECT c.dst AS id, sum(r.rank * c.p) AS acc
             FROM r{k} r JOIN contrib c ON r.id = c.src GROUP BY c.dst)
, r{k + 1} AS (
    SELECT v.id,
           {d} * coalesce(a.acc, 0)
           + (( {1 - d} * (SELECT s FROM s{k}) + {d} * (SELECT dm FROM d{k}) )
              / (SELECT n FROM nv)) AS rank
    FROM verts v LEFT JOIN acc{k} a ON v.id = a.id)"""
        )
    parts.append(f"\nSELECT id, round(rank, 8) AS rank FROM r{iters}")
    return "".join(parts)


_TRI_CORE_SQL = """
und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM edges),
tri AS (
  SELECT e1.lo AS v1, e1.hi AS v2, e2.hi AS v3
  FROM und e1
  JOIN und e2 ON e2.lo = e1.hi
  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["degree_out"] = _deg_sql("out")
    sql["degree_in"] = _deg_sql("in")
    sql["degree_all"] = _deg_sql("all")

    sql["strength_all"] = f"""WITH {DENSE_EDGES_SQL},
s AS (
  SELECT id, sum(weight) AS st FROM (
    SELECT src AS id, weight FROM edges
    UNION ALL SELECT dst, weight FROM edges
  ) GROUP BY id
)
SELECT v.id, coalesce(s.st, 0.0) AS strength
FROM verts v LEFT JOIN s ON v.id = s.id"""

    sql["simplify_edges"] = f"WITH {DENSE_EDGES_SQL}\nSELECT src, dst, weight FROM edges"

    sql["reciprocity"] = f"""WITH {DENSE_EDGES_SQL},
flagged AS (
  SELECT e.src, e.dst,
         CASE WHEN r.src IS NULL THEN 0 ELSE 1 END AS m
  FROM edges e
  LEFT JOIN (SELECT dst AS src, src AS dst FROM edges) r
    ON e.src = r.src AND e.dst = r.dst
)
SELECT count(*) AS total_edges,
       CAST(sum(m) AS BIGINT) AS mutual_edges,
       round(sum(m)::DOUBLE / count(*), 9) AS reciprocity
FROM flagged"""

    sql["triangle_count"] = (
        f"WITH {DENSE_EDGES_SQL},{_TRI_CORE_SQL}\n"
        "SELECT count(*) AS n_triangles FROM tri"
    )

    sql["triangles_per_vertex"] = f"""WITH {DENSE_EDGES_SQL},{_TRI_CORE_SQL}
SELECT id, count(*) AS triangles FROM (
  SELECT v1 AS id FROM tri
  UNION ALL SELECT v2 FROM tri
  UNION ALL SELECT v3 FROM tri
) GROUP BY id"""

    sql["transitivity_global"] = f"""WITH {DENSE_EDGES_SQL},{_TRI_CORE_SQL},
deg AS (
  SELECT id, count(*) AS d FROM (
    SELECT lo AS id FROM und UNION ALL SELECT hi FROM und
  ) GROUP BY id
)
SELECT round(
  6.0 * (SELECT count(*) FROM tri) / (SELECT sum(d * (d - 1)) FROM deg), 9
) AS transitivity"""

    sql["pagerank_5iter"] = _pagerank_sql(5)

    sql["cocitation_min3"] = f"""WITH {DENSE_EDGES_SQL}
SELECT t1.dst AS a, t2.dst AS b, count(*) AS n_common
FROM edges t1 JOIN edges t2 ON t1.src = t2.src AND t1.dst < t2.dst
GROUP BY 1, 2
HAVING count(*) >= 3"""

    sql["jaccard_edges"] = f"""WITH {DENSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT s AS id, count(*) AS deg FROM sym GROUP BY s),
pairs AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
common AS (
  SELECT t1.s AS a, t2.s AS b, count(*) AS n
  FROM sym t1 JOIN sym t2 ON t1.d = t2.d AND t1.s < t2.s
  GROUP BY 1, 2
)
SELECT p.a, p.b,
       round(coalesce(c.n, 0)::DOUBLE
             / (da.deg + db.deg - coalesce(c.n, 0)), 9) AS jaccard
FROM pairs p
LEFT JOIN common c ON p.a = c.a AND p.b = c.b
JOIN deg da ON p.a = da.id
JOIN deg db ON p.b = db.id"""

    sql["assortativity_degree"] = f"""WITH {DENSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT s AS id, count(*) - 1 AS x FROM sym GROUP BY s),
j AS (
  SELECT da.x::DOUBLE AS xa, db.x::DOUBLE AS xb
  FROM sym e JOIN deg da ON e.s = da.id JOIN deg db ON e.d = db.id
)
SELECT round(
  (sum(xa * xb) / count(*) - (sum(xa) / count(*)) ^ 2)
  / (sum(xa * xa) / count(*) - (sum(xa) / count(*)) ^ 2), 9
) AS assortativity FROM j"""

    sql["scan1"] = f"""WITH {DENSE_EDGES_SQL},{_TRI_CORE_SQL},
deg AS (
  SELECT id, count(*) AS d FROM (
    SELECT lo AS id FROM und UNION ALL SELECT hi FROM und
  ) GROUP BY id
),
pvt AS (
  SELECT id, count(*) AS t FROM (
    SELECT v1 AS id FROM tri UNION ALL SELECT v2 FROM tri UNION ALL SELECT v3 FROM tri
  ) GROUP BY id
)
SELECT v.id,
       CAST(coalesce(deg.d, 0) + coalesce(pvt.t, 0) AS BIGINT) AS scan1
FROM verts v
LEFT JOIN deg ON v.id = deg.id
LEFT JOIN pvt ON v.id = pvt.id"""

    sql["scan0_them"] = f"""WITH
us AS (
  SELECT DISTINCT l_orderkey % {DENSE_MOD} AS src, l_partkey % {DENSE_MOD} AS dst
  FROM lineitem
  WHERE l_linenumber % 2 = 0 AND l_orderkey % {DENSE_MOD} <> l_partkey % {DENSE_MOD}
),
them AS (
  SELECT DISTINCT l_orderkey % {DENSE_MOD} AS src, l_partkey % {DENSE_MOD} AS dst
  FROM lineitem
  WHERE l_linenumber % 2 = 1 AND l_orderkey % {DENSE_MOD} <> l_partkey % {DENSE_MOD}
),
us_verts AS (SELECT src AS id FROM us UNION SELECT dst FROM us),
them_deg AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM them UNION ALL SELECT dst FROM them
  ) GROUP BY id
)
SELECT v.id, CAST(coalesce(t.d, 0) AS BIGINT) AS scan0_them
FROM us_verts v LEFT JOIN them_deg t ON v.id = t.id"""

    sql["wcc_sparse"] = f"""WITH RECURSIVE {SPARSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
),
comp AS (SELECT id, min(r) AS minid FROM reach GROUP BY id)
SELECT id, dense_rank() OVER (ORDER BY minid) - 1 AS component FROM comp"""

    sql["scc_sparse"] = f"""WITH RECURSIVE {SPARSE_EDGES_SQL},
reach(s, d) AS (
  SELECT id, id FROM verts
  UNION
  SELECT reach.s, e.dst FROM reach JOIN edges e ON reach.d = e.src
),
comp AS (
  SELECT r1.s AS id, min(r1.d) AS minid
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
  GROUP BY r1.s
)
SELECT id, dense_rank() OVER (ORDER BY minid) - 1 AS component FROM comp"""

    # kcore_sparse: iterative peel — not SQL-expressible without
    # aggregate-in-recursion semantics we rely on pytest to verify.

    sql["doc_fingerprints"] = "SELECT doc_id, md5(text) AS fingerprint FROM documents"

    sql["dedup_exact"] = """
SELECT md5(text) AS fingerprint, count(*) AS n_docs
FROM documents GROUP BY 1 HAVING count(*) > 1"""

    sql["doc_token_stats"] = f"""WITH t AS (
  SELECT doc_id, text, {TOKENS_SQL} AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars,
       round(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
             / greatest(len(toks), 1), 6) AS avg_token_len
FROM t"""

    sql["doc_quality"] = """
SELECT doc_id,
  round(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
        / greatest(length(text), 1), 6) AS alpha_ratio,
  round(length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
        / greatest(length(text), 1), 6) AS ws_ratio,
  round(least(1.0,
    length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
      / greatest(length(text), 1)
    + CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 0.1 ELSE 0.0 END), 6
  ) AS quality
FROM documents"""

    langs = {"en": ["the", "and", "of", "to", "a"],
             "de": ["der", "die", "und", "das", "ist"],
             "fr": ["le", "la", "et", "les", "des"],
             "es": ["el", "la", "los", "que", "y"]}
    score_exprs = ",\n  ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS s_{}".format(
            ", ".join(f"'{w}'" for w in ws), la
        )
        for la, ws in langs.items()
    )
    when_chain = "\n    ".join(
        f"WHEN s_{la} = best AND best > 0 THEN '{la}'" for la in langs
    )
    sql["doc_lang_id"] = f"""WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
),
scored AS (
  SELECT doc_id,
  {score_exprs}
  FROM t
),
withbest AS (
  SELECT *, greatest(s_en, s_de, s_fr, s_es) AS best FROM scored
)
SELECT doc_id,
  CASE {when_chain}
    ELSE 'unk' END AS pred_lang
FROM withbest"""

    shingle_sql = f"""sh AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(toks) - 2),
                i -> array_to_string(toks[i + 1 : i + 3], ' '))) AS sh
  FROM (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents)
  WHERE len(toks) >= 3
)"""

    minh = ",\n  ".join(
        f"min(('0x' || substr(md5('{i}|' || sh), 1, 8))::BIGINT) AS h{i}"
        for i in range(8)
    )
    sql["minhash_signatures"] = f"""WITH {shingle_sql}
SELECT doc_id,
  {minh}
FROM sh GROUP BY doc_id"""

    sql["ngram_jaccard_pairs"] = f"""WITH {shingle_sql},
dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
common AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*) AS c
  FROM dsh t1 JOIN dsh t2 ON t1.sh = t2.sh AND t1.doc_id < t2.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(c::DOUBLE / (sa.n + sb.n - c), 9) AS jaccard
FROM common
JOIN sizes sa ON common.a = sa.doc_id
JOIN sizes sb ON common.b = sb.doc_id
WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.2"""

    band_vals = []
    rows = 2
    for b in range(4):
        cols = " || ',' || ".join(
            f"h{b * rows + r}::VARCHAR" for r in range(rows)
        )
        band_vals.append(f"('{b}:' || md5({cols}))")
    sql["minhash_lsh_candidates"] = f"""WITH {shingle_sql},
sig AS (
  SELECT doc_id,
  {minh}
  FROM sh GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, unnest([{", ".join(band_vals)}]) AS bucket FROM sig
)
SELECT DISTINCT t1.doc_id AS a, t2.doc_id AS b
FROM buckets t1 JOIN buckets t2
  ON t1.bucket = t2.bucket AND t1.doc_id < t2.doc_id"""

    # srp_topk: the SRP hyperplanes are deterministic (seeded numpy, see
    # operators/ann.py:_planes); the oracle embeds the identical plane
    # constants as SQL literals, rebuilds the per-table sign-bit buckets,
    # unions candidates, and reranks by exact cosine — same tie-breaking
    # (desc cosine, asc neighbor id), rounded to 5 like embedding_topk.
    from xdata_igraph_spark.operators.ann import _planes as _srp_planes

    table_ctes, cand_sqls = [], []
    for t in range(4):
        bits = " || ".join(
            "(CASE WHEN list_dot_product(v, [{}]) >= 0 THEN '1' ELSE '0' END)".format(
                ", ".join(repr(float(x)) for x in p)
            )
            for p in _srp_planes(64, 8, seed=42 + t)
        )
        table_ctes.append(f"b{t} AS (SELECT vec_id, {bits} AS bucket FROM e)")
        cand_sqls.append(
            f"SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id\n"
            f"  FROM b{t} q JOIN b{t} n ON q.bucket = n.bucket "
            f"AND q.vec_id <> n.vec_id"
        )
    sql["srp_topk"] = (
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v "
        "FROM embeddings),\n"
        + ",\n".join(table_ctes)
        + ",\ncand AS (\n  "
        + "\n  UNION\n  ".join(cand_sqls)
        + "\n),\nscored AS (\n"
        "  SELECT c.query_id, c.neighbor_id,\n"
        "         list_cosine_similarity(eq.v, en.v) AS cos\n"
        "  FROM cand c JOIN e eq ON c.query_id = eq.vec_id\n"
        "              JOIN e en ON c.neighbor_id = en.vec_id\n"
        "),\nrk AS (\n"
        "  SELECT query_id, neighbor_id, cos,\n"
        "         row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id ASC) AS rn\n"
        "  FROM scored\n)\n"
        "SELECT query_id, neighbor_id, round(cos, 5) AS cosine FROM rk WHERE rn <= 3"
    )

    # simhash: same md5-derived bit votes as operators/dedup.py:simhash —
    # 32-bit halves, strict-majority vote per bit, two's-complement cast
    bits_expr = " + ".join(
        f"CASE WHEN 2*sum(({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) > count(*) "
        f"THEN {1 << b}::HUGEINT ELSE 0 END"
        for b in range(64)
    )
    sql["simhash"] = f"""WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS w FROM documents),
hs AS (
  SELECT doc_id,
    ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
    ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
  FROM toks),
agg AS (SELECT doc_id, ({bits_expr}) AS fpu FROM hs GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(CASE WHEN agg.fpu >= 9223372036854775808::HUGEINT
                THEN (agg.fpu - 18446744073709551616::HUGEINT)::BIGINT
                ELSE agg.fpu::BIGINT END, 0) AS simhash
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id"""

    sql["embedding_topk"] = """WITH
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 100),
b AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS c
  FROM q CROSS JOIN b WHERE query_id <> neighbor_id
),
rk AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, round(c, 5) AS cosine FROM rk WHERE rn <= 3"""

    sql["dice_edges"] = f"""WITH {DENSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT s AS id, count(*) AS deg FROM sym GROUP BY s),
pairs AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
common AS (
  SELECT t1.s AS a, t2.s AS b, count(*) AS n
  FROM sym t1 JOIN sym t2 ON t1.d = t2.d AND t1.s < t2.s
  GROUP BY 1, 2
)
SELECT p.a, p.b,
       round(2.0 * coalesce(c.n, 0) / (da.deg + db.deg), 9) AS dice
FROM pairs p
LEFT JOIN common c ON p.a = c.a AND p.b = c.b
JOIN deg da ON p.a = da.id
JOIN deg db ON p.b = db.id"""

    sql["invlogweighted"] = f"""WITH {DENSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT s AS k, count(*) AS kdeg FROM sym GROUP BY s)
SELECT t1.s AS a, t2.s AS b,
       round(sum(CASE WHEN deg.kdeg > 1 THEN 1.0 / ln(deg.kdeg) ELSE 0 END), 8) AS sim
FROM sym t1
JOIN sym t2 ON t1.d = t2.d AND t1.s < t2.s
JOIN deg ON deg.k = t1.d
GROUP BY 1, 2"""

    # --- eigenvector / HITS: unrolled power-iteration rounds ---
    def _ev_sql(iters: int = 3) -> str:
        parts = [
            f"WITH {DENSE_EDGES_SQL},",
            "sym AS (SELECT src, dst, weight FROM edges"
            " UNION ALL SELECT dst, src, weight FROM edges),",
            "x0 AS (SELECT id, 1.0 AS x FROM verts)",
        ]
        for k in range(iters):
            parts.append(
                f""", s{k} AS (SELECT sqrt(sum(x * x)) AS s FROM x{k})
, x{k + 1} AS (
    SELECT v.id, coalesce(m.acc, 0) / (SELECT s FROM s{k}) AS x
    FROM verts v LEFT JOIN (
      SELECT e.dst AS id, sum(e.weight * p.x) AS acc
      FROM sym e JOIN x{k} p ON p.id = e.src GROUP BY e.dst
    ) m ON v.id = m.id)"""
            )
        parts.append(
            f"\nSELECT id, round(x / (SELECT max(x) FROM x{iters}), 8)"
            f" AS centrality FROM x{iters}"
        )
        return "".join(parts)

    sql["eigenvector_3iter"] = _ev_sql(3)

    def _hits_sql(iters: int = 3) -> str:
        parts = [
            f"WITH {DENSE_EDGES_SQL},",
            "h0 AS (SELECT id, 1.0 AS h FROM verts)",
        ]
        for k in range(iters):
            parts.append(
                f""", s{k} AS (SELECT sqrt(sum(h * h)) AS s FROM h{k})
, a{k + 1} AS (
    SELECT v.id, coalesce(m.acc, 0) / (SELECT s FROM s{k}) AS a
    FROM verts v LEFT JOIN (
      SELECT e.dst AS id, sum(e.weight * p.h) AS acc
      FROM edges e JOIN h{k} p ON p.id = e.src GROUP BY e.dst
    ) m ON v.id = m.id)
, h{k + 1} AS (
    SELECT v.id, coalesce(m.acc, 0) AS h
    FROM verts v LEFT JOIN (
      SELECT e.src AS id, sum(e.weight * q.a) AS acc
      FROM edges e JOIN a{k + 1} q ON q.id = e.dst GROUP BY e.src
    ) m ON v.id = m.id)"""
            )
        parts.append(
            f"""
SELECT h.id,
       round(h.h / (SELECT max(h) FROM h{iters}), 8) AS hub,
       round(a.a / (SELECT max(a) FROM a{iters}), 8) AS authority
FROM h{iters} h JOIN a{iters} a ON h.id = a.id"""
        )
        return "".join(parts)

    sql["hits_3iter"] = _hits_sql(3)

    sql["bfs_hops"] = f"""WITH RECURSIVE {DENSE_EDGES_SQL},
r(id, dist) AS (
  SELECT (SELECT min(id) FROM verts), 0
  UNION
  SELECT e.dst, r.dist + 1 FROM r JOIN edges e ON e.src = r.id
  WHERE r.dist < 15
)
SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM r GROUP BY id"""

    sql["topo_layers"] = f"""WITH RECURSIVE
edges AS (
  SELECT DISTINCT l_orderkey % {DENSE_MOD} AS src,
                  l_partkey  % {DENSE_MOD} AS dst
  FROM lineitem
  WHERE (l_orderkey % {DENSE_MOD}) % 8 + 1 = (l_partkey % {DENSE_MOD}) % 8
),
verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
roots AS (
  SELECT id FROM verts WHERE id NOT IN (SELECT dst FROM edges)
),
r(id, d) AS (
  SELECT id, 0 FROM roots
  UNION
  SELECT e.dst, r.d + 1 FROM r JOIN edges e ON e.src = r.id WHERE r.d < 9
),
layers AS (SELECT id, max(d) AS layer FROM r GROUP BY id)
SELECT id, CAST(layer AS BIGINT) AS layer,
       CAST(row_number() OVER (ORDER BY layer, id) - 1 AS BIGINT) AS "order"
FROM layers"""

    sql["neighborhood2"] = f"""WITH {SPARSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
n1 AS (SELECT s AS id, d AS nbr FROM sym),
n2 AS (
  SELECT a.id, b.d AS nbr FROM n1 a JOIN sym b ON a.nbr = b.s
),
reach AS (
  SELECT id, id AS nbr FROM verts
  UNION SELECT id, nbr FROM n1
  UNION SELECT id, nbr FROM n2
)
SELECT v.id, CAST(coalesce(c.n, 0) AS BIGINT) AS size
FROM verts v LEFT JOIN (
  SELECT id, count(*) AS n FROM reach GROUP BY id
) c ON v.id = c.id"""

    sql["annd_dense"] = f"""WITH {DENSE_EDGES_SQL},
sym AS (SELECT src AS s, dst AS d FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT s AS id, count(*) AS degree FROM sym GROUP BY s)
SELECT v.id, round(avg(nd.degree), 9) AS knn
FROM verts v
LEFT JOIN sym ON sym.s = v.id
LEFT JOIN deg nd ON nd.id = sym.d
GROUP BY v.id"""

    sql["dyad_census_dense"] = f"""WITH {DENSE_EDGES_SQL},
pairs AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, count(*) AS arcs
  FROM (SELECT DISTINCT src, dst FROM edges)
  GROUP BY 1, 2
),
nv AS (SELECT count(*) AS n FROM verts)
SELECT CAST(sum(CASE WHEN arcs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mut,
       CAST(sum(CASE WHEN arcs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS asym,
       CAST((SELECT n * (n - 1) / 2 FROM nv)
            - count(*) AS BIGINT) AS nulls
FROM pairs"""

    sql["linegraph_sparse"] = f"""WITH {SPARSE_EDGES_SQL},
eid AS (
  SELECT src, dst, row_number() OVER (ORDER BY src, dst) - 1 AS eid FROM edges
)
SELECT a.eid AS src, b.eid AS dst
FROM eid a JOIN eid b ON a.dst = b.src AND a.eid <> b.eid"""

    sql["gen_tree_degrees"] = """WITH
kids AS (SELECT j.range AS j, (j.range - 1) // 3 AS parent FROM range(1, 3000) j),
ends AS (SELECT parent AS id FROM kids UNION ALL SELECT j FROM kids),
deg AS (SELECT id, count(*) AS degree FROM ends GROUP BY id)
SELECT v.range AS id, CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree
FROM range(0, 3000) v LEFT JOIN deg ON deg.id = v.range"""

    sql["events_windowed"] = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""

    return sql
