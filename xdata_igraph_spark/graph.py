"""LinkGraph — the columnar edge-table graph.

Semantics mirror the reference's indexed edge list (``igraph_t``,
/root/reference/include/igraph_datatype.h:78-88): a graph is two long
columns ``src``/``dst`` (plus an optional parallel ``weight``), with
vertices as implicit dense ids. The reference derives CSR indexes from
the same columns at construction (/root/reference/src/
type_indexededgelist.c:258-339); here partitioning + caching play that
role — an algorithm asks for ``edges_by_src()`` once, and every
superstep reuses the same hash-partitioned, cached edge table so the
big table never re-shuffles inside a loop.

Design-for-scale notes:
- all per-vertex results are DataFrames, never driver-side lists;
- the vertex table is typically million×1e6 smaller than the edge
  table; joins against derived vertex dictionaries broadcast when small
  and hash-join otherwise (Catalyst/AQE decides; helpers take a
  ``broadcast_vertices`` hint);
- undirected graphs store each edge once in canonical ``src >= dst``
  order exactly like the reference (/root/reference/src/
  type_indexededgelist.c:280-286) and symmetrize on demand.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long, weight double"


class LinkGraph:
    """An immutable graph view over an edge DataFrame.

    Parameters
    ----------
    edges : DataFrame with columns ``src: long, dst: long`` and
        optionally ``weight: double`` (defaulted to 1.0).
    directed : interpretation flag, as in the reference
        (igraph_is_directed, /root/reference/src/type_indexededgelist.c:893).
    n : optional explicit vertex count — vertices are ``0..n-1`` like
        the reference's implicit ids; if omitted, the vertex set is
        derived from edge endpoints.
    """

    def __init__(
        self,
        edges: DataFrame,
        directed: bool = True,
        n: int | None = None,
        vertices: DataFrame | None = None,
    ):
        cols = edges.columns
        if "weight" not in cols:
            edges = edges.withColumn("weight", F.lit(1.0))
        self.edges = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
        self.directed = directed
        self._n = n
        self._vertices = vertices
        self.spark: SparkSession = edges.sparkSession
        # lazy physical indexes (the reference builds CSR at construction,
        # /root/reference/src/type_indexededgelist.c:258-339; here the
        # first operator that scans the edge table more than once
        # materializes it once and every later derivation reads the
        # cached blocks). Holds e.g. "edges" (edges_cached) and the
        # triangle kernels' canonical/oriented tables.
        self._cache: dict[str, DataFrame] = {}
        self._ecount: int | None = None

    # ---------------- constructors ----------------

    @classmethod
    def from_pairs(
        cls,
        spark: SparkSession,
        pairs: Sequence[tuple],
        directed: bool = True,
        n: int | None = None,
    ) -> "LinkGraph":
        """Literal graph, the analogue of igraph_create / igraph_small
        (/root/reference/src/structure_generators.c:50-150,1097-1150)."""
        rows = [
            (int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0) for p in pairs
        ]
        df = spark.createDataFrame(rows, EDGE_SCHEMA)
        return cls(df, directed=directed, n=n)

    @classmethod
    def empty(cls, spark: SparkSession, n: int, directed: bool = True) -> "LinkGraph":
        """n isolated vertices (igraph_empty,
        /root/reference/src/type_indexededgelist.c:80-111)."""
        df = spark.createDataFrame([], EDGE_SCHEMA)
        return cls(df, directed=directed, n=n)

    def materialized(self) -> "LinkGraph":
        """Materialize the edge table and cut its lineage (eager
        localCheckpoint) — the Spark analog of the reference building
        its CSR indexes at construction time
        (/root/reference/src/type_indexededgelist.c:258-339). Call this
        when the edge table is derived from an expensive pipeline and
        will feed multiple operators/actions."""
        e = self.edges.localCheckpointFlat(eager=True)
        out = LinkGraph(e, directed=self.directed, n=self._n, vertices=self._vertices)
        out._cache["edges"] = out.edges
        return out

    def edges_cached(self) -> DataFrame:
        """Edge table backed by cheap-to-rescan storage.

        Operators derive several tables from the edges (adjacency, out-
        strengths, vertex set, canonical pairs ...); when the edge
        DataFrame itself is the product of a pipeline (aggregations,
        joins, extraction), every derivation re-executes that pipeline.
        The first call materializes such a derived plan ONCE (eager
        localCheckpoint) and memoizes it on the instance — the CSR-
        index analogue (guide §1.2: don't recompute what you can keep).
        Plans that are already cheap to rescan (raw file scans, local
        relations, checkpointed RDDs) are returned as-is: for them the
        storage layer is the cache."""
        got = self._cache.get("edges")
        if got is not None:
            return got
        # stock (non-severed) checkpoint: keeps the origin stats link so
        # a small cached edge table still auto-broadcasts in one-shot
        # joins (the severed wrap is for loops; see plans/checkpointing)
        from xdata_igraph_spark.plans.checkpointing import materialize_if_derived

        out = materialize_if_derived(self.edges)
        self._cache["edges"] = out
        return out

    # ---------------- vertex / edge basics ----------------

    def vertices(self) -> DataFrame:
        """Vertex table ``(id)``. Explicit n wins (implicit 0..n-1 ids,
        /root/reference/include/igraph_datatype.h:48); else endpoints."""
        if self._vertices is not None:
            return self._vertices
        if self._n is not None:
            return self.spark.range(self._n).withColumnRenamed("id", "id")
        # explode, not union-of-two-selects: ONE scan of the edge
        # lineage instead of two (for derived edge tables the lineage
        # is a whole pipeline, and the union re-ran it per branch)
        return (
            self.edges_cached().select(F.explode(F.array("src", "dst")).alias("id"))
            .distinct()
        )

    def vcount(self) -> int:
        if self._n is not None:
            return self._n
        return self.vertices().count()

    def ecount(self) -> int:
        if self._ecount is None:
            self._ecount = self.edges_cached().count()
        return self._ecount

    def symmetrized(self) -> DataFrame:
        """Edges in both directions — how the reference answers
        IGRAPH_ALL-mode adjacency for undirected graphs
        (/root/reference/include/igraph_datatype.h:69-73)."""
        e = self.edges_cached()
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return e.union(rev)

    def adjacency(self, mode: str = "out") -> DataFrame:
        """Directed-mode adjacency as (src, dst, weight).

        mode: 'out' | 'in' | 'all'.  Undirected graphs always behave as
        'all' (every stored edge works both ways).
        """
        if not self.directed or mode == "all":
            return self.symmetrized()
        if mode == "out":
            return self.edges_cached()
        if mode == "in":
            return self.edges_cached().select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        raise ValueError(f"bad mode {mode!r}")

    # ---------------- §2.3 core queries ----------------

    def degrees(self, mode: str = "all", loops: bool = True) -> DataFrame:
        """Per-vertex degree ``(id, degree)`` (igraph_degree,
        /root/reference/src/type_indexededgelist.c:935-1030).

        ``loops=False`` excludes self-loops entirely; ``loops=True``
        counts a loop once per endpoint (twice for mode='all' on
        undirected, matching the reference).
        """
        e = self.edges
        if not loops:
            e = e.filter(F.col("src") != F.col("dst"))
        ends = []
        if not self.directed or mode in ("out", "all"):
            ends.append(e.select(F.col("src").alias("id")))
        if not self.directed or mode in ("in", "all"):
            ends.append(e.select(F.col("dst").alias("id")))
        incid = ends[0]
        for other in ends[1:]:
            incid = incid.union(other)
        deg = incid.groupBy("id").agg(F.count("*").alias("degree"))
        return (
            self.vertices()
            .join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    def strength(self, mode: str = "all", loops: bool = True) -> DataFrame:
        """Weighted degree ``(id, strength)`` (igraph_strength,
        /root/reference/src/structural_properties.c:5923-5984)."""
        e = self.edges
        if not loops:
            e = e.filter(F.col("src") != F.col("dst"))
        ends = []
        if not self.directed or mode in ("out", "all"):
            ends.append(e.select(F.col("src").alias("id"), "weight"))
        if not self.directed or mode in ("in", "all"):
            ends.append(e.select(F.col("dst").alias("id"), "weight"))
        incid = ends[0]
        for other in ends[1:]:
            incid = incid.union(other)
        s = incid.groupBy("id").agg(F.sum("weight").alias("strength"))
        return (
            self.vertices()
            .join(s, "id", "left")
            .select("id", F.coalesce("strength", F.lit(0.0)).alias("strength"))
        )

    def maxdegree(self, mode: str = "all", loops: bool = True) -> int:
        """igraph_maxdegree (/root/reference/src/structural_properties.c:2703)."""
        row = self.degrees(mode, loops).agg(F.max("degree")).first()
        return int(row[0] or 0)

    def density(self, loops: bool = False) -> float:
        """|E| / possible (igraph_density,
        /root/reference/src/structural_properties.c:2752-2805)."""
        n = self.vcount()
        m = self.ecount()
        if loops:
            possible = n * n if self.directed else n * (n + 1) / 2
        else:
            possible = n * (n - 1) if self.directed else n * (n - 1) / 2
        return float(m) / possible if possible else float("nan")

    def neighbors(self, v: int, mode: str = "out") -> DataFrame:
        """igraph_neighbors (/root/reference/src/type_indexededgelist.c:741)."""
        return (
            self.adjacency(mode)
            .filter(F.col("src") == F.lit(int(v)))
            .select(F.col("dst").alias("id"))
        )

    def are_connected(self, a: int, b: int) -> bool:
        """Edge-existence predicate (igraph_are_connected,
        /root/reference/src/basic_query.c:32-70). Undirected checks the
        canonical pair both ways."""
        e = self.edges if self.directed else self.symmetrized()
        return (
            e.filter((F.col("src") == int(a)) & (F.col("dst") == int(b))).limit(1).count()
            > 0
        )

    def reciprocity(self, ignore_loops: bool = True) -> float:
        """Fraction of mutual directed edges (igraph_reciprocity,
        /root/reference/src/structural_properties.c:2304-2417)."""
        e = self.edges.select("src", "dst").distinct()
        if ignore_loops:
            e = e.filter(F.col("src") != F.col("dst"))
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        mutual = e.join(rev, ["src", "dst"], "left_semi").count()
        total = e.count()
        return mutual / total if total else float("nan")

    def is_mutual(self) -> DataFrame:
        """Per-edge mutuality flag (igraph_is_mutual,
        /root/reference/src/structural_properties.c:5586)."""
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).distinct()
        return self.edges.join(
            rev.withColumn("mutual", F.lit(True)), ["src", "dst"], "left"
        ).select("src", "dst", "weight", F.coalesce("mutual", F.lit(False)).alias("mutual"))

    def count_multiple(self) -> DataFrame:
        """Multiplicity per edge row (igraph_count_multiple,
        /root/reference/src/structural_properties.c:3599) — a window
        count over the (src,dst) pair (canonical pair if undirected)."""
        if self.directed:
            key = [F.col("src"), F.col("dst")]
        else:
            key = [
                F.greatest("src", "dst").alias("a"),
                F.least("src", "dst").alias("b"),
            ]
        counted = (
            self.edges.select(*[k.alias(f"k{i}") for i, k in enumerate(key)])
            .groupBy("k0", "k1")
            .agg(F.count("*").alias("multiplicity"))
        )
        e = self.edges.withColumn(
            "k0", key[0] if self.directed else F.greatest("src", "dst")
        ).withColumn("k1", key[1] if self.directed else F.least("src", "dst"))
        return e.join(counted, ["k0", "k1"]).select("src", "dst", "weight", "multiplicity")

    def is_loop(self) -> DataFrame:
        """Per-edge loop flag (igraph_is_loop,
        /root/reference/src/structural_properties.c:3343)."""
        return self.edges.select(
            "src", "dst", (F.col("src") == F.col("dst")).alias("is_loop")
        )

    def has_multiple(self) -> bool:
        """Any parallel edge? (igraph_has_multiple,
        /root/reference/src/structural_properties.c:3470). Undirected
        pairs canonicalized first."""
        if self.directed:
            key = [F.col("src"), F.col("dst")]
        else:
            key = [F.greatest("src", "dst"), F.least("src", "dst")]
        dup = (
            self.edges.groupBy(key[0].alias("a"), key[1].alias("b"))
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
        )
        return dup.limit(1).count() > 0

    def is_simple(self) -> bool:
        """No loops and no multi-edges (igraph_is_simple,
        /root/reference/src/structural_properties.c:3384)."""
        has_loop = (
            self.edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0
        )
        return not has_loop and not self.has_multiple()

    def add_edges(self, pairs: Sequence[tuple] | DataFrame) -> "LinkGraph":
        """New graph with edges appended (igraph_add_edges,
        /root/reference/src/type_indexededgelist.c:186-257); the edge
        table is append-only like the reference's grown columns."""
        if isinstance(pairs, DataFrame):
            cols = pairs.columns
            add = pairs.select(
                F.col(cols[0]).cast("long").alias("src"),
                F.col(cols[1]).cast("long").alias("dst"),
                (F.col(cols[2]) if len(cols) > 2 else F.lit(1.0))
                .cast("double")
                .alias("weight"),
            )
        else:
            add = self.spark.createDataFrame(
                [
                    (int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0)
                    for p in pairs
                ],
                EDGE_SCHEMA,
            )
        return LinkGraph(
            self.edges.unionByName(add),
            directed=self.directed,
            n=self._n,
            vertices=self._vertices,
        )

    def add_vertices(self, nv: int) -> "LinkGraph":
        """New graph with ``nv`` extra isolated vertices
        (igraph_add_vertices, /root/reference/src/
        type_indexededgelist.c:368-415). Requires an explicit vertex
        count (implicit-0..n-1 id contract)."""
        if nv < 0:
            raise ValueError("cannot add a negative number of vertices")
        n = self.vcount()
        return LinkGraph(self.edges, directed=self.directed, n=n + nv)

    def edge_ids(self) -> DataFrame:
        """(eid, src, dst, weight) with dense edge ids 0..m-1 by
        (src, dst) row order — the positional edge ids the reference
        keeps implicitly (/root/reference/src/type_indexededgelist.c:
        1137 igraph_get_eid's search order). Minted scale-safe via
        plans/ids.py."""
        from xdata_igraph_spark.plans.ids import zip_dense_ids

        return zip_dense_ids(self.edges, ["src", "dst"], out_col="eid").select(
            "eid", "src", "dst", "weight"
        )

    def get_eid(self, a: int, b: int, error: bool = True) -> int:
        """Edge id of (a,b) (igraph_get_eid, /root/reference/src/
        type_indexededgelist.c:1137); undirected matches both
        orientations; -1 (or raise) when absent; smallest id on
        multi-edges."""
        e = self.edge_ids()
        if self.directed:
            hit = e.filter((F.col("src") == int(a)) & (F.col("dst") == int(b)))
        else:
            hit = e.filter(
                ((F.col("src") == int(a)) & (F.col("dst") == int(b)))
                | ((F.col("src") == int(b)) & (F.col("dst") == int(a)))
            )
        row = hit.agg(F.min("eid")).first()
        if row[0] is None:
            if error:
                raise ValueError(f"no edge ({a}, {b})")
            return -1
        return int(row[0])

    def incident(self, v: int, mode: str = "out") -> DataFrame:
        """Edge ids incident to ``v`` → (eid) (igraph_incident,
        /root/reference/src/type_indexededgelist.c:800-834); mode
        out/in/all, undirected = all."""
        e = self.edge_ids()
        v = int(v)
        if not self.directed or mode == "all":
            cond = (F.col("src") == v) | (F.col("dst") == v)
        elif mode == "out":
            cond = F.col("src") == v
        elif mode == "in":
            cond = F.col("dst") == v
        else:
            raise ValueError(f"bad mode {mode!r}")
        return e.filter(cond).select("eid")

    # ---------------- §2.4 filters / subgraphs ----------------

    def subgraph_edges(
        self, pairs: DataFrame, delete_vertices: bool = True
    ) -> "LinkGraph":
        """Keep an edge subset (igraph_subgraph_edges,
        /root/reference/src/structural_properties.c:2038-2160):
        ``delete_vertices=True`` keeps only endpoint vertices (ids NOT
        compacted — renumber() densifies, same contract as
        induced_subgraph); False keeps the whole vertex set."""
        e = self.edges.join(
            pairs.select("src", "dst"), ["src", "dst"], "left_semi"
        )
        if delete_vertices:
            return LinkGraph(e, directed=self.directed)
        return LinkGraph(
            e, directed=self.directed, n=self._n, vertices=self._vertices
        )

    def simplify(
        self,
        remove_loops: bool = True,
        remove_multiple: bool = True,
        combiner: str = "sum",
    ) -> "LinkGraph":
        """Drop self-loops and/or collapse multi-edges (igraph_simplify,
        /root/reference/src/structural_properties.c:2161-2300).

        ``combiner`` is one of the reference's attribute-combination
        vocabulary (/root/reference/include/igraph_attributes.h:128-140)
        restricted to weights: sum|min|max|first|mean|count.
        Undirected edges are first canonicalized to ``src >= dst`` per
        /root/reference/src/type_indexededgelist.c:280-286.
        """
        e = self.edges
        if not self.directed:
            e = e.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
                "weight",
            )
        if remove_loops:
            e = e.filter(F.col("src") != F.col("dst"))
        if remove_multiple:
            agg = {
                "sum": F.sum("weight"),
                "min": F.min("weight"),
                "max": F.max("weight"),
                "first": F.first("weight"),
                "mean": F.avg("weight"),
                "count": F.count("*").cast("double"),
            }[combiner]
            e = e.groupBy("src", "dst").agg(agg.alias("weight"))
        return LinkGraph(e, directed=self.directed, n=self._n, vertices=self._vertices)

    def induced_subgraph(self, vertex_ids: DataFrame | Iterable[int]) -> "LinkGraph":
        """Keep a vertex set + internal edges (igraph_induced_subgraph,
        /root/reference/src/structural_properties.c:1951-2037).
        Vertex ids keep their original values (no compaction) — the
        distributed-friendly contract; renumber() densifies.

        The vertex-set joins are plain semi-joins: Catalyst/AQE
        broadcasts them when the set is actually small; an explicit
        broadcast hint on an arbitrary selection (e.g. "the giant
        component" = most of the graph) would OOM the driver at scale.
        """
        vs = self._as_vertex_df(vertex_ids)
        e = self.edges.join(vs, self.edges.src == vs.id, "left_semi")
        e = e.join(vs, e.dst == vs.id, "left_semi")
        return LinkGraph(e, directed=self.directed, vertices=vs)

    def delete_vertices(self, vertex_ids: DataFrame | Iterable[int]) -> "LinkGraph":
        """Drop vertices + incident edges (igraph_delete_vertices,
        /root/reference/src/type_indexededgelist.c:531-690).

        Anti-joins are unhinted — AQE broadcasts small delete sets,
        shuffles big ones (see induced_subgraph)."""
        vs = self._as_vertex_df(vertex_ids)
        keep = self.vertices().join(vs, "id", "left_anti")
        e = self.edges.join(vs, self.edges.src == vs.id, "left_anti")
        e = e.join(vs, e.dst == vs.id, "left_anti")
        return LinkGraph(e, directed=self.directed, vertices=keep)

    def delete_edges(self, pairs: DataFrame) -> "LinkGraph":
        """Drop an edge set (igraph_delete_edges,
        /root/reference/src/type_indexededgelist.c:416-530)."""
        e = self.edges.join(pairs.select("src", "dst"), ["src", "dst"], "left_anti")
        return LinkGraph(e, directed=self.directed, n=self._n, vertices=self._vertices)

    def renumber(self) -> tuple["LinkGraph", DataFrame]:
        """Compact ids to dense 0..n-1 by ascending old id — the
        old→new map the reference emits from delete_vertices.

        Scale note: the dense rank runs over the *vertex* table only,
        via the range-partition + prefix-offset plan (plans/ids.py) —
        no single-partition window. Returns (graph, mapping(id, new_id)).
        """
        from xdata_igraph_spark.plans.ids import zip_dense_ids

        vs = self.vertices()
        mapping = zip_dense_ids(vs.select("id"), ["id"], out_col="new_id")
        m_src = mapping.select(F.col("id").alias("src"), F.col("new_id").alias("nsrc"))
        m_dst = mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("ndst"))
        e = (
            self.edges.join(m_src, "src")
            .join(m_dst, "dst")
            .select(
                F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "weight"
            )
        )
        newg = LinkGraph(e, directed=self.directed, vertices=mapping.select(F.col("new_id").alias("id")))
        return newg, mapping

    # ---------------- §2.5 set operations ----------------

    def union(self, other: "LinkGraph") -> "LinkGraph":
        """Edges present in ≥1 operand (igraph_union,
        /root/reference/src/operators.c:676-897); simple-graph form."""
        e = self.edges.select("src", "dst").union(other.edges.select("src", "dst")).distinct()
        return LinkGraph(e.withColumn("weight", F.lit(1.0)), directed=self.directed)

    def intersection(self, other: "LinkGraph") -> "LinkGraph":
        """igraph_intersection (/root/reference/src/operators.c:389-675)."""
        e = (
            self.edges.select("src", "dst")
            .distinct()
            .join(other.edges.select("src", "dst").distinct(), ["src", "dst"], "left_semi")
        )
        return LinkGraph(e.withColumn("weight", F.lit(1.0)), directed=self.directed)

    def difference(self, other: "LinkGraph") -> "LinkGraph":
        """igraph_difference (/root/reference/src/operators.c:898-1037)."""
        e = (
            self.edges.select("src", "dst")
            .distinct()
            .join(other.edges.select("src", "dst").distinct(), ["src", "dst"], "left_anti")
        )
        return LinkGraph(e.withColumn("weight", F.lit(1.0)), directed=self.directed)

    def disjoint_union(self, other: "LinkGraph") -> "LinkGraph":
        """Relabel right ids by +n1 and concat (igraph_disjoint_union,
        /root/reference/src/operators.c:38-110)."""
        n1 = self.vcount()
        shifted = other.edges.select(
            (F.col("src") + F.lit(n1)).alias("src"),
            (F.col("dst") + F.lit(n1)).alias("dst"),
            "weight",
        )
        return LinkGraph(
            self.edges.union(shifted),
            directed=self.directed,
            n=n1 + other.vcount(),
        )

    def compose(self, other: "LinkGraph") -> "LinkGraph":
        """Edge (a,c) iff ∃b: (a,b)∈G1 ∧ (b,c)∈G2 (igraph_compose,
        /root/reference/src/operators.c:1114-1260) — a relational
        equi-join."""
        g1 = self.edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        g2 = other.edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        e = (
            g1.join(g2, "b")
            .select(F.col("a").alias("src"), F.col("c").alias("dst"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
        )
        return LinkGraph(e, directed=self.directed)

    def complementer(self, loops: bool = False) -> "LinkGraph":
        """Non-edges (igraph_complementer,
        /root/reference/src/operators.c:1038-1113). O(n²) — test scale
        only; guarded so it is never called on a big vertex set."""
        n = self.vcount()
        if n > 20_000:
            raise ValueError("complementer is O(n^2); refusing n > 20000")
        vs = self.vertices()
        allpairs = vs.select(F.col("id").alias("src")).crossJoin(
            vs.select(F.col("id").alias("dst"))
        )
        if not loops:
            allpairs = allpairs.filter(F.col("src") != F.col("dst"))
        if not self.directed:
            allpairs = allpairs.filter(F.col("src") >= F.col("dst"))
            existing = self.edges.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
        else:
            existing = self.edges.select("src", "dst")
        e = allpairs.join(existing.distinct(), ["src", "dst"], "left_anti")
        return LinkGraph(e.withColumn("weight", F.lit(1.0)), directed=self.directed, n=n)

    # ---------------- §2.6 conversion ----------------

    def to_undirected(self, combiner: str = "sum") -> "LinkGraph":
        """COLLAPSE mode of igraph_to_undirected
        (/root/reference/src/conversion.c:413-721): canonicalize each
        arc to ``src >= dst``, dedup, combine weights."""
        e = self.edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
            "weight",
        )
        g = LinkGraph(e, directed=False, n=self._n, vertices=self._vertices)
        return g.simplify(remove_loops=False, remove_multiple=True, combiner=combiner)

    def to_directed(self, mutual: bool = True) -> "LinkGraph":
        """igraph_to_directed (/root/reference/src/conversion.c:322-412):
        MUTUAL makes two arcs per edge, ARBITRARY keeps the stored one."""
        e = self.edges
        if mutual:
            e = e.union(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            )
        return LinkGraph(e, directed=True, n=self._n, vertices=self._vertices)

    def contract_vertices(self, mapping: DataFrame) -> "LinkGraph":
        """Merge vertices by mapping(id, new_id)
        (igraph_contract_vertices,
        /root/reference/src/structural_properties.c:6215-6300) — the
        community → supergraph step."""
        m_src = mapping.select(F.col("id").alias("src"), F.col("new_id").alias("csrc"))
        m_dst = mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("cdst"))
        e = (
            self.edges.join(m_src, "src")
            .join(m_dst, "dst")
            .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"), "weight")
        )
        return LinkGraph(e, directed=self.directed)

    def get_adjacency(self, max_n: int = 10_000) -> DataFrame:
        """Adjacency counts as a COO table (row, col, n) —
        igraph_get_adjacency's sparse form (/root/reference/src/
        conversion.c:35-269): n = number of parallel arcs (undirected
        graphs count each stored edge for both orientations, loops
        twice on the diagonal, per the reference's BOTH mode).
        Dense-matrix materialization is a pivot away and O(n²) — the
        guard keeps it at test scale like complementer()."""
        if self.vcount() > max_n:
            raise ValueError(
                f"get_adjacency materializes O(n^2) potential cells; "
                f"refusing n > {max_n}"
            )
        e = self.edges
        if not self.directed:
            e = e.union(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            )
        return (
            e.groupBy(F.col("src").alias("row"), F.col("dst").alias("col"))
            .agg(F.count("*").alias("n"))
        )

    def stochastic_edges(self, by: str = "src") -> DataFrame:
        """Row-normalized adjacency (igraph_get_stochastic,
        /root/reference/src/conversion.c:722-900): weight / out-strength.
        This is PageRank's contribution matrix."""
        out = self.edges.groupBy(by).agg(F.sum("weight").alias("_tot"))
        return (
            self.edges.join(out, by)
            .select("src", "dst", (F.col("weight") / F.col("_tot")).alias("p"))
        )

    # ---------------- helpers ----------------

    def _as_vertex_df(self, vertex_ids: DataFrame | Iterable[int]) -> DataFrame:
        if isinstance(vertex_ids, DataFrame):
            return vertex_ids.select(F.col(vertex_ids.columns[0]).alias("id"))
        return self.spark.createDataFrame(
            [(int(v),) for v in vertex_ids], "id long"
        )
