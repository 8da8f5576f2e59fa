"""Size-4 motif census — ESCAPE-style relational counting.

Reference: igraph_motifs_randesu with size=4 on undirected graphs
(/root/reference/src/motifs.c:63-160), isoclass numbering from the
undirected 4-vertex tables (/root/reference/src/topology.c:371-393,
igraph_i_isoclass2_4u): 0 empty, 1 one edge, 2 path+isolate,
3 triangle+isolate, 4 star, 5 two disjoint edges, 6 path P4,
7 paw (tailed triangle), 8 cycle C4, 9 diamond, 10 K4. Like the
reference, disconnected classes (0,1,2,3,5) report NaN and connected
classes report INDUCED subgraph counts.

The reference enumerates connected 4-subgraphs one at a time (ESU
backtracking). That is the wrong shape for a cluster; the published
distributed formulation (Pinar-Seshadhri-Vishal, "ESCAPE: Efficiently
Counting All 5-Vertex Subgraphs", WWW'17) counts *non-induced*
pattern totals from per-vertex / per-edge / per-pair aggregates and
converts to induced counts with a fixed inclusion-exclusion matrix.
Everything here is that plan:

- ``N_star = Σ_v C(d_v,3)``, ``N_paw = Σ_v t_v·(d_v−2)`` — one
  degree/triangle-count aggregate each;
- ``N_path = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3T`` — edge-keyed join with
  the degree table;
- ``N_diamond = Σ_e C(t_e,2)`` — per-edge triangle counts from the
  oriented triangle lister;
- ``N_c4 = ½ Σ_{u<w} C(codeg(u,w),2)`` — codegree pairs via the
  wedge-center self-join (the cocitation plan; hot wedge centers are
  the skew risk — the ESCAPE refinement splits the sum by orientation
  so the dominant term fans out only over out-wedges, bounded by
  degeneracy; at the scales benched here AQE's skew handling covers
  it);
- ``K4`` via the degree-ordered oriented extension join (each 4-clique
  found exactly once from its rank-sorted orientation) — fan-out
  bounded by degeneracy like the triangle counter.

Induced conversion (inverse of the brute-forced copy matrix; every
entry verified against exhaustive enumeration in
tests/test_motifs4.py)::

    k4      = K4
    diamond = N_dia − 6·k4
    c4      = N_c4 − N_dia + 3·k4
    paw     = N_paw − 4·N_dia + 12·k4
    path    = N_path − 2·paw − 4·c4 − 6·diamond − 12·k4
    star    = N_star − paw − 2·diamond − 4·k4

Directed size-4 census (218 isoclasses) is out of scope — documented
in SURVEY.md §2; the directed size-3 census is ``triad_census``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.triangles import (
    _oriented,
    _simple_undirected,
    list_triangles,
)


def motifs_randesu_4(graph: LinkGraph) -> DataFrame:
    """Undirected size-4 induced motif counts → (isoclass, count).

    Row order / numbering matches igraph's undirected 4-vertex
    isoclasses; disconnected classes carry NaN like the reference.
    """
    spark = graph.spark
    simple = _simple_undirected(graph).localCheckpointFlat(eager=True)
    deg = (
        simple.select(F.col("a").alias("id"))
        .union(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
        .localCheckpointFlat(eager=True)
    )

    # stars: sum_v C(d,3)
    n_star = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) * (F.col("d") - 2) / 6).alias("s")
    ).first()["s"]
    n_star = float(n_star or 0.0)

    # triangles, per-vertex and per-edge counts from one listing
    tri = list_triangles(graph).localCheckpointFlat(eager=True)
    t_total = tri.count()

    corners = (
        tri.select(F.col("v1").alias("id"))
        .union(tri.select(F.col("v2").alias("id")))
        .union(tri.select(F.col("v3").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("t"))
    )
    # paws: sum_v t_v * (d_v - 2)
    n_paw_row = (
        corners.join(deg, "id")
        .agg(F.sum(F.col("t") * (F.col("d") - 2)).alias("s"))
        .first()
    )
    n_paw = float(n_paw_row["s"] or 0.0)

    # paths: sum_e (d_u-1)(d_v-1) - 3T  (middle-edge keyed)
    du = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    dv = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    path_row = (
        simple.join(du, "a")
        .join(dv, "b")
        .agg(F.sum((F.col("da") - 1) * (F.col("db") - 1)).alias("s"))
        .first()
    )
    n_path = float(path_row["s"] or 0.0) - 3.0 * t_total

    # diamonds: sum_e C(t_e, 2) over per-edge triangle counts
    tri_edges = (
        tri.select(
            F.greatest("v1", "v2").alias("x"), F.least("v1", "v2").alias("y")
        )
        .union(
            tri.select(
                F.greatest("v1", "v3").alias("x"), F.least("v1", "v3").alias("y")
            )
        )
        .union(
            tri.select(
                F.greatest("v2", "v3").alias("x"), F.least("v2", "v3").alias("y")
            )
        )
        .groupBy("x", "y")
        .agg(F.count("*").alias("te"))
    )
    n_dia_row = tri_edges.agg(
        F.sum(F.col("te") * (F.col("te") - 1) / 2).alias("s")
    ).first()
    n_dia = float(n_dia_row["s"] or 0.0)

    # 4-cycles: half-sum of C(codeg,2) over unordered vertex pairs;
    # codegree via the wedge-center self-join on symmetric adjacency
    adj = simple.select(F.col("a").alias("c"), F.col("b").alias("n")).union(
        simple.select(F.col("b").alias("c"), F.col("a").alias("n"))
    )
    codeg = (
        adj.alias("l")
        .join(adj.alias("r"), F.col("l.c") == F.col("r.c"))
        .filter(F.col("l.n") < F.col("r.n"))
        .groupBy(F.col("l.n").alias("u"), F.col("r.n").alias("w"))
        .agg(F.count("*").alias("cd"))
    )
    n_c4_row = codeg.agg(
        F.sum(F.col("cd") * (F.col("cd") - 1) / 2).alias("s")
    ).first()
    n_c4 = float(n_c4_row["s"] or 0.0) / 2.0

    # K4: triangle (v1<v2<v3 in orientation rank) + common oriented
    # out-neighbor of all three members
    ori = _oriented(graph)
    ext = tri.join(
        ori.select(F.col("lo").alias("v1"), F.col("hi").alias("x")), "v1"
    )
    ext = ext.join(
        ori.select(F.col("lo").alias("v2"), F.col("hi").alias("x")),
        ["v2", "x"],
        "left_semi",
    )
    k4 = float(
        ext.join(
            ori.select(F.col("lo").alias("v3"), F.col("hi").alias("x")),
            ["v3", "x"],
            "left_semi",
        ).count()
    )

    # induced conversion (docstring matrix)
    diamond = n_dia - 6.0 * k4
    c4 = n_c4 - n_dia + 3.0 * k4
    paw = n_paw - 4.0 * n_dia + 12.0 * k4
    path = n_path - 2.0 * paw - 4.0 * c4 - 6.0 * diamond - 12.0 * k4
    star = n_star - paw - 2.0 * diamond - 4.0 * k4

    nan = float("nan")
    rows = [
        (0, nan),
        (1, nan),
        (2, nan),
        (3, nan),
        (4, star),
        (5, nan),
        (6, path),
        (7, paw),
        (8, c4),
        (9, diamond),
        (10, k4),
    ]
    return spark.createDataFrame(rows, "isoclass int, count double")
