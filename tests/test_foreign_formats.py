"""Round-trip tests for the interchange-format readers/writers
(sources/foreign.py): write with our writer, read back with our
reader, compare edge multisets / directedness / weights; plus
hand-written fixture files exercising format corners."""

from __future__ import annotations

import os

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.sources import foreign

pytest_plugins = []


def _g(spark, directed=True):
    rows = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 0.5), (0, 3, 1.0)]
    return LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed, n=4,
    )


def _edge_set(g):
    return sorted((r["src"], r["dst"], r["weight"]) for r in g.edges.collect())


def test_pajek_roundtrip(spark, tmp_path):
    g = _g(spark)
    p = str(tmp_path / "g.net")
    foreign.write_pajek(g, p)
    g2, labels = foreign.read_pajek(spark, p)
    assert g2.directed
    assert g2.vcount() == 4
    assert _edge_set(g2) == _edge_set(g)
    assert labels.count() == 4


def test_pajek_edgeslist_fixture(spark, tmp_path):
    p = str(tmp_path / "l.net")
    with open(p, "w") as f:
        f.write("*Vertices 4\n1 \"a\"\n2 \"b\"\n3 \"c\"\n4 \"d\"\n")
        f.write("*Edgeslist\n1 2 3\n4 1\n")
    g, labels = foreign.read_pajek(spark, p)
    assert not g.directed
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 2), (3, 0)]
    assert {r["id"]: r["label"] for r in labels.collect()} == {
        0: "a", 1: "b", 2: "c", 3: "d"
    }


def test_gml_roundtrip(spark, tmp_path):
    for directed in (True, False):
        g = _g(spark, directed)
        p = str(tmp_path / f"g{directed}.gml")
        foreign.write_gml(g, p)
        g2 = foreign.read_gml(spark, p)
        assert g2.directed == directed
        assert g2.vcount() == 4
        assert _edge_set(g2) == _edge_set(g)


def test_gml_sparse_ids_fixture(spark, tmp_path):
    p = str(tmp_path / "s.gml")
    with open(p, "w") as f:
        f.write('graph [ directed 1\n node [ id 10 ]\n node [ id 5 ]\n'
                ' edge [ source 10 target 5 value 2.5 ]\n]\n')
    g = foreign.read_gml(spark, p)
    # dense renumber by sorted GML id: 5→0, 10→1
    assert _edge_set(g) == [(1, 0, 2.5)]


def test_graphml_roundtrip(spark, tmp_path):
    g = _g(spark)
    p = str(tmp_path / "g.graphml")
    foreign.write_graphml(g, p)
    g2, names = foreign.read_graphml(spark, p)
    assert g2.directed
    assert g2.vcount() == 4
    assert _edge_set(g2) == _edge_set(g)
    assert names.count() == 4


def test_lgl_roundtrip(spark, tmp_path):
    g = _g(spark, directed=False)
    p = str(tmp_path / "g.lgl")
    foreign.write_lgl(g, p)
    g2, names = foreign.read_lgl(spark, p, directed=False)
    assert not g2.directed
    assert _edge_set(g2) == _edge_set(g)


def test_dimacs_roundtrip(spark, tmp_path):
    g = _g(spark)
    p = str(tmp_path / "g.max")
    foreign.write_dimacs(g, p, source=0, target=2)
    g2, s, t = foreign.read_dimacs(spark, p)
    assert (s, t) == (0, 2)
    assert _edge_set(g2) == _edge_set(g)


def test_dot_and_leda_emit(spark, tmp_path):
    g = _g(spark)
    pd = str(tmp_path / "g.dot")
    foreign.write_dot(g, pd)
    body = open(pd).read()
    assert body.startswith("digraph") and "0 -> 1" in body
    pl = str(tmp_path / "g.leda")
    foreign.write_leda(g, pl)
    body = open(pl).read()
    assert body.startswith("LEDA.GRAPH") and "-1" in body


def test_size_guard(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "big.gml")
    with open(p, "w") as f:
        f.write("graph [ ]")
    monkeypatch.setattr(foreign, "MAX_TEXT_BYTES", 1)
    with pytest.raises(ValueError, match="driver-side"):
        foreign.read_gml(spark, p)


def test_dl_fullmatrix_and_edgelist(spark, tmp_path):
    p = str(tmp_path / "m.dl")
    with open(p, "w") as f:
        f.write("dl n=3 format=fullmatrix\ndata:\n0 2 1\n0 0 0\n1 0 0\n")
    g = foreign.read_dl(spark, p, directed=True)
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == {(0, 1): 2.0, (0, 2): 1.0, (2, 0): 1.0}
    p2 = str(tmp_path / "e.dl")
    with open(p2, "w") as f:
        f.write("DL N=4 FORMAT=EDGELIST1\nDATA:\n1 2 1.5\n3 4\n")
    g2 = foreign.read_dl(spark, p2, directed=True)
    got2 = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert got2 == {(0, 1): 1.5, (2, 3): 1.0}


def _big_path_graph(spark, n=14):
    rows = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    return LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=True, n=n,
    )


def test_graphml_roundtrip_preserves_identity_over_10_vertices(spark, tmp_path):
    # regression: lexicographic minting permuted 'n10' before 'n2'
    g = _big_path_graph(spark)
    p = str(tmp_path / "big.graphml")
    foreign.write_graphml(g, p)
    g2, names = foreign.read_graphml(spark, p)
    assert g2.vcount() == 14
    assert _edge_set(g2) == _edge_set(g)
    assert {r["id"]: r["name"] for r in names.collect()} == {
        i: f"n{i}" for i in range(14)
    }


def test_lgl_roundtrip_preserves_identity_over_10_vertices(spark, tmp_path):
    g = _big_path_graph(spark)
    p = str(tmp_path / "big.lgl")
    foreign.write_lgl(g, p)
    g2, names = foreign.read_lgl(spark, p, directed=True)
    assert _edge_set(g2) == _edge_set(g)


def test_gml_implicit_vertices_for_undeclared_endpoints(spark, tmp_path):
    p = str(tmp_path / "impl.gml")
    with open(p, "w") as f:
        f.write("graph\n[\n  directed 1\n  node\n  [\n    id 5\n  ]\n")
        f.write("  edge\n  [\n    source 5\n    target 9\n  ]\n]\n")
    g = foreign.read_gml(spark, p)
    assert g.vcount() == 2
    assert sorted((r["src"], r["dst"]) for r in g.edges.collect()) == [(0, 1)]


def test_dot_escapes_quotes_and_backslashes(spark, tmp_path):
    g = _g(spark)
    names = spark.createDataFrame(
        [(0, 'say "hi"'), (1, "back\\slash"), (2, "<b>&amp;</b>"), (3, "plain")],
        "id long, name string",
    )
    p = str(tmp_path / "esc.dot")
    foreign.write_dot(g, p, names=names)
    text = open(p).read()
    assert '[label="say \\"hi\\""]' in text
    assert '[label="back\\\\slash"]' in text
    assert "&amp;amp;" not in text and '[label="<b>&amp;</b>"]' in text
