"""Interchange-format readers/writers: Pajek, GML, GraphML, LGL,
DIMACS, DOT, LEDA.

Reference parity: igraph_read_graph_pajek (/root/reference/src/
foreign.c:456), _gml (:1048), _graphml (/root/reference/src/
foreign-graphml.c:1131), _lgl (:304), _dimacs (:657);
igraph_write_graph_pajek (:1995), _gml (:2483), _dot (:2768),
_dimacs (:2380), _leda (:3114), _graphml
(/root/reference/src/foreign-graphml.c:1219), _lgl (:1646).

These are single-file sequential text formats — the reference parses
them with flex/bison lexers on one core; this module parses them on
the driver the same way, guarded by a byte-size cap. They are on-ramps
for interchange with reference tooling, NOT the 100-TB ingest path:
bulk ingest is parquet/Iceberg scans (sources/corpus.py) and the
distributed edgelist/ncol readers (sources/readers.py). Writers
stream edges through ``toLocalIterator`` so the driver never holds
the whole edge set, but output is still one text file by format
definition.

Vertex-id contract: formats with explicit integer ids (Pajek, DIMACS,
GML) keep them (1-based → 0-based; GML's arbitrary integer ids
renumber densely by sorted id). GraphML node names mint dense ids by
FIRST APPEARANCE in the document, matching the reference — these
parsers are driver-side and sequential anyway, and document order is
what makes reading back write_graphml's own n0..n{k} output
identity-preserving for ≥10 vertices, where lexicographic sort would
permute ('n10' < 'n2'). LGL labels mint by NATURAL SORT (digit runs
compare numerically) because neighbor lines mention names before
later '#' headers, so first appearance would permute write_lgl's own
numeric labels. The distributed ncol reader keeps its documented
sorted-name deviation (readers.py).
"""

from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph

MAX_TEXT_BYTES = 256 * 1024 * 1024

_NAT_SPLIT = re.compile(r"(\d+)")


def _natural_key(name: str) -> tuple:
    """Sort key treating digit runs as numbers ('2' before '10')."""
    return tuple(
        (1, int(part)) if part.isdigit() else (0, part)
        for part in _NAT_SPLIT.split(name)
    )


def _slurp(path: str) -> str:
    size = os.path.getsize(path)
    if size > MAX_TEXT_BYTES:
        raise ValueError(
            f"{path} is {size} bytes; interchange-format parsing is "
            f"driver-side and capped at {MAX_TEXT_BYTES} — use the "
            "parquet/edgelist ingest path for bulk data"
        )
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return f.read()


def _edges_df(spark: SparkSession, rows: list[tuple[int, int, float]]) -> DataFrame:
    return spark.createDataFrame(
        rows or [], "src long, dst long, weight double"
    )


# ---------------------------------------------------------------------------
# Pajek
# ---------------------------------------------------------------------------


def read_pajek(spark: SparkSession, path: str) -> tuple[LinkGraph, DataFrame]:
    """Pajek .net → (graph, labels (id, label)). Supports *Vertices,
    *Arcs, *Edges, *Arcslist, *Edgeslist sections; 1-based ids become
    0-based; an *Arcs section makes the graph directed (matching the
    reference's directedness rule)."""
    text = _slurp(path)
    n = 0
    labels: list[tuple[int, str]] = []
    rows: list[tuple[int, int, float]] = []
    directed = False
    section = None
    listmode = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("%"):
            continue
        low = line.lower()
        if low.startswith("*"):
            head = low.split()[0]
            if head == "*vertices":
                section = "vertices"
                n = int(line.split()[1])
            elif head in ("*arcs", "*arcslist"):
                section, directed, listmode = "edges", True, head.endswith("list")
            elif head in ("*edges", "*edgeslist"):
                section, listmode = "edges", head.endswith("list")
            else:
                section = None
            continue
        if section == "vertices":
            m = re.match(r"(\d+)\s+\"([^\"]*)\"|(\d+)\s+(\S+)", line)
            if m:
                if m.group(1) is not None:
                    labels.append((int(m.group(1)) - 1, m.group(2)))
                else:
                    labels.append((int(m.group(3)) - 1, m.group(4)))
        elif section == "edges":
            parts = line.split()
            if listmode:
                s = int(parts[0]) - 1
                rows.extend((s, int(p) - 1, 1.0) for p in parts[1:])
            else:
                w = float(parts[2]) if len(parts) > 2 else 1.0
                rows.append((int(parts[0]) - 1, int(parts[1]) - 1, w))
    g = LinkGraph(_edges_df(spark, rows), directed=directed, n=n or None)
    ldf = spark.createDataFrame(labels or [], "id long, label string")
    return g, ldf


def write_pajek(graph: LinkGraph, path: str, labels: DataFrame | None = None) -> None:
    n = graph.vcount()
    lab = {}
    if labels is not None:
        lab = {r[0]: r[1] for r in labels.collect()}
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"*Vertices {n}\n")
        for i in range(n):
            f.write(f'{i + 1} "{lab.get(i, i)}"\n')
        f.write("*Arcs\n" if graph.directed else "*Edges\n")
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(f"{r[0] + 1} {r[1] + 1} {r[2]:g}\n")


# ---------------------------------------------------------------------------
# GML
# ---------------------------------------------------------------------------

_GML_TOKEN = re.compile(r"\"[^\"]*\"|\[|\]|[^\s\[\]]+")


def read_gml(spark: SparkSession, path: str) -> LinkGraph:
    """GML → graph. Parses the node [ id … ] / edge [ source … target …
    (value|weight) … ] structure plus the directed flag; GML ids may be
    arbitrary integers — they are renumbered densely by sorted id."""
    toks = _GML_TOKEN.findall(_slurp(path))
    pos = 0

    def parse_block() -> list:
        nonlocal pos
        items = []
        while pos < len(toks):
            t = toks[pos]
            if t == "]":
                pos += 1
                return items
            key = t
            pos += 1
            if pos < len(toks) and toks[pos] == "[":
                pos += 1
                items.append((key.lower(), parse_block()))
            else:
                items.append((key.lower(), toks[pos].strip('"')))
                pos += 1
        return items

    top = parse_block()
    graph_block = None
    for k, v in top:
        if k == "graph" and isinstance(v, list):
            graph_block = v
    if graph_block is None:
        raise ValueError("no graph [ ... ] block in GML input")
    directed = False
    ids: list[int] = []
    raw_edges: list[tuple[int, int, float]] = []
    for k, v in graph_block:
        if k == "directed":
            directed = v == "1"
        elif k == "node" and isinstance(v, list):
            d = dict(v)
            ids.append(int(d["id"]))
        elif k == "edge" and isinstance(v, list):
            d = dict(v)
            w = float(d.get("value", d.get("weight", 1.0)))
            raw_edges.append((int(d["source"]), int(d["target"]), w))
    # edge endpoints with no node block get vertices implicitly, like
    # the reference's GML reader (was a bare KeyError)
    domain = set(ids)
    for s, t, _w in raw_edges:
        domain.add(s)
        domain.add(t)
    remap = {gid: i for i, gid in enumerate(sorted(domain))}
    rows = [(remap[s], remap[t], w) for s, t, w in raw_edges]
    return LinkGraph(_edges_df(spark, rows), directed=directed, n=len(remap))


def write_gml(graph: LinkGraph, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("graph\n[\n")
        f.write(f"  directed {1 if graph.directed else 0}\n")
        for i in range(graph.vcount()):
            f.write(f"  node\n  [\n    id {i}\n  ]\n")
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(
                f"  edge\n  [\n    source {r[0]}\n    target {r[1]}\n"
                f"    value {r[2]:g}\n  ]\n"
            )
        f.write("]\n")


# ---------------------------------------------------------------------------
# GraphML
# ---------------------------------------------------------------------------

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


def read_graphml(spark: SparkSession, path: str) -> tuple[LinkGraph, DataFrame]:
    """GraphML → (graph, names (id, name)). Reads the first <graph>,
    its edgedefault directedness, and a numeric edge <data> keyed by an
    attr.name="weight" <key> if present."""
    _slurp(path)  # size guard
    tree = ET.parse(path)
    root = tree.getroot()

    def tag(t):
        return f"{{{_GRAPHML_NS}}}{t}" if root.tag.startswith("{") else t

    weight_keys = {
        k.get("id")
        for k in root.iter(tag("key"))
        if k.get("attr.name") == "weight" and k.get("for", "edge") == "edge"
    }
    gelem = next(iter(root.iter(tag("graph"))), None)
    if gelem is None:
        raise ValueError("no <graph> element in GraphML input")
    directed = gelem.get("edgedefault", "undirected") == "directed"
    # number symbols by first appearance (document order), matching the
    # reference — lexicographic sort permuted identity on round-trips
    # with write_graphml's n0..n{k} names once the graph had ≥10 nodes
    remap: dict[str, int] = {}
    for nd in gelem.iter(tag("node")):
        nm = nd.get("id")
        if nm not in remap:
            remap[nm] = len(remap)
    rows = []
    for e in gelem.iter(tag("edge")):
        w = 1.0
        for d in e.iter(tag("data")):
            if d.get("key") in weight_keys and d.text:
                w = float(d.text)
        for ep in (e.get("source"), e.get("target")):
            if ep not in remap:
                remap[ep] = len(remap)
        rows.append((remap[e.get("source")], remap[e.get("target")], w))
    names = list(remap)
    g = LinkGraph(_edges_df(spark, rows), directed=directed, n=len(names))
    ndf = spark.createDataFrame(
        [(i, nm) for nm, i in remap.items()], "id long, name string"
    )
    return g, ndf


def write_graphml(graph: LinkGraph, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<graphml xmlns="{_GRAPHML_NS}">\n')
        f.write(
            '  <key id="w" for="edge" attr.name="weight" attr.type="double"/>\n'
        )
        ed = "directed" if graph.directed else "undirected"
        f.write(f'  <graph id="G" edgedefault="{ed}">\n')
        for i in range(graph.vcount()):
            f.write(f'    <node id="n{i}"/>\n')
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(
                f'    <edge source="n{r[0]}" target="n{r[1]}">'
                f'<data key="w">{r[2]:g}</data></edge>\n'
            )
        f.write("  </graph>\n</graphml>\n")


# ---------------------------------------------------------------------------
# LGL
# ---------------------------------------------------------------------------


def read_lgl(
    spark: SparkSession, path: str, directed: bool = False
) -> tuple[LinkGraph, DataFrame]:
    """LGL → (graph, names): ``# vertex`` header lines, each followed by
    its neighbor lines (optionally weighted)."""
    cur = None
    # natural-sort numbering: digit runs compare numerically, so
    # write_lgl's default numeric labels round-trip identically at any
    # size (plain lexicographic put '10' before '2'; first-appearance
    # does not work here because neighbor lines mint names before
    # later '#' headers)
    name_rows: set[str] = set()
    rows: list[tuple[str, str, float]] = []
    for raw in _slurp(path).splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("#"):
            cur = line[1:].strip()
            name_rows.add(cur)
            continue
        if cur is None:
            raise ValueError("LGL neighbor line before any '# vertex' header")
        parts = line.split()
        w = float(parts[1]) if len(parts) > 1 else 1.0
        name_rows.add(parts[0])
        rows.append((cur, parts[0], w))
    remap = {nm: i for i, nm in enumerate(sorted(name_rows, key=_natural_key))}
    erows = [(remap[a], remap[b], w) for a, b, w in rows]
    g = LinkGraph(_edges_df(spark, erows), directed=directed, n=len(remap))
    ndf = spark.createDataFrame(
        [(i, nm) for nm, i in remap.items()], "id long, name string"
    )
    return g, ndf


def write_lgl(graph: LinkGraph, path: str, names: DataFrame | None = None) -> None:
    lab = {}
    if names is not None:
        lab = {r[0]: r[1] for r in names.collect()}
    with open(path, "w", encoding="utf-8") as f:
        cur = None
        it = (
            graph.edges.select("src", "dst", "weight")
            .orderBy("src", "dst")
            .toLocalIterator()
        )
        for r in it:
            if r[0] != cur:
                cur = r[0]
                f.write(f"# {lab.get(cur, cur)}\n")
            f.write(f"{lab.get(r[1], r[1])} {r[2]:g}\n")


# ---------------------------------------------------------------------------
# DIMACS max-flow
# ---------------------------------------------------------------------------


def read_dimacs(
    spark: SparkSession, path: str
) -> tuple[LinkGraph, int | None, int | None]:
    """DIMACS max-flow → (graph, source, target): ``p max n m`` header,
    ``n v s|t`` terminals, ``a u v cap`` arcs (capacity → weight);
    1-based ids become 0-based."""
    n = 0
    source = target = None
    rows: list[tuple[int, int, float]] = []
    for raw in _slurp(path).splitlines():
        line = raw.strip()
        if not line or line.startswith("c"):
            continue
        parts = line.split()
        if parts[0] == "p":
            n = int(parts[2])
        elif parts[0] == "n":
            if parts[2] == "s":
                source = int(parts[1]) - 1
            else:
                target = int(parts[1]) - 1
        elif parts[0] == "a":
            rows.append((int(parts[1]) - 1, int(parts[2]) - 1, float(parts[3])))
    g = LinkGraph(_edges_df(spark, rows), directed=True, n=n or None)
    return g, source, target


def write_dimacs(graph: LinkGraph, path: str, source: int, target: int) -> None:
    n, m = graph.vcount(), graph.ecount()
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"p max {n} {m}\n")
        f.write(f"n {source + 1} s\n")
        f.write(f"n {target + 1} t\n")
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(f"a {r[0] + 1} {r[1] + 1} {r[2]:g}\n")


# ---------------------------------------------------------------------------
# DOT / LEDA (writers only, like the reference)
# ---------------------------------------------------------------------------


def _dot_escape(s: str) -> str:
    """DOT quoted-string escaping: backslash-escape backslashes and
    double quotes (XML entity escaping rendered literally in DOT and
    left '\"' unescaped — invalid output)."""
    return s.replace("\\", "\\\\").replace('"', '\\"')


def write_dot(graph: LinkGraph, path: str, names: DataFrame | None = None) -> None:
    lab = {}
    if names is not None:
        lab = {r[0]: _dot_escape(str(r[1])) for r in names.collect()}
    arrow = "->" if graph.directed else "--"
    with open(path, "w", encoding="utf-8") as f:
        f.write(("digraph" if graph.directed else "graph") + " G {\n")
        for i in range(graph.vcount()):
            f.write(f'  {i} [label="{lab.get(i, i)}"];\n')
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(f"  {r[0]} {arrow} {r[1]} [weight={r[2]:g}];\n")
        f.write("}\n")


def write_leda(graph: LinkGraph, path: str) -> None:
    n, m = graph.vcount(), graph.ecount()
    with open(path, "w", encoding="utf-8") as f:
        f.write("LEDA.GRAPH\nstring\ndouble\n")
        f.write(f"{-1 if graph.directed else -2}\n")
        f.write(f"{n}\n")
        for i in range(n):
            f.write(f"|{{{i}}}|\n")
        f.write(f"{m}\n")
        for r in graph.edges.select("src", "dst", "weight").toLocalIterator():
            f.write(f"{r[0] + 1} {r[1] + 1} 0 |{{{r[2]:g}}}|\n")


# ---------------------------------------------------------------------------
# UCINET DL
# ---------------------------------------------------------------------------


def read_dl(spark: SparkSession, path: str, directed: bool = True) -> LinkGraph:
    """UCINET DL → graph (igraph_read_graph_dl,
    /root/reference/src/foreign.c:2977). Supports the two formats the
    reference's lexer handles in practice: ``fullmatrix`` (default —
    n×n numbers after ``data:``) and ``edgelist1`` (``from to
    [weight]`` rows, 1-based). Case-insensitive keywords; ``n=``
    required."""
    text = _slurp(path)
    header_m = re.search(r"dl\b(.*?)(?:^|\n)\s*data\s*:", text,
                         re.IGNORECASE | re.DOTALL)
    if header_m is None:
        raise ValueError("no 'dl ... data:' header in DL input")
    header = header_m.group(1)
    nm = re.search(r"n\s*[=:]\s*(\d+)", header, re.IGNORECASE)
    if nm is None:
        raise ValueError("DL header missing n=")
    n = int(nm.group(1))
    fm = re.search(r"format\s*[=:]\s*(\S+)", header, re.IGNORECASE)
    fmt = (fm.group(1).lower() if fm else "fullmatrix")
    body = text[header_m.end():]
    nums = body.split()
    rows: list[tuple[int, int, float]] = []
    if fmt.startswith("fullmatrix"):
        vals = [float(x) for x in nums]
        if len(vals) != n * n:
            raise ValueError(f"fullmatrix body has {len(vals)} values, want {n * n}")
        for i in range(n):
            for j in range(n):
                w = vals[i * n + j]
                if w != 0 and (directed or i <= j):
                    rows.append((i, j, w))
    elif fmt.startswith("edgelist1"):
        i = 0
        lines = [ln.split() for ln in body.splitlines() if ln.strip()]
        for parts in lines:
            w = float(parts[2]) if len(parts) > 2 else 1.0
            rows.append((int(parts[0]) - 1, int(parts[1]) - 1, w))
    else:
        raise ValueError(f"unsupported DL format {fmt!r}")
    return LinkGraph(_edges_df(spark, rows), directed=directed, n=n)


# ---------------------------------------------------------------------------
# graphdb (binary, ARG isomorphism-benchmark database)
# ---------------------------------------------------------------------------


def read_graphdb(
    spark: SparkSession, path: str, directed: bool = False
) -> LinkGraph:
    """Read the binary "graph database" format used by the ARG
    isomorphism benchmarks — igraph_read_graph_graphdb
    (/root/reference/src/foreign.c:921).

    The file is a sequence of 16-bit little-endian words: the vertex
    count, then per vertex its out-edge count followed by that many
    0-based target ids. Unlabelled graphs only; a short file is an
    error ("Truncated graphdb file"), matching the reference.
    """
    size = os.path.getsize(path)
    if size > MAX_TEXT_BYTES:
        raise ValueError(
            f"{path} is {size} bytes; interchange-format parsing is "
            f"driver-side and capped at {MAX_TEXT_BYTES}"
        )
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 2 or len(data) % 2:
        raise ValueError("Truncated graphdb file")
    words = struct.unpack(f"<{len(data) // 2}H", data)
    n = words[0]
    pos = 1
    rows: list[tuple[int, int, float]] = []
    for i in range(n):
        if pos >= len(words):
            raise ValueError("Truncated graphdb file")
        deg = words[pos]
        pos += 1
        if pos + deg > len(words):
            raise ValueError("Truncated graphdb file")
        for j in range(deg):
            tgt = int(words[pos + j])
            if tgt >= n:
                raise ValueError(
                    f"graphdb edge target {tgt} >= vertex count {n} "
                    f"(invalid file; the reference errors likewise)"
                )
            rows.append((i, tgt, 1.0))
        pos += deg
    return LinkGraph(_edges_df(spark, rows), directed=directed, n=n)


def write_graphdb(graph: LinkGraph, path: str) -> None:
    """Write the 16-bit binary graphdb format (round-trip counterpart
    of :func:`read_graphdb`; the reference has no writer — provided so
    fixtures can be produced without external data)."""
    n = graph.vcount()
    if n > 0xFFFF:
        raise ValueError("graphdb words are 16-bit; |V| must be < 65536")
    adj: dict[int, list[int]] = {}
    for r in graph.edges.select("src", "dst").toLocalIterator():
        adj.setdefault(int(r[0]), []).append(int(r[1]))
    out = [n]
    for i in range(n):
        targets = sorted(adj.get(i, []))
        out.append(len(targets))
        out.extend(targets)
    with open(path, "wb") as f:
        f.write(struct.pack(f"<{len(out)}H", *out))
