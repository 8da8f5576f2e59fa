"""HTML text/link extraction — vectorized Arrow pandas UDFs.

The north-rule per-row invariant (BASELINE.json input_hint): for every
url, ``extract_text(html)`` must be **byte-identical** to the corpus's
``text`` column. The extraction spec (FIXTURES.md §1):

1. decode ``html`` as UTF-8;
2. text := remove every ``<...>`` tag (regex ``<[^>]*>`` → ""), then
   collapse each run of ``[ \\t\\r\\n]+`` to a single space, then strip
   leading/trailing spaces (no entity decoding);
3. links := ``href`` values of ``<a `` tags in document order (regex
   ``<a href="([^"]*)">``), keeping only http(s) URLs, with the
   ``#fragment`` stripped, no other normalization.

``extract_links`` (the ingest hot path) is a pure JVM column
expression — no Python boundary at all. ``extract_text`` remains an
Arrow pandas UDF (vectorized series ops, no per-row Python beyond the
regex engine), per the input_hint's "no per-row Python" mandate; it is
the one demonstration Python path and sits on no benchmarked query.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n]+")
_HREF_RE = re.compile(r'<a href="([^"]*)">')
_HTTP_RE = re.compile(r"^https?://")


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """binary html → extracted text (byte-identity contract above)."""
    s = html.apply(lambda b: b.decode("utf-8") if b is not None else None)
    s = s.str.replace(_TAG_RE, "", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip(" ")


def _links_of(b: bytes | None) -> list[str] | None:
    """Python reference implementation of spec step 3 (kept as the
    test oracle for the JVM expression below)."""
    if b is None:
        return None
    out = []
    for href in _HREF_RE.findall(b.decode("utf-8")):
        if _HTTP_RE.match(href):
            out.append(href.split("#", 1)[0])
    return out


def extract_links(html) -> "F.Column":
    """binary html → href values in document order (spec step 3).

    Pure JVM column expression (regexp_extract_all + array
    higher-order functions) — r6 replaced the per-row pandas UDF: link
    extraction is on the ingest hot path for every page, and the
    builtin keeps the whole extract→explode→join pipeline inside the
    JVM with column pruning intact (optimization guide §4.1: prefer
    builtins; an opaque UDF over ``html`` also blocked pushdown).
    Semantics are unchanged on valid UTF-8 input and pinned by
    tests/test_corpus_pipeline.py against ``_links_of``: same regex,
    document order, http(s)-only, ``#fragment`` stripped
    (``substring_index(u, '#', 1)`` == ``u.split('#', 1)[0]``).
    """
    col = F.col(html) if isinstance(html, str) else html
    hrefs = F.regexp_extract_all(
        F.decode(col, "UTF-8"), F.lit(r'<a href="([^"]*)">'), 1
    )
    kept = F.filter(hrefs, lambda u: u.rlike("^https?://"))
    return F.transform(kept, lambda u: F.substring_index(u, "#", 1))
