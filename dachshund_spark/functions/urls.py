"""URL canonicalization — the normalization pass a web-scale link-graph
pipeline runs before url-keyed dedup / vertex-id assignment
(sources/pages.py:url_id), so `HTTPS://Site0.TEST/page1#frag` and
`https://site0.test/page1?utm_source=feed` collapse to one vertex.

All steps are codegen'd JVM-side expressions (regexp_replace /
regexp_extract / lower) — no Python in the path, safe inside a
10^12-row extraction stage.  The rule set is the conservative core every
crawler agrees on (RFC 3986 §6 syntax-based normalization plus the
universal utm_* tracking-param strip):

1. scheme and host lowercased (path/query case preserved);
2. default ports dropped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. ``utm_*`` query parameters dropped; an emptied query string loses
   its ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority — everything before the first '/' after the '//'
_HEAD = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonicalize_url(col) -> Column:
    """Canonical form of a URL column (see module docstring).  Pure
    expression — Catalyst keeps it inside WholeStageCodegen."""
    u = F.col(col) if isinstance(col, str) else col
    # 1. lowercase scheme://host, keep the rest byte-identical
    head = F.lower(F.regexp_extract(u, _HEAD, 1))
    tail = F.regexp_replace(u, _HEAD, "")
    u = F.concat(head, tail)
    # 2. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", r"$1")
    # 3. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 4. utm_* params (with their trailing separator), then an orphaned
    # trailing '?'/'&' left by the strip
    u = F.regexp_replace(u, r"utm_[^&#]*&", "")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    return u
