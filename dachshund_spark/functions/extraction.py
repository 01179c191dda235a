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


# Mark the extraction UDFs non-deterministic (they ARE deterministic;
# this is an optimizer fence): a downstream ``explode(outlinks)`` makes
# Catalyst infer ``size(outlinks) > 0 AND isnotnull(outlinks)`` and push
# that filter BELOW the projection, duplicating the ArrowEvalPython node —
# every page then pays html synthesis + Python transfer + regex twice
# (observed as two ArrowEvalPython nodes in the edge-materialization
# plan).  Non-deterministic expressions may not be duplicated or
# reordered, so the plan keeps a single evaluation (spark optimization
# guide §4.4: mark expensive UDFs non-deterministic).
extract_text_udf = extract_text_udf.asNondeterministic()
extract_outlinks_udf = extract_outlinks_udf.asNondeterministic()


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


ANCHOR_TAG_RE = r'<a href="[^"]+">[^<]*</a>'


def anchor_pairs(pages: DataFrame) -> DataFrame:
    """pages (url, html) -> one row per anchor occurrence:
    (url, target, anchor).

    Pure JVM path — decode + regexp_extract_all + explode + two
    regexp_extracts, all inside whole-stage codegen (no pandas batch
    needed: unlike text extraction there is no byte-identical-oracle
    contract here, and the per-tag projection is regular enough for the
    SQL regex engine)."""
    tags = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(ANCHOR_TAG_RE), F.lit(0)
    )
    return pages.select("url", F.explode(tags).alias("tag")).select(
        "url",
        F.regexp_extract("tag", r'<a href="([^"]+)"', 1).alias("target"),
        F.regexp_extract("tag", r">([^<]*)</a>", 1).alias("anchor"),
    )


def anchor_text_index(pages: DataFrame, k: int = 3) -> DataFrame:
    """The classic web-search ranking signal: for every crawled page,
    the top-``k`` incoming anchor terms with occurrence counts —
    (url, term, n, rank), url being the link TARGET.

    Plan shape at crawl scale: one (target, term) groupBy with map-side
    partial aggregation (hub pages receive ~n/n_hubs in-links — exactly
    the hot keys partial agg absorbs), a left-semi join against the
    crawled url set (broadcast-able: it is the url dimension, tiny
    relative to the anchor fan-out), then a per-target window whose
    ``row_number() <= k`` predicate Spark executes as WindowGroupLimit —
    partial top-k BEFORE the exchange, so the final shuffle carries at
    most k rows per (target, partition)."""
    from pyspark.sql import Window

    pairs = anchor_pairs(pages)
    crawled = pages.select(F.col("url").alias("target")).distinct()
    counts = (
        pairs.join(F.broadcast(crawled), "target", "left_semi")
        .groupBy("target", "anchor")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("target").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("target").alias("url"),
            F.col("anchor").alias("term"),
            "n",
            "rank",
        )
    )
