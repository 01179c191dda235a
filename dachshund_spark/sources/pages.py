"""Common-Crawl-style pages table: schema, deterministic synthesis, and
edge materialization (BASELINE.json input_hint).

Schema: (url: string, warc_ts: timestamp, html: binary, text: string,
lang: string).  ``text`` is the *expected* extraction for the
byte-identical invariant; ``html`` embeds the outlinks as anchor tags.

Synthesis is pure DataFrame SQL over ``spark.range`` — no driver-side data,
no python in the row path — so it scales to any page count and is
deterministic given (n_pages, n_sites, seed): re-running any partition
(task retry) reproduces identical bytes.

Link structure is power-law-ish by construction: ``n_hubs`` hub pages
receive ~n/n_hubs in-links each (the hub-vertex skew the salted/AQE paths
must handle), plus 1..7 hash-spread links per page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _url_for(i: Column, n_sites: int) -> Column:
    return F.concat(
        F.lit("https://site"),
        F.pmod(i, F.lit(n_sites)).cast("string"),
        F.lit(".test/page"),
        i.cast("string"),
    )


def synthesize_pages(
    spark: SparkSession,
    n_pages: int,
    n_sites: int = 97,
    n_hubs: int = 16,
    seed: int = 42,
    partitions: int | None = None,
    varied_anchors: bool = False,
) -> DataFrame:
    """Deterministic synthetic pages table (see module docstring).

    ``varied_anchors=False`` (default) keeps every anchor's text as the
    literal ``link`` — the byte-exact fixture all pre-existing gates
    hash.  ``varied_anchors=True`` draws the anchor text from a 40-term
    vocabulary as ``term{(src*17 + dst*29 + seed) % 40}`` — deterministic
    per (src, dst), so anchor-text aggregation queries have a
    pure-python-computable expected output (oracles.anchor_index_rows)."""
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    # 1..7 spread links + 1 hub link, all deterministic arithmetic
    k = (F.pmod(i * (seed + 13), F.lit(7)) + 1).cast("int")
    hub_target = F.pmod(i * 31 + F.lit(seed), F.lit(n_hubs))
    spread_target = lambda j: F.pmod(  # noqa: E731
        i * 2654435761 + (j + 1) * 40503 + F.lit(seed) * 7919, F.lit(n_pages)
    )
    targets = F.array_union(
        F.array(hub_target),
        F.transform(F.sequence(F.lit(1), k), spread_target),
    )
    # drop self-links deterministically
    targets = F.filter(targets, lambda t: t != i)
    text = F.concat(
        F.lit("Page "),
        i.cast("string"),
        F.lit(" body: deterministic crawl text segment "),
        F.pmod(i * 7 + F.lit(seed), F.lit(1000)).cast("string"),
        F.lit("."),
    )
    def _anchor_text(t: Column) -> Column:
        if not varied_anchors:
            return F.lit("link")
        return F.concat(
            F.lit("term"),
            F.pmod(i * 17 + t * 29 + F.lit(seed), F.lit(40)).cast("string"),
        )

    anchors = F.aggregate(
        targets,
        F.lit(""),
        lambda acc, t: F.concat(
            acc,
            F.lit('<a href="'),
            _url_for(t, n_sites),
            F.lit('">'),
            _anchor_text(t),
            F.lit("</a>"),
        ),
    )
    html = F.concat(
        F.lit("<html><head><title>Page "),
        i.cast("string"),
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )
    return df.select(
        _url_for(i, n_sites).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=i))
        .alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )


def url_id(col) -> Column:
    """Stable 64-bit vertex id for a url.  xxhash64 is deterministic across
    tasks/retries/cluster sizes (unlike monotonically_increasing_id)."""
    return F.xxhash64(col)


def url_dim(pages: DataFrame) -> DataFrame:
    """url <-> vertex-id dimension table (the reverse map the reference
    keeps in LineProcessor, line_processor.rs:49-62)."""
    return pages.select("url", url_id(F.col("url")).alias("v"))


def edges_from_extracted(extracted: DataFrame) -> DataFrame:
    """(url, outlinks array<string>) -> (src, dst) edge DataFrame with
    xxhash64 ids; outlinks pointing outside the crawl are dropped via a
    semi-join against the crawled url set (north_star: materialize a
    (src_id, dst_id) edge DataFrame)."""
    crawled = extracted.select(url_id(F.col("url")).alias("dst")).distinct()
    raw = extracted.select(
        url_id(F.col("url")).alias("src"),
        F.explode("outlinks").alias("target"),
    ).select("src", url_id(F.col("target")).alias("dst"))
    return raw.join(crawled, "dst", "left_semi")


def host_of(col) -> Column:
    """Registrable host of a url (the text between the scheme and the
    first path slash).  Pure JVM regexp — stays inside codegen."""
    return F.regexp_extract(col, r"^https?://([^/]+)/", 1)


def host_graph(extracted: DataFrame) -> DataFrame:
    """(url, outlinks) -> host-level link-graph rollup:
    (src_host, dst_host, links, src_pages).

    The standard first aggregation over a Common-Crawl-scale page graph:
    page-level edges are ~10^13 at 10^12 documents, host-level pairs are
    ~10^8 — the rollup is what downstream host-rank / spam analyses read.
    ``links`` counts page-level links (after the in-crawl semi-join the
    page-level edge materialization also applies, pages.py:106-117);
    ``src_pages`` counts distinct linking pages.

    Scale shape: the groupBy key is (src_host, dst_host), whose count
    partials combine map-side, so a hub host pair costs one partial per
    map partition.  count(DISTINCT url) adds Spark's two-phase expand —
    exact here because the gate hashes it; at 10^12 pages swap it for
    approx_count_distinct(url) (same plan minus the expand).
    """
    crawled = extracted.select(F.col("url").alias("target")).distinct()
    pairs = (
        extracted.select("url", F.explode("outlinks").alias("target"))
        .join(crawled, "target", "left_semi")
    )
    return (
        pairs.select(
            host_of(F.col("url")).alias("src_host"),
            host_of(F.col("target")).alias("dst_host"),
            "url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("links"),
            F.countDistinct("url").alias("src_pages"),
        )
    )
