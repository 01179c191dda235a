"""anchor_pairs / anchor_text_index (functions/extraction.py) over the
varied-anchor page fixture, plus the default-fixture byte-stability
guarantee the pre-existing gates rely on."""

from pyspark.sql import functions as F

from dachshund_spark.functions.extraction import anchor_pairs, anchor_text_index
from dachshund_spark.oracles import anchor_index_rows, page_targets
from dachshund_spark.sources.pages import synthesize_pages


def test_default_fixture_bytes_unchanged(spark):
    # varied_anchors=False must keep html byte-identical to the
    # pre-parameter fixture: every anchor's text is the literal "link"
    pages = synthesize_pages(spark, n_pages=50, n_sites=7, seed=7)
    got = anchor_pairs(pages).select("anchor").distinct().collect()
    assert [r["anchor"] for r in got] == ["link"]


def test_anchor_pairs_match_link_arithmetic(spark):
    n = 60
    pages = synthesize_pages(
        spark, n_pages=n, n_sites=7, n_hubs=4, seed=7, varied_anchors=True
    )
    got = sorted(
        (r["url"], r["target"], r["anchor"])
        for r in anchor_pairs(pages).collect()
    )
    url = lambda p: f"https://site{p % 7}.test/page{p}"  # noqa: E731
    want = sorted(
        (url(i), url(t), f"term{(i * 17 + t * 29 + 7) % 40}")
        for i in range(n)
        for t in page_targets(i, n, n_hubs=4, seed=7)
    )
    assert got == want


def test_anchor_index_matches_python_mirror(spark):
    n = 200
    pages = synthesize_pages(
        spark, n_pages=n, n_sites=53, n_hubs=16, seed=7, varied_anchors=True
    )
    got = sorted(
        (r["url"], r["term"], r["n"], r["rank"])
        for r in anchor_text_index(pages, k=3).collect()
    )
    assert got == sorted(anchor_index_rows(n))


def test_anchor_index_rank_window_shape(spark):
    # rank is dense 1..k per url, ordered by (n desc, term asc)
    pages = synthesize_pages(
        spark, n_pages=120, n_sites=5, n_hubs=2, seed=7, varied_anchors=True
    )
    out = anchor_text_index(pages, k=2)
    per = out.groupBy("url").agg(
        F.count("*").alias("c"), F.max("rank").alias("mx")
    )
    assert per.filter("c != mx OR mx > 2").count() == 0
