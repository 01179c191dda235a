"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, language ID, quality scoring,
fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no UDFs — and every operator has an ANSI-SQL
equivalent registered in ``__spark_entry__.oracle_sql`` so DuckDB can
verify it value-for-value.  The only hash primitive used is md5, which is
bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (standalone-word regexes);
# deliberately small + deterministic so the SQL mirror is byte-equal
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|que|pour|dans|une)\b",
    "es": r"\b(el|la|los|las|y|es|que|para|con)\b",
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order

STOPWORD_RE = LANG_MARKERS["en"]
PUNCT_RE = r"[.!?,;:]"


def token_count_col(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


# BPE-ish pre-tokenizer regex (GPT-2 style, restricted to syntax RE2 and
# Java regex agree on — no lookahead/backrefs): contraction suffixes,
# optionally space-prefixed letter runs, digit runs, and punctuation runs.
# Pure-whitespace runs are skipped, not counted.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """Token counts under a BPE-ish pre-tokenizer regex next to the plain
    whitespace count — the cheap budget estimator a pretraining pipeline
    runs before the real tokenizer.  Pure SQL expressions (JVM regex
    engine, whole-stage codegen), no UDFs."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias(
            "n_bpe_tokens"
        ),
        token_count_col(F.col("text")).alias("n_ws_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, token count, punctuation ratio,
    stopword ratio, mean token length — the standard cheap filters in a
    pretraining data pipeline."""
    text = F.col("text")
    n_tokens = token_count_col(text)
    n_punct = F.regexp_count(text, F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(text), F.lit(STOPWORD_RE))
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        F.round(
            F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID with deterministic tie-break (marker
    count desc, then LANG_ORDER).  Emits the predicted language and the
    winning marker count."""
    lower = F.lower(F.col("text"))
    counts = [
        F.regexp_count(lower, F.lit(LANG_MARKERS[lang])).alias(f"c_{lang}")
        for lang in LANG_ORDER
    ]
    scored = docs.select("doc_id", *counts)
    best = F.greatest(*[F.col(f"c_{lang}") for lang in LANG_ORDER])
    pred = F.when(F.col(f"c_{LANG_ORDER[0]}") == best, F.lit(LANG_ORDER[0]))
    for lang in LANG_ORDER[1:]:
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("marker_count"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (the exact-dedup key)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id", F.md5(F.encode(normalized, "UTF-8")).alias("fingerprint")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character ``k``-gram of the
    whitespace-normalized lowercased text, slide a guarantee window of
    ``window`` consecutive k-gram hashes, and keep the minimum of each
    window.  The distinct minima are the document's fingerprint set — any
    shared substring of length >= k + window - 1 between two documents is
    guaranteed to produce at least one shared fingerprint, which is what
    makes this the standard plagiarism / near-dup sketch.

    Plan shape (deliberate): positions are EXPLODED to rows so the
    per-k-gram md5 runs inside whole-stage codegen — the array
    higher-order-function form (transform + md5 in a lambda) drops the
    projection out of codegen and evaluates interpreted per element,
    measured ~0.27 ms/k-gram (300× slower than codegen'd md5-per-row).
    The window minima then come from one SQL window function partitioned
    by doc_id, and the final digest groupBy reuses that exact partitioning
    — Catalyst plans a SINGLE exchange for the whole operator.  Everything
    is linear in total text length; at 100 TB it is scan → codegen'd
    hash → one hash-partitioned shuffle of (doc_id, 16-byte hash) rows.
    (A byte-level engine would use a rolling Rabin hash to share work
    between adjacent k-grams; here the per-k-gram hash is one codegen'd
    md5 per row, same O(len) asymptotics per document.)

    Output: one row per document that has at least one fingerprint
    (len(norm) >= k + window - 1): (doc_id, n_fingerprints,
    fingerprint_digest) where the digest is md5 over the sorted distinct
    minima — a stable set hash that two near-duplicate documents share iff
    their fingerprint sets are identical.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    n_pos = F.length("norm") - k + 1  # k-gram positions
    base = docs.select(
        "doc_id", norm.alias("norm"), n_pos.alias("p")
    ).filter(F.col("p") >= window)  # need >= 1 full guarantee window
    pos = base.select(
        "doc_id",
        "p",
        F.explode(F.sequence(F.lit(1), F.col("p"))).alias("i"),
        F.col("norm"),
    ).select(
        "doc_id",
        "p",
        "i",
        F.substring(
            F.md5(F.encode(F.col("norm").substr(F.col("i"), F.lit(k)), "UTF-8")),
            1,
            16,
        ).alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, window - 1)
    winmin = pos.select(
        "doc_id", "i", "p", F.min("h").over(win).alias("wmin")
    ).filter(F.col("i") <= F.col("p") - window + 1)
    return winmin.groupBy("doc_id").agg(
        F.size(F.collect_set("wmin")).alias("n_fingerprints"),
        F.md5(
            F.encode(
                F.concat_ws("", F.sort_array(F.collect_set("wmin"))), "UTF-8"
            )
        ).alias("fingerprint_digest"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` terms per document: (doc_id, term, tf, df, tfidf, rank).

    The per-doc term selection a pretraining pipeline uses for topic /
    boilerplate profiling.  Ranking is by the EXACT integer key
    (tf DESC, df ASC, term ASC) — the tf-idf ordering restated without
    floats, so Spark and any SQL engine rank identically (a float-score
    ordering would be hostage to last-ulp ln() differences between
    libm implementations on near-ties).  The float ``tfidf`` column
    (smoothed: tf * (ln((1+N)/(1+df)) + 1)) is display/score output,
    rounded to 6 so the ≤1-ulp ln() drift cannot surface.

    Plan shape: one explode + (doc_id, term) groupBy for tf, a term-level
    groupBy for df — small (vocabulary-sized), broadcast back — one
    one-row count for N, and a per-doc window over ≤ distinct-terms rows.
    Everything is built-in SQL expressions inside codegen; no UDFs.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + 1),
                6,
            ).alias("tfidf"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide most frequent word ``n``-grams: (ngram, n_occurrences),
    top ``k`` by (count DESC, ngram ASC) — exact integer/string ordering,
    fully deterministic across engines.

    The boilerplate / contamination detector of a training-data pipeline.
    Tokens come from one posexplode; n-grams from ``lead`` windows over
    (doc_id, pos) — no HOF lambdas (array-lambda transforms drop out of
    whole-stage codegen; see doc_winnow_fingerprints' plan note), no
    self-joins.  The per-doc window and the groupBy both hash-partition
    on different keys, so the plan is two shuffles + the final top-k —
    at 100 TB the groupBy's map-side partial aggregation bounds the
    shuffle by the distinct-ngram count per partition, not the token
    count.
    """
    if n < 2:
        raise ValueError("top_ngrams: n must be >= 2")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [
        F.lead("term", i).over(w) for i in range(1, n)
    ]
    grams = tok.select(
        F.concat_ws(" ", *parts).alias("ngram"),
        parts[-1].isNotNull().alias("complete"),
    ).filter("complete")
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", Table A1's repetition filters) per document:

    - ``top_2gram_frac`` / ``top_3gram_frac`` — fraction of non-space
      characters covered by all occurrences of the single most frequent
      word 2-gram / 3-gram (ties broken lexicographically);
    - ``dup_5gram_frac`` — fraction of non-space characters covered by
      occurrences of 5-grams that appear more than once.

    Character coverage is occurrence-weighted (count × non-space chars of
    the n-gram) over the document's total non-space characters — a
    documented simplification of the paper's position-set union (overlap
    positions count once there); both sides of the gate implement THIS
    definition, and the filter thresholds it feeds are calibrated to it.

    Plan shape: one posexplode, ONE per-doc ordered window producing the
    2/3/5-gram columns via ``lead`` (no HOF lambdas — those drop out of
    whole-stage codegen, see winnow_fingerprints), an inline explode to
    long (n, gram) form, one (doc_id, n, gram) count aggregate, one
    (doc_id, n) roll-up, and a conditional-aggregation pivot back to one
    row per doc.  Both groupBys hash-partition on doc_id-prefixed keys,
    so at 100 TB the shuffles are bounded by distinct n-grams per doc,
    with map-side partial aggregation doing the heavy fold.
    """
    base = docs.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"\s+", "")).alias("ns_chars"),
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # window projection FIRST, generator in a separate select — Catalyst
    # rejects window expressions that end up inside a generator's child
    # filter otherwise (UNSUPPORTED_EXPR_FOR_OPERATOR)
    led = tok.select(
        "doc_id",
        "term",
        *[F.lead("term", i).over(w).alias(f"t{i}") for i in range(1, 5)],
    )
    leads = [F.col("term")] + [F.col(f"t{i}") for i in range(1, 5)]
    grams = led.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"),
                        F.when(
                            leads[n - 1].isNotNull(),
                            F.concat_ws(" ", *leads[:n]),
                        ).alias("gram"),
                    )
                    for n in (2, 3, 5)
                ]
            )
        ).alias("g"),
    ).select("doc_id", "g.n", "g.gram").filter(F.col("gram").isNotNull())
    counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    gram_chars = F.length(F.replace("gram", F.lit(" "), F.lit("")))
    per_n = counts.groupBy("doc_id", "n").agg(
        # most frequent gram: min(struct(-cnt, gram)) = (count DESC,
        # gram ASC); its covered chars = cnt * non-space gram length
        F.min(F.struct((-F.col("cnt")).alias("nc"), "gram")).alias("top"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * gram_chars).otherwise(0)
        ).alias("dup_chars"),
    )
    top_chars = (-F.col("top.nc")) * F.length(
        F.replace("top.gram", F.lit(" "), F.lit(""))
    )
    pivoted = per_n.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, top_chars)).alias("t2"),
        F.max(F.when(F.col("n") == 3, top_chars)).alias("t3"),
        F.max(F.when(F.col("n") == 5, F.col("dup_chars"))).alias("d5"),
    )
    frac = lambda c: F.round(  # noqa: E731
        F.coalesce(c, F.lit(0)) / F.greatest("ns_chars", F.lit(1)), 6
    )
    return base.join(pivoted, "doc_id", "left").select(
        "doc_id",
        frac(F.col("t2")).alias("top_2gram_frac"),
        frac(F.col("t3")).alias("top_3gram_frac"),
        frac(F.col("d5")).alias("dup_5gram_frac"),
    )


def floor_log2(n: Column) -> Column:
    """floor(log2(n)) for integer n >= 1 via binary-string length —
    exact integer arithmetic (no transcendentals), so Spark and any SQL
    engine agree bit-for-bit (DuckDB mirror: length(to_base(n, 2)) - 1)."""
    return (F.length(F.conv(n.cast("string"), 10, 2)) - 1).cast("bigint")


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document quantized surprisal under a corpus unigram LM:
    (doc_id, n_tokens, sum_bits, mean_millibits).

    The LM-quality proxy a pretraining pipeline runs when a real LM is
    too expensive: rare-token-heavy documents (gibberish, codes, OCR
    noise) score high, common-prose documents low.  Each token's cost is
    the INTEGER bit count ``floor(log2(N)) - floor(log2(count(term)))``
    (N = corpus token total) — log2(1/p) quantized to whole bits, so the
    whole computation is exact integer arithmetic end to end: no libm
    log(), no float accumulation order, no rounding ties.  The per-doc
    mean is reported as ``mean_millibits = sum_bits * 1000 DIV n_tokens``
    (integer floor division), again exact in every engine.

    Plan shape: one explode + (doc_id, term) groupBy for per-doc tf; a
    vocabulary-sized term groupBy (map-side combinable) broadcast back;
    one one-row total; then a per-doc re-aggregate of <= distinct-term
    rows.  Everything is built-in SQL expressions inside whole-stage
    codegen; no UDFs.  At 100 TB the vocabulary rollup is the only
    global state and is heavy-tail-friendly (partial aggregation absorbs
    hot terms map-side); if the vocabulary outgrows a broadcast, the
    join degrades gracefully to a shuffle on ``term``.

    Blank documents have no tokens and are absent from the output (a
    pipeline filters them with the length gate, not the LM gate).
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("n"))
    total = counts.agg(F.sum("n").alias("total_n"))
    bits = floor_log2(F.col("total_n")) - floor_log2(F.col("n"))
    return (
        tf.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "tf", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("bits")).alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_bits",
            F.expr("sum_bits * 1000L DIV n_tokens").alias("mean_millibits"),
        )
    )
