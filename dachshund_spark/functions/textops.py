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

from pyspark.sql import Column, DataFrame
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
