"""PII detection / redaction over a text column — the scrubbing pass an
LLM training-data pipeline runs before tokenization (emails, phone
numbers, IPv4 addresses replaced with typed placeholder tags).

Everything is JVM-side codegen'd regexp expressions — zero UDFs, so the
pass fuses into whole-stage codegen with whatever projection precedes it
and scales linearly with corpus bytes (the 100 TB shape: a mapper-only
pass, no shuffle at all).

Pattern notes (chosen to mean the same thing in Java regex and RE2, so a
DuckDB oracle can replay them verbatim):

- no lookahead/lookbehind/backreferences (RE2 has none);
- greedy quantifiers over disjoint character classes only — leftmost
  match + greedy extension are identical under Java's backtracking and
  RE2's automaton for this pattern class;
- redaction ORDER is part of the contract (email, then phone, then ipv4)
  and counts are taken on the ORIGINAL text, so overlapping matches
  resolve the same way everywhere.

The reference engine has no text family; this extends the graft's
webtext side (SURVEY §2 additions: quality scoring, lang-ID) with the
redaction step those pipelines sit next to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

_TAGS = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def redacted_text(col: Column | str) -> Column:
    """Text with every email, then phone, then IPv4 match replaced by its
    placeholder tag (application order matters: an email's host part can
    contain an IPv4-shaped substring, so emails collapse first)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, tag in _TAGS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(tag))
    return out


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII inventory + redaction:
    (id, n_emails, n_phones, n_ipv4, redacted_md5) — counts on the raw
    text, md5 over the redacted text (the gate-friendly content witness;
    callers wanting the cleaned corpus use ``redacted_text`` directly)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        # count IPv4 on the email-redacted text so an address inside an
        # email host isn't double-counted (same disjointness rule the
        # replacement order enforces)
        F.regexp_count(
            F.regexp_replace(t, F.lit(EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(IPV4_RE),
        ).alias("n_ipv4"),
        F.md5(redacted_text(t)).alias("redacted_md5"),
    )
