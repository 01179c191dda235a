"""Line-level boilerplate dedup — remove lines that repeat across many
documents (navigation bars, footers, cookie banners), the corpus-level
cleaning step web-scale LLM pipelines run between extraction and
document-level dedup (cf. RefinedWeb / CCNet line filtering, public).

Semantics: a line is boilerplate iff its EXACT bytes occur in at least
``min_docs`` distinct documents; the kept text is the surviving lines in
original order, '\\n'-joined.

Spark design (100 TB shape):

- one explode of the corpus into (doc, pos, line) rows — linear;
- the boilerplate dictionary is (line, distinct-doc-count >= k): the
  (line, doc) projection is pre-deduped so the count aggregate gets
  map-side partials, and only lines, not documents, travel in that
  shuffle;
- the dictionary re-joins the exploded rows on line (shuffle or, when the
  dictionary is small — the common case, boilerplate vocabularies are
  tiny next to corpora — a broadcast the optimizer/AQE picks since the
  filtered count table is orders smaller than the corpus);
- reassembly is one groupBy(doc): collect_list of (pos, line) structs,
  array_sort (sorts on the leading pos field), transform + array_join —
  all JVM-side, zero UDFs anywhere in the pass.

Everything is expressible in ANSI SQL, so the gate oracle is a genuine
dual-engine replay, not a kernel mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> (id, n_lines, n_boiler, kept_md5): per-document line
    counts plus the md5 of the boilerplate-stripped text (the compact
    content witness; callers wanting the cleaned corpus swap the final
    md5 for the joined string itself)."""
    did = F.col(id_col)
    lines = docs.select(
        did.alias("doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.select("line", "doc")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line", F.lit(True).alias("is_b"))
    )
    marked = lines.join(boiler, "line", "left").select(
        "doc",
        "pos",
        "line",
        F.coalesce("is_b", F.lit(False)).alias("is_b"),
    )
    kept_struct = F.when(
        ~F.col("is_b"), F.struct(F.col("pos"), F.col("line"))
    )  # null when boilerplate; collect_list drops nulls
    return (
        marked.groupBy("doc")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_b").cast("long")).alias("n_boiler"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("kept_md5"),
        )
        .withColumnRenamed("doc", id_col)
    )
