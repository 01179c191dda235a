"""Table I/O shim: one source/sink syntax for Iceberg catalog tables and
parquet paths, so every spark-submit job (jobs.py) runs unchanged against
either.

north_rule: the production input is an Iceberg table of Common-Crawl-style
pages and every superstep checkpoints vertex state to Iceberg.  This
sandbox ships no Iceberg runtime jar, so the shim's Iceberg branch cannot
be exercised here — it is the standard ``spark.read.table`` /
``DataFrame.writeTo`` DataSourceV2 API (which is what Iceberg's Spark
integration implements), routed by a source-string prefix:

  ``iceberg:<catalog>.<db>.<table>`` or ``table:<name>``  -> catalog table
  anything else                                           -> parquet path

On a cluster with ``spark.sql.catalog.<name>`` configured for Iceberg the
same job CLI flags work verbatim; locally the parquet branch is the
tested path (every gate query reads through it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TABLE_PREFIXES = ("iceberg:", "table:")


def is_table_ref(src: str) -> bool:
    return src.startswith(_TABLE_PREFIXES)


def _table_name(src: str) -> str:
    return src.split(":", 1)[1]


def read_table(spark: SparkSession, src: str) -> DataFrame:
    """``iceberg:db.tbl`` / ``table:db.tbl`` -> ``spark.read.table``;
    otherwise a parquet path."""
    if is_table_ref(src):
        return spark.read.table(_table_name(src))
    return spark.read.parquet(src)


def write_table(df: DataFrame, dst: str, mode: str = "overwrite") -> None:
    """``iceberg:`` refs go through the DataSourceV2 ``writeTo`` API
    (Iceberg's integration point — atomic REPLACE TABLE AS SELECT,
    snapshot history); ``table:`` refs use ``saveAsTable`` (the built-in
    session catalog does not implement RTAS); paths write parquet."""
    if dst.startswith("iceberg:"):
        w = df.writeTo(_table_name(dst))
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"unsupported mode for table ref: {mode!r}")
        return
    if dst.startswith("table:"):
        df.write.mode(mode).saveAsTable(_table_name(dst))
        return
    df.write.mode(mode).parquet(dst)
