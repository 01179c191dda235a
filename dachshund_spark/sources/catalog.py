"""Catalog shim: one table API over Iceberg (when the runtime jar is on
the classpath) or plain parquet directories (sandbox fallback).

The engine's durability contract (checkpoint tables, edge tables, vertex
state) is written against this interface, so deployments with Iceberg get
snapshot isolation + time travel and the sandbox gets bit-identical
behavior from parquet directories — same API, same resume semantics
(SURVEY.md §7 "abstract the catalog so parquet-dir checkpoints satisfy
the same resume contract").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    """``catalog.write(df, "edges")`` / ``catalog.read("edges")`` with
    overwrite/append modes; Iceberg table identifiers when available,
    parquet subdirectories otherwise."""

    def __init__(self, spark: SparkSession, root: str, namespace: str = "dachshund"):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        self.use_iceberg = iceberg_available(spark) and root.startswith("catalog:")
        if not self.use_iceberg:
            os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        if self.use_iceberg:
            return f"{self.namespace}.{table}"
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        if self.use_iceberg:
            df.writeTo(self._path(table)).using("iceberg").createOrReplace()
        else:
            df.write.mode(mode).parquet(self._path(table))

    def append(self, df: DataFrame, table: str) -> None:
        if self.use_iceberg:
            df.writeTo(self._path(table)).append()
        else:
            df.write.mode("append").parquet(self._path(table))

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(self._path(table))
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._path(table))
        p = self._path(table)
        return os.path.isdir(p) and bool(os.listdir(p))
