"""Readers/writers for the reference's TSV edge formats, so a dachshund
user can point their existing files at this engine.

Formats (cf. line_processor.rs, typed_graph_line_processor.rs):
  simple:   graph_key \t src \t dst
  weighted: graph_key \t src \t dst \t weight
  typed:    graph_key \t core_id \t non_core_id \t core_type \t edge_type \t non_core_type
  clique-seed rows (typed files): graph_key \t node_id \t node_type \t\t\t

Graph-key interning (string key -> sequential i64,
line_processor.rs:49-62) becomes a dense_rank over the distinct keys; the
reverse map *is* the returned dimension table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SIMPLE_SCHEMA = "graph_key string, src long, dst long"
WEIGHTED_SCHEMA = "graph_key string, src long, dst long, weight double"
TYPED_SCHEMA = (
    "graph_key string, core_id long, non_core_id string, core_type string, "
    "edge_type string, non_core_type string"
)


def read_simple_edges(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", schema=SIMPLE_SCHEMA)


def read_weighted_edges(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", schema=WEIGHTED_SCHEMA)


def read_typed_edges(spark: SparkSession, path: str) -> DataFrame:
    """Returns (edge_rows, clique_rows): rows whose 4th column is empty are
    clique-seed rows (typed_graph_line_processor.rs:68-82)."""
    raw = spark.read.csv(path, sep="\t", schema=TYPED_SCHEMA)
    is_seed = F.col("core_type").isNull() | (F.col("core_type") == "")
    edges = raw.filter(~is_seed)
    seeds = raw.filter(is_seed).select(
        "graph_key",
        F.col("core_id").alias("node_id"),
        F.col("non_core_id").alias("node_type"),
    )
    return edges, seeds


def intern_graph_keys(df: DataFrame, key_col: str = "graph_key"):
    """(df + graph_id column, key dimension table).  dense_rank over the
    distinct key set, matching the reference's sequential interning up to
    ordering (it numbers by first appearance; we number by sort order —
    a canonical, parallel-safe choice)."""
    dim = (
        df.select(key_col)
        .distinct()
        .withColumn(
            "graph_id", F.dense_rank().over(Window.orderBy(key_col)).cast("long") - 1
        )
    )
    return df.join(F.broadcast(dim), key_col), dim


def write_edges_tsv(edges: DataFrame, path: str, graph_col: str | None = None):
    """Emit `graph \t src \t dst` once per undirected edge (src < dst) —
    the round-trip encoder (simple_undirected_graph.rs:84-99)."""
    cols = ([graph_col] if graph_col else []) + ["src", "dst"]
    out = edges.filter(F.col("src") < F.col("dst")).select(*cols)
    out.write.mode("overwrite").csv(path, sep="\t")
