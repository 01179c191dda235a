"""Explicit skew handling for power-law (hub-vertex) key distributions.

Common-Crawl-style link graphs have in-degree spikes of 10^6+ on hub urls;
a plain ``groupBy(dst)`` or ``join(..., on=dst)`` concentrates a hub's
entire edge list on one shuffle partition.  Three tools:

* ``salted_agg`` — two-phase aggregation: partial-aggregate on
  ``(key, salt)`` then final-aggregate on ``key``.  (Spark's hash
  aggregate already does map-side partial aggregation for algebraic
  functions; explicit salting additionally protects the *reduce* side
  when a single key's partials exceed one partition's memory, and is the
  only option for non-algebraic aggregates such as collect-style ones.)
* ``salted_join`` — replicate the small side over ``n_salt`` copies and
  shard the skewed big side by a random salt, so a hub key fans out over
  ``n_salt`` reducers.
* ``top_hubs`` — degree-threshold hub detection used to split a join into
  a broadcast path (hub keys) and a shuffle path (long tail).

north_rule: "explicit salted repartitioning for hub-vertex skew".  AQE's
skew-join splitting (enabled in session.py) covers sort-merge joins at
runtime; these helpers cover aggregations and the cases AQE cannot see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt: xxhash64 of the row content mixed with the
    physical partition id — no rand(), so retried tasks produce identical
    output for deterministically-partitioned inputs (file scans), which is
    what checkpoint/restart consistency requires.  Mixing the partition id
    in means byte-identical duplicate rows of one hub key (the classic
    duplicate-row skew case) still spread across ``n_salt`` reducers as
    long as they arrive on different input partitions; duplicates within a
    single partition share a salt by design (they are already co-located
    and cost no extra shuffle)."""
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(*df.columns, F.spark_partition_id()), F.lit(n_salt)
        ).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: list[Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase sum/count-style aggregation over a skewed key.

    ``aggs`` must be algebraic column aggregates built on a column named
    ``value`` producing a column named ``value`` per phase, e.g.
    ``[F.sum("value").alias("value")]``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salted = with_salt(df, n_salt)
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side with a small side by replicating the small
    side ``n_salt`` times.  Output columns = big ⋈ small minus helper cols.
    """
    big_s = with_salt(big, n_salt, "_bsalt")
    salts = small.sparkSession.range(n_salt).select(
        F.col("id").cast("int").alias("_bsalt")
    )
    rep = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(rep, [key, "_bsalt"], how)
    return joined.drop("_bsalt")


def top_hubs(edges: DataFrame, key: str, threshold: int) -> DataFrame:
    """Vertices whose degree on ``key`` exceeds ``threshold`` — the
    broadcast-path candidates for hub-splitting joins."""
    return (
        edges.groupBy(key)
        .count()
        .filter(F.col("count") >= threshold)
        .select(key)
    )
