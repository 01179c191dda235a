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


def with_salt(
    df: DataFrame,
    n_salt: int,
    col_name: str = "_salt",
    mix_partition_id: bool = False,
) -> DataFrame:
    """Deterministic salt: xxhash64 of the row content — no rand(), so
    retried tasks, resumed checkpoints, and re-runs all produce identical
    salts regardless of how the input happens to be physically partitioned
    (AQE coalescing, repartition, or a different reader split must not
    change a row's salt).

    The one case content hashing cannot spread is BYTE-IDENTICAL duplicate
    rows of a single hub key.  For that, pass ``mix_partition_id=True`` —
    it additionally hashes ``spark_partition_id()`` so duplicates arriving
    on different input partitions fan out.  Only do this when ``df`` is
    SCAN-ROOTED (a deterministic file read with no shuffle/AQE between the
    scan and this call): partition ids are only stable for such inputs,
    and an unstable salt silently breaks checkpoint/restart determinism."""
    parts = list(df.columns) + (
        [F.spark_partition_id()] if mix_partition_id else []
    )
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*parts), F.lit(n_salt)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: list[Column],
    n_salt: int = 16,
    mix_partition_id: bool = False,
) -> DataFrame:
    """Two-phase sum/count-style aggregation over a skewed key.

    ``aggs`` must be algebraic column aggregates built on a column named
    ``value`` producing a column named ``value`` per phase, e.g.
    ``[F.sum("value").alias("value")]``.

    The default content-hash salt cannot spread BYTE-IDENTICAL duplicate
    rows of one hub key (they all hash alike).  If ``df`` is
    duplicate-row-heavy AND scan-rooted (deterministic file read, no
    shuffle/AQE between the scan and this call), pass
    ``mix_partition_id=True``; see ``with_salt`` for why the scan-rooted
    condition is load-bearing for checkpoint/restart determinism.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salted = with_salt(df, n_salt, mix_partition_id=mix_partition_id)
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    mix_partition_id: bool = False,
) -> DataFrame:
    """Join a skew-keyed big side with a small side by replicating the small
    side ``n_salt`` times.  Output columns = big ⋈ small minus helper cols.

    As with ``salted_agg``: byte-identical duplicate rows of one hub key
    share a content-hash salt; pass ``mix_partition_id=True`` only for
    scan-rooted duplicate-heavy inputs (see ``with_salt``).
    """
    big_s = with_salt(big, n_salt, "_bsalt", mix_partition_id=mix_partition_id)
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
