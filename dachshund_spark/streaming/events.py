"""Structured Streaming operators over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).

The reference is batch-only (a sequential stdin loop,
transformer_base.rs:38-91), so these are engine additions: the same
aggregations exposed in batch form for the correctness oracle and in
``readStream`` form for incremental execution.  Watermarking bounds state
for late data; the batch and streaming forms share the one aggregation
definition so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.  Works on both
    batch and streaming DataFrames."""
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user rollup (batch/streaming shared)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (events closer than ``gap`` merge into one
    session): (user_id, session_start, session_end, n_events,
    total_value).  Uses the built-in ``session_window`` — JVM-side merging
    state, no Python — and works identically on batch and (with a
    watermark) streaming inputs; ``session_end`` is Spark's convention of
    last event + gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_session_stats(
    spark: SparkSession,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Streaming form of ``session_stats``: file source + watermark (the
    watermark bounds session-merging state for late data — sessions older
    than the watermark finalize and evict)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(path)
        .withWatermark("ts", watermark)
    )
    return session_stats(stream, gap)


def stream_windowed_event_counts(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """File-source streaming variant with a watermark for late data.
    Returns a streaming DataFrame; pair with
    ``.writeStream.trigger(availableNow=True)`` for incremental backfill.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(path)
        .withWatermark("ts", watermark)
    )
    return windowed_event_counts(stream, window)


def run_stream_to_memory(
    spark: SparkSession, path: str, query_name: str, window: str = "1 hour"
):
    """Drive the streaming aggregation over existing files with the
    availableNow trigger (bounded run) into an in-memory sink; returns the
    finished StreamingQuery."""
    sdf = stream_windowed_event_counts(spark, path, window)
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
