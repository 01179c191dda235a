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


def burst_sessions_stateful(
    spark: SparkSession,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Custom stateful sessionization via ``applyInPandasWithState`` — the
    arbitrary-state escape hatch for operators ``session_window`` cannot
    express.  Semantics here intentionally MATCH ``session_stats`` (events
    closer than ``gap`` merge; session_end = last event + gap) so the
    batch form is an exact oracle; the machinery is the general one:

    - state per user = the OPEN bursts as parallel arrays
      (start_ms, last_ms, n_events, value_sum) — interval-merged, so late
      events (within the watermark) that bridge two open bursts merge them;
    - a burst finalizes only when the event-time watermark passes
      last event + gap (never eagerly mid-batch), so no emitted row can
      ever be contradicted by late data the watermark still admits;
    - ``GroupStateTimeout.EventTimeTimeout`` armed at the earliest open
      burst's end drives emission; timed-out groups re-arm for their
      remaining bursts.

    State is O(open bursts per user) — bounded by the watermark horizon,
    independent of stream length; at scale the groupBy hash-partitions
    users across executors and the pandas function sees Arrow batches.
    Output rows: (user_id, burst_start, burst_end, n_events, total_value),
    append mode (only watermark-finalized bursts are emitted).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    # burst bookkeeping in MICROSECONDS (event-time columns are µs);
    # watermark/timeout interactions in ms (Spark's watermark granularity,
    # floor of the µs event time — mirrors EventTimeWatermarkExec)
    gap_us = _duration_ms(gap) * 1000
    out_schema = (
        "user_id long, burst_start timestamp_ntz, burst_end timestamp_ntz, "
        "n_events long, total_value double"
    )
    state_schema = (
        "starts array<long>, lasts array<long>, ns array<long>, "
        "sums array<double>"
    )

    def fn(key, pdf_iter, state):
        user_id = key[0]
        bursts: list[list] = []
        if state.exists:
            starts, lasts, ns, sums = state.get
            bursts = [list(t) for t in zip(starts, lasts, ns, sums)]
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000
            ).tolist()
            vals = pdf["value"].astype(float).fillna(0.0).tolist()
            for t, v in sorted(zip(ts_us, vals)):
                bursts.append([t, t, 1, v])
        # interval-merge: any two bursts within gap of each other fuse
        # (also merges batch events into carried-over open bursts)
        bursts.sort()
        merged: list[list] = []
        for b in bursts:
            if merged and b[0] <= merged[-1][1] + gap_us:
                m = merged[-1]
                m[1] = max(m[1], b[1])
                m[2] += b[2]
                m[3] += b[3]
            else:
                merged.append(b)
        wm_ms = state.getCurrentWatermarkMs()
        # finalize strictly-passed bursts ("watermark advances beyond"):
        # a burst whose end floors to == wm has NOT timed out, stays open
        closed = [b for b in merged if (b[1] + gap_us) // 1000 < wm_ms]
        open_ = [b for b in merged if (b[1] + gap_us) // 1000 >= wm_ms]
        if open_:
            state.update(
                (
                    [int(b[0]) for b in open_],
                    [int(b[1]) for b in open_],
                    [int(b[2]) for b in open_],
                    [float(b[3]) for b in open_],
                )
            )
            # next timeout = earliest open end; must be strictly beyond
            # the current watermark or Spark rejects it (end == wm case)
            state.setTimeoutTimestamp(
                max(min(b[1] for b in open_) // 1000 + gap_us // 1000,
                    wm_ms + 1)
            )
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "burst_start": pd.to_datetime(
                        [b[0] for b in closed], unit="us"
                    ),
                    "burst_end": pd.to_datetime(
                        [b[1] + gap_us for b in closed], unit="us"
                    ),
                    "n_events": [int(b[2]) for b in closed],
                    "total_value": [round(float(b[3]), 6) for b in closed],
                }
            )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(path)
        .withWatermark("ts", watermark)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _duration_ms(spec: str) -> int:
    """Parse a Spark-style duration string ('30 minutes', '2 hours') to ms."""
    qty, unit = spec.strip().split()
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(qty) * factor


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


def windowed_counts_stream(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """``windowed_event_counts`` in its incremental form: file source ->
    event-time watermark -> the SAME tumbling-window aggregation the
    batch gate runs (one shared definition, so batch and stream cannot
    drift).  In append mode a window is emitted exactly once, when the
    watermark passes its end — the batch oracle is therefore the batch
    aggregate restricted to watermark-finalized windows.

    State at scale: one row per (window, event_type) within the
    watermark horizon — bounded regardless of stream length; the groupBy
    hash-partitions across executors and partial aggregation absorbs
    per-batch volume map-side.
    """
    return windowed_event_counts(
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark),
        window,
    )


def click_purchase_join_stream(
    spark: SparkSession,
    path: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream interval join (click attribution): each purchase
    joins the same user's clicks from the preceding ``horizon``.  Both
    sides carry an event-time watermark and the join predicate bounds
    purchase_ts to [click_ts, click_ts + horizon], which is exactly what
    lets Spark expire join state: a buffered click can be dropped once
    the purchase-side watermark passes click_ts + horizon — state stays
    bounded by the watermark window regardless of stream length, and the
    join is an equi-join on user_id under the hood (hash-partitioned
    across executors, the range predicate evaluated post-match).

    Inner-join semantics: a match is emitted in the micro-batch where
    both rows are present, so over a bounded input the emitted set is
    EXACTLY the batch interval join — the correctness oracle."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(path)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            <= clicks.click_ts + F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    ).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def funnel_counts(events: DataFrame) -> DataFrame:
    """Ordered view -> click -> purchase funnel: how many users reach
    each stage, where a stage counts only if it happens STRICTLY AFTER
    the user's previous stage (first view, first click after that view,
    first purchase after that click).

    Spark shape: three per-user conditional MIN aggregates chained by
    user_id equi-joins — each aggregate is map-side combinable and all
    joins share the hash(user_id) partitioning, so at any corpus size
    this is one logical shuffle family, never a window over full event
    history.  Returns (stage, n_users) with stage ordinal for stable
    ordering."""
    ev = events.select("user_id", "event_type", "ts")
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    one = lambda df, s, n: df.agg(  # noqa: E731
        F.lit(s).alias("stage_ord"),
        F.lit(n).alias("stage"),
        F.count("*").alias("n_users"),
    )
    return (
        one(tv, 1, "view")
        .unionByName(one(tc, 2, "click_after_view"))
        .unionByName(one(tp, 3, "purchase_after_click"))
    )


def retention_cohorts(events: DataFrame, max_weeks: int = 8) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen ISO week
    (the cohort); for each later week, how many of the cohort came back.
    (cohort_week, week_offset, n_users) with offset 0..max_weeks.

    Week arithmetic is integer end to end (date_trunc('week') on both
    engines is ISO Monday; offset = datediff(day)/7 by integer
    division), so the result is engine-exact.  Shape: one per-user min
    aggregate, one user->cohort broadcast-able join, one distinct, one
    final count — all shuffles on user_id or the tiny (cohort, offset)
    pair."""
    ev = events.select("user_id", F.date_trunc("week", "ts").alias("w"))
    cohort = ev.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("w"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .filter(F.col("week_offset") <= max_weeks)
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )
