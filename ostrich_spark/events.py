"""Event-stream shapes: sessionization and watermarked windowed counts.

EXTENSION beyond the reference (a pure fulltext engine): the analytics
companions a training-data/event pipeline runs next to the index —
gap-based sessionization (batch) and the Structured Streaming
watermark + tumbling-window aggregation for late data.

Scale posture: sessionization is one window partitioned by the user key
(lag + running sum — no self-join, no collect) followed by one
partial-aggregated groupBy on (user, session); both shuffles key on
user_id so AQE coalesces/splits skewed users. The streaming shape uses
Spark's own state store with the watermark bounding state size.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
    order_cols: tuple[str, ...] = ("event_id",),
):
    """Gap-based sessions: a new session starts when the inter-event gap
    for a user exceeds ``gap_s`` seconds (classic web-analytics rule;
    Spark's native session_window gives the same grouping in streaming —
    this batch formulation keeps the session ordinal deterministic and
    oracle-checkable).

    Returns one row per (user, session): ``session_ord`` (1-based, in
    time order), ``n_events``, ``start_us``/``end_us`` (epoch micros),
    ``duration_us``. Ordering ties break on ``order_cols`` so equal
    timestamps are deterministic.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = df.withColumn("_ts_us", ts_us)
    w = Window.partitionBy(user_col).orderBy("_ts_us", *order_cols)
    prev = F.lag("_ts_us").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("_ts_us") - prev) > gap_s * 1_000_000), 1
    ).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy("_ts_us", *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = d.withColumn("session_ord", F.sum(new_sess).over(cum))
    return sess.groupBy(user_col, "session_ord").agg(
        F.count("*").alias("n_events"),
        F.min("_ts_us").alias("start_us"),
        F.max("_ts_us").alias("end_us"),
        (F.max("_ts_us") - F.min("_ts_us")).alias("duration_us"),
    )


def windowed_event_counts(
    stream_df,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    keys: tuple[str, ...] = (),
):
    """Streaming tumbling-window counts with a watermark: late events
    older than ``watermark`` behind the max seen event time are DROPPED
    and closed windows emit exactly once in append mode. State is
    bounded by the watermark horizon — the scale contract for an
    unbounded stream."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n",
        )
    )


DOWNSAMPLE_UNITS = ("minute", "hour", "day", "week", "month")


def downsample(
    df,
    interval: str = "hour",
    ts_col: str = "ts",
    dimensions: tuple[str, ...] = ("user_id", "event_type"),
    metrics: tuple[str, ...] = ("value",),
):
    """Time-series downsampling — the Elasticsearch TSDB ``downsample``
    API analog: roll raw events into ONE row per (dimension tuple,
    interval bucket), each metric kept as the ES
    ``aggregate_metric_double`` quadruple (``{m}_min / {m}_max /
    {m}_sum / {m}_count``) — the lossless-for-min/max/sum/avg summary
    ES writes so rolled-up indices keep answering the standard metric
    aggs (avg = sum/count downstream). ``n_events`` counts the
    bucket's rows; NULL metric values contribute nothing to their
    quadruple (count counts non-NULLs, the ES value_count contract);
    NULL dimensions form their own bucket (SQL GROUP BY, stated).

    ``interval`` is a calendar unit (minute/hour/day/week/month —
    date_trunc semantics, weeks starting Monday); ``bucket_ts`` is the
    bucket START timestamp (the ES convention).

    Scale posture: ONE partial-aggregated groupBy on (dims, truncated
    ts) — min/max/sum/count all combine map-side, so the shuffle
    carries one quadruple per (bucket × dims) per task, never raw
    events; the classic 100:1-1000:1 rollup reduction happens before
    the wire. Write the result partitioned by bucket date for a
    queryable rollup table."""
    if interval not in DOWNSAMPLE_UNITS:
        raise ValueError(
            f"interval must be one of {DOWNSAMPLE_UNITS}, got {interval!r}"
        )
    dimensions = list(dimensions)
    metrics = list(metrics)
    if not metrics:
        raise ValueError("downsample wants >= 1 metric column")
    for c in [ts_col] + dimensions + metrics:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame ({df.columns})")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for m in metrics:
        aggs += [
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
            F.sum(m).alias(f"{m}_sum"),
            F.count(m).alias(f"{m}_count"),
        ]
    return (
        df.groupBy(
            F.date_trunc(interval, F.col(ts_col)).alias("bucket_ts"),
            *dimensions,
        )
        .agg(*aggs)
    )
