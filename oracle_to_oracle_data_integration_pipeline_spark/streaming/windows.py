"""Event-time window aggregations (tumbling / sliding / session).

The reference has no true streaming — it emulates micro-batching by
cron-rerunning the batch job with a watermark table as the offset store
(`/root/reference/README.md:256,263-270`; SURVEY.md §2.9). These
builders are the real Structured Streaming surface the engine adds, and
they are *batch/stream agnostic*: the same functions compose onto a
static DataFrame (used by the DuckDB-checked qids) or a streaming one
(used by the readStream tests), because `F.window`/`F.session_window`
are supported in both modes — one definition, both engines of
execution.

Scale notes: windowed aggregation state is keyed by (window, keys);
with a watermark Spark drops state for windows older than the lateness
bound, so state size is bounded by (active windows × key cardinality),
not by stream length. Session windows merge state per key; the gap
bound plus watermark caps retained sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(24,6)")), 2).cast("double").alias("sum_value"),
    ]


def tumbling_agg(events: DataFrame, width: str = "1 hour", by: str = "event_type") -> DataFrame:
    """Non-overlapping event-time buckets (epoch-aligned, matching SQL
    time_bucket/date_trunc semantics for whole-hour widths)."""
    w = F.window(F.col("ts"), width)
    return (
        events.groupBy(w.alias("w"), F.col(by))
        .agg(*_agg_exprs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            by,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows
    (Spark explodes the window set internally)."""
    w = F.window(F.col("ts"), width, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(*_agg_exprs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "6 hours", key: str = "user_id") -> DataFrame:
    """Gap-based session windows per key: a session extends while the
    next event arrives within ``gap`` INCLUSIVE — an event exactly gap
    after the previous one still extends the session (verified against
    Spark's session_window; exact-gap ties are real under coarse
    timestamps); session end = last event + gap."""
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(*_agg_exprs())
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Lateness bound: in streaming mode, rows older than
    max(event time) - delay are dropped and window state finalizes.
    The reference's analog is silent: rows with change_ts <= the
    committed watermark are simply never re-read
    (`/root/reference/scripts/03_cdc_etl.py:291-292`) — an *implicit*
    zero-lateness policy; here lateness is explicit and tunable."""
    return events.withWatermark("ts", delay)
