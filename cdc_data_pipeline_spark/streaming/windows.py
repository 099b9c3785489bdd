"""Windowed streaming aggregations over the events stream.

The reference simulates streams with cron micro-batches (reference:
schedules/all_schedules.py:12-52, 15-min latency tolerance,
README.md:55-59); Structured Streaming is the native re-expression:
event-time windows + watermarks handle late data instead of re-extract
cadence. Each function works on BOTH a batch and a streaming DataFrame
(identical API — that is the point of Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark(ts_col, delay) if events.isStreaming else events


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window: count + value stats per event_type."""
    e = with_watermark(events, ts_col, delay)
    return (
        e.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour", slide: str = "30 minutes",
                   ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    e = with_watermark(events, ts_col, delay)
    return (
        e.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "15 minutes",
                    ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-based) — the custom-stateful shape
    the reference cannot express at all."""
    e = with_watermark(events, ts_col, delay)
    return (
        e.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"),
                "user_id", "n_events")
    )
