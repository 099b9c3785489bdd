"""Stream-stream interval joins — correlate two event streams per key
within a time window (e.g. click -> purchase attribution), a shape the
reference's batch-cron architecture cannot express at all.

The SAME function serves batch frames (plain range join) and streaming
frames (watermarked stream-stream join: Spark bounds both sides' state
by the watermark delay + interval width, so state cannot grow without
bound). At scale the join shuffles both streams once on the key;
the interval predicate prunes within each key partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same key where
    ``left_ts <= right_ts <= left_ts + within`` (forward correlation).

    Columns are expected pre-aliased to avoid collisions. On streaming
    inputs both sides get event-time watermarks — required for Spark to
    evict join state.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    if left.isStreaming:
        left = left.withWatermark(left_ts, delay)
    if right.isStreaming:
        right = right.withWatermark(right_ts, delay)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (rt >= lt) & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    l = left.select(*[F.col(c).alias(f"l_{c}") if c == key else F.col(c) for c in left.columns])
    r = right.select(*[F.col(c).alias(f"r_{c}") if c == key else F.col(c) for c in right.columns])
    return l.join(r, cond, how)


def click_error_correlation(events: DataFrame, within: str = "30 minutes",
                            delay: str = "10 minutes") -> DataFrame:
    """Errors following a click by the same user within ``within``:
    the attribution shape (click stream x error stream)."""
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id"))
    errors = events.filter(F.col("event_type") == "error") \
        .select("user_id", F.col("ts").alias("error_ts"), F.col("event_id").alias("error_id"))
    joined = interval_join(clicks, errors, "user_id", "click_ts", "error_ts",
                           within=within, delay=delay)
    return joined.select(F.col("l_user_id").alias("user_id"),
                         "click_id", "click_ts", "error_id", "error_ts")
