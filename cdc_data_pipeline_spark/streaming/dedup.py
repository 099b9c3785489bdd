"""Streaming deduplication for at-least-once CDC/event feeds.

The reference's extract loop re-sends rows freely and relies on the
warehouse merge to collapse them (base_loader.py:340-475 keep-latest);
a streaming pipeline wants the collapse BEFORE state-heavy operators
(windows, joins, sinks) so duplicates never inflate downstream state.

Works on BOTH batch and streaming frames with identical semantics —
the Structured Streaming contract the rest of the engine follows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_events(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events by key.

    Streaming with an event-time column: uses
    ``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark delay of the first occurrence are dropped, and the
    dedup state for a key is EVICTED once the watermark passes it.
    That bound is what makes the operator viable on an unbounded
    stream: plain ``dropDuplicates`` on a stream accumulates one state
    row per key forever (a memory leak at CDC volumes). The watermark
    must be at least the feed's redelivery window (at-least-once
    sources re-send within retry horizons, not arbitrarily late).

    Batch (or no event-time column): exact ``dropDuplicates`` — the
    same result the streaming path converges to when every duplicate
    arrives within the watermark.
    """
    keys = list(keys)
    if stream.isStreaming and event_time_col is not None:
        return (
            stream.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return stream.dropDuplicates(keys)
