"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is the high-watermark it re-reads from the
target table (reference: base_loader.py:586-608); Structured Streaming
keeps operator state in the checkpoint instead. This module implements
the shape the built-in windows can't express: an arbitrary per-key
running aggregate that survives across micro-batches.

Scale notes: state is partitioned by the grouping key across executors
(RocksDB/HDFS-backed state store on a real cluster); each micro-batch
shuffles only that batch's rows to their key's state partition. Keep
the state value small (a few counters, not row buffers).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("sum_value", T.DoubleType(), True),
    T.StructField("max_ts", T.TimestampType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("s", T.DoubleType(), False),
    T.StructField("mx", T.LongType(), True),  # epoch micros (state stores no tz)
])


def _update_running(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            batch_mx = pdf["ts"].max()
            batch_us = int(batch_mx.value // 1000)  # pandas Timestamp is ns
            mx = batch_us if mx is None else max(mx, batch_us)
    state.update((n, s, mx))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [round(s, 2)],
        "max_ts": [pd.Timestamp(mx, unit="us") if mx is not None else pd.NaT],
    })


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max-ts) maintained across
    micro-batches — works on both streaming and batch frames; the
    batch path degenerates to a single 'micro-batch' per key, so unit
    tests can pin exact equivalence with a plain groupBy."""
    grouped = events.select("user_id", "value", "ts").groupBy("user_id")
    if events.isStreaming:
        return grouped.applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # batch fallback: same semantics without a state store
    from pyspark.sql import functions as F

    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )
