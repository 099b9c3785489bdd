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


# ------------------------------------------------------ streaming funnel

FUNNEL_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("steps_completed", T.LongType(), False),
    T.StructField("last_step_ts", T.TimestampType(), True),
])

_FUNNEL_STATE = T.StructType([
    T.StructField("nxt", T.LongType(), False),
    T.StructField("last_us", T.LongType(), True),
])


def _make_funnel_update(steps):
    step_idx = {s: i for i, s in enumerate(steps)}
    nsteps = len(steps)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        nxt, last_us = state.get if state.exists else (0, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # same order as the batch operator's array_sort(struct(ts, type))
        batch = batch.sort_values(["ts", "event_type"], kind="mergesort")
        for ts, et in zip(batch["ts"], batch["event_type"]):
            i = step_idx.get(et)
            us = int(ts.value // 1000)
            if i == nxt and nxt < nsteps and (nxt == 0 or us > last_us):
                nxt += 1
                last_us = us
        state.update((nxt, last_us))
        if nxt > 0:
            yield pd.DataFrame({
                "user_id": [key[0]],
                "steps_completed": [nxt],
                "last_step_ts": [pd.Timestamp(last_us, unit="us")],
            })

    return update


def streaming_funnel(events: DataFrame, steps) -> DataFrame:
    """Incremental per-user funnel progression across micro-batches —
    the streaming sibling of ``operators/funnel.py::funnel_steps``
    (same strict-order semantics; the batch path delegates to it, so
    equivalence is testable exactly).

    State per user is two scalars (next step index, last completion
    micros) — constant-size, RocksDB-friendly; each micro-batch
    shuffles only its own step-typed events to the key's state
    partition. Caveat inherent to incremental funnels: progression is
    monotone, so an event arriving in a LATER micro-batch than a
    qualifying event it precedes in event time is not retroactively
    applied; bound the reordering with a watermark-aligned source
    (e.g. kafka partitions by user) where that matters.
    """
    steps = list(steps)
    from pyspark.sql import functions as F

    filtered = (events
                .filter(F.col("event_type").isin(steps))
                .select("user_id", "ts", "event_type"))
    if events.isStreaming:
        return filtered.groupBy("user_id").applyInPandasWithState(
            _make_funnel_update(steps),
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    from cdc_data_pipeline_spark.operators.funnel import funnel_steps

    return funnel_steps(events, steps)
