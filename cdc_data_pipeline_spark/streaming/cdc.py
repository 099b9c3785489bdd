"""Streaming CDC sink: foreachBatch reuse of the batch merge strategies.

The reference's hourly-cron extract-merge loop (reference:
base_loader.py:631-692 driving _perform_incremental_load) becomes a
Structured Streaming query whose sink applies the SAME pure merge
functions per micro-batch — one code path for batch and streaming,
which is the idiomatic Spark CDC design.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import upsert_dedup, write_merged


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    tracking_column: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Run a streaming query that upsert-dedup-merges every micro-batch
    into a parquet target. Exactly-once-ish: the merge is idempotent
    (latest-record-wins by tracking column), so micro-batch replay after
    failure converges to the same state — same property the reference
    gets from delete-before-insert, without the visibility gap.
    """
    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        target = None
        if os.path.exists(target_path):
            try:
                target = spark.read.parquet(target_path)
            except Exception:
                target = None
        if target is None:
            merged = upsert_dedup(batch.limit(0), batch, keys, tracking_column)
        else:
            merged = upsert_dedup(target, batch, keys, tracking_column)
        write_merged(merged, target_path)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
