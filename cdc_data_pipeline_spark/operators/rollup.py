"""Incremental time-bucket rollups (continuous-aggregate maintenance).

The hypertable-rollup pattern: a per-bucket aggregate table maintained
incrementally from change batches — only the buckets a batch touches
are recomputed/rewritten, never the whole history. The reference keeps
monthly partitions for exactly this access path
(init-clickhouse.sql:37 PARTITION BY toStartOfMonth) but recomputes
aggregates in dbt models; here maintenance is first-class.

Only decomposable (monoid) aggregates are supported — count/sum/min/
max, with avg derivable as sum/count — because partials from separate
batches must merge associatively: count merges by sum, sum by sum,
min by min, max by max. Non-decomposable aggregates (exact distinct,
median) need their own operators (see salted_collect_set / sketches).

Scale: the delta aggregation has map-side partial combine and shuffles
only (bucket, groups) keys; the merge touches only affected buckets.
At 100 TB the rollup table is partitioned by bucket, so maintenance
cost tracks batch size, not table size (incremental_rollup below).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET = "bucket"

_DELTA_FN = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}

# how a partial aggregate merges with another partial of the same kind
_MERGE_FN = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def rollup_delta(batch: DataFrame, time_col: str, width: str,
                 group_cols: Sequence[str],
                 specs: Sequence[tuple[str, str | None, str]]) -> DataFrame:
    """Aggregate one batch into per-(time-bucket, groups) partials.

    ``specs`` rows are (fn, col, alias) with fn in count/sum/min/max
    (col ignored for count). The bucket is the event-time window start
    (epoch-aligned, same grid as DuckDB's date_trunc for whole units).
    """
    bucket = F.window(F.col(time_col), width).getField("start").alias(BUCKET)
    aggs = [_DELTA_FN[fn](col).alias(alias) for fn, col, alias in specs]
    return batch.groupBy(bucket, *group_cols).agg(*aggs)


def merge_rollup(partials: Sequence[DataFrame], group_cols: Sequence[str],
                 specs: Sequence[tuple[str, str | None, str]]) -> DataFrame:
    """Merge per-batch partials into one rollup state (associative:
    any grouping of batches yields the same result as one big
    aggregation — pinned by tests and the catalog oracle)."""
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    aggs = [_MERGE_FN[fn](alias).alias(alias) for fn, _col, alias in specs]
    return u.groupBy(BUCKET, *group_cols).agg(*aggs)


def incremental_rollup(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    time_col: str,
    width: str,
    group_cols: Sequence[str],
    specs: Sequence[tuple[str, str | None, str]],
) -> None:
    """Maintain a rollup table on disk, rewriting ONLY the time-bucket
    partitions the batch touches (atomic staging swap, same write
    discipline as upsert_bucketed). Late/out-of-order data is handled
    by construction: whichever buckets the late rows fall in are
    re-merged.

    The partition key is the bucket formatted as a filesystem-safe
    string; readers get the timestamp back via the stored column.
    """
    from cdc_data_pipeline_spark.operators.incremental import (
        _overwrite_buckets_atomic, recover_table)
    from cdc_data_pipeline_spark.sources import fsutil

    delta = rollup_delta(batch, time_col, width, group_cols, specs)
    part = F.date_format(F.col(BUCKET), "yyyy-MM-dd'T'HH-mm-ss").alias("__pb")
    stamped = delta.select("*", part)
    # heal a partition stranded by a crashed swap BEFORE reading —
    # otherwise its accumulated aggregates are invisible to the merge
    # and destroyed when the delta-only result swaps in
    recover_table(spark, target_path)
    target = None
    if fsutil.exists(spark, target_path):
        try:
            target = spark.read.parquet(target_path)
        except Exception:
            target = None
    if target is None:
        stamped.write.mode("overwrite").partitionBy("__pb").parquet(target_path)
        return
    parts = [r[0] for r in stamped.select("__pb").distinct().collect()]
    affected = target.filter(F.col("__pb").isin(parts)).drop("__pb")
    merged = merge_rollup([affected, delta], group_cols, specs).select("*", part)
    _overwrite_buckets_atomic(merged, target_path, parts, partition_col="__pb")
