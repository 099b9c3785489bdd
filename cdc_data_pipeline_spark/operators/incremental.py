"""Incremental load / merge strategies — the CDC core (SURVEY §2.3).

The reference implements four load strategies with generated ClickHouse
SQL (temp Memory tables, DELETE WHERE key IN, INSERT...SELECT —
reference: base_loader.py:275-584). Here each strategy is a pure
DataFrame -> DataFrame function; the write is a single atomic overwrite
(strictly better than the reference's non-transactional delete+insert
window, base_loader.py:316-329).

Scale notes (100 TB):
- ``upsert`` is a key-equi anti-join: Catalyst/AQE picks broadcast when
  the batch is small (the common CDC case — a change-batch is orders of
  magnitude smaller than the target), so the target is NOT shuffled.
- ``latest_per_key`` uses max(struct(...)) argmax aggregation, which has
  a map-side partial combine — far cheaper at scale than the
  window/row_number formulation (which requires a full sort of every
  partition's rows per key).
- ``snapshot_load`` maps to dynamic partition overwrite: only the
  affected date partitions are rewritten, never the whole table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def get_watermark(target: DataFrame | None, tracking_column: str):
    """M5: high-watermark read — ``SELECT MAX(tracking) FROM target``.

    Reference: base_loader.py:586-608 (None when the target does not
    exist yet -> full initial load). The only driver-side collect in the
    incremental path, and it is a single scalar.
    """
    if target is None:
        return None
    row = target.agg(F.max(tracking_column).alias("wm")).first()
    return row["wm"] if row else None


def full_load(batch: DataFrame) -> DataFrame:
    """M1: full load (truncate + insert) — the new state IS the batch.

    Reference: base_loader.py:477-516. Write with mode('overwrite').
    """
    return batch


def upsert(target: DataFrame, batch: DataFrame, keys: Sequence[str],
           evolve_schema: bool = False) -> DataFrame:
    """M2: incremental upsert (delete+insert by key).

    Reference: base_loader.py:275-338 — temp table + DELETE WHERE key IN
    + INSERT. Spark-first: rows of ``target`` whose key appears in the
    batch are dropped (left_anti) and the batch is appended. One shuffle
    at most; broadcast anti-join when the batch is small.

    ``evolve_schema=True`` accepts a drifted batch (the Debezium
    schema-change shape the reference handles via live DDL,
    base_loader.py:762-855): columns NEW in the batch surface as NULL
    on historical rows, columns the batch DROPPED surface as NULL on
    its rows — latest-wins semantics, a replaced row simply no longer
    carries the field. Default stays strict: silent column drift in a
    feed that should be stable is a bug worth failing on."""
    anti = target.join(batch.select(*keys).distinct(), list(keys),
                       "left_anti")
    if evolve_schema:
        return anti.unionByName(batch, allowMissingColumns=True)
    return anti.unionByName(batch)


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Groupwise latest-record-wins dedup (the core of M3, R8).

    Reference: base_loader.py:427-436 keeps ``(key, MAX(tracking))`` via
    a NOT IN anti-predicate. Implemented as an argmax aggregation —
    ``max(struct(tracking, tiebreakers..., payload))`` — because struct
    comparison is lexicographic and max() gets a map-side partial
    aggregate (one shuffle of pre-combined partials, vs a full sort for
    the window/row_number formulation).
    """
    payload = [c for c in df.columns]
    order_cols = [tracking_column, *tiebreakers]
    packed = F.max(F.struct(*[F.col(c) for c in order_cols], F.struct(*payload).alias("__row"))).alias("__m")
    agg = df.groupBy(*keys).agg(packed)
    return agg.select([F.col(f"__m.__row.{c}").alias(c) for c in payload])


def upsert_dedup(
    target: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    tiebreakers: Sequence[str] = (),
    evolve_schema: bool = False,
) -> DataFrame:
    """M3: incremental upsert + keep-latest dedup ("special" load).

    Reference: base_loader.py:340-475 — upsert, then if any key has >1
    row keep only (key, MAX(tracking)). Batch is deduped first (cheap,
    small), then upserted.
    """
    deduped = latest_per_key(batch, keys, tracking_column, tiebreakers)
    return upsert(target, deduped, keys, evolve_schema=evolve_schema)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """R7: duplicate detection — GROUP BY key HAVING count > 1."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)


def snapshot_load(
    target: DataFrame | None,
    batch: DataFrame,
    derived_column: str,
    snapshot_date: Column | None = None,
) -> DataFrame:
    """M4: date-partitioned snapshot overwrite.

    Reference: base_loader.py:518-584 — delete today's partition, insert
    the batch stamped with today(). As a pure function: drop target rows
    whose ``derived_column`` equals the stamp, append the stamped batch.
    When writing to parquet use ``partitionBy(derived_column)`` +
    ``partitionOverwriteMode=dynamic`` so only the stamped partition is
    rewritten.
    """
    stamp = snapshot_date if snapshot_date is not None else F.current_date()
    stamped = batch.withColumn(derived_column, stamp)
    if target is None:
        return stamped
    kept = target.join(stamped.select(derived_column).distinct(), [derived_column], "left_anti")
    return kept.unionByName(stamped)


BUCKET_COL = "__kb"


def bucket_of(keys: Sequence[str], n_buckets: int) -> Column:
    """Stable key-hash bucket id — the partition key for upsert targets."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def _replace_dir(spark: SparkSession, dst: str, src: str) -> None:
    """Swap ``src`` into place at ``dst`` via sibling renames.

    The previous ``dst`` is renamed aside before the new data moves in,
    so the fully-written result is durable on disk before anything is
    deleted — no window where a lost cache partition could recompute
    from half-deleted input (the persist+count hazard). A crash between
    the two renames leaves ``<dst>.__old__`` intact for recovery.

    All FS metadata ops go through the Hadoop FileSystem API
    (``sources/fsutil``), so the same protocol runs on ``file://``,
    ``hdfs://`` or ``s3a://`` roots, not only bare local paths.
    """
    from cdc_data_pipeline_spark.sources import fsutil as fs

    old = dst.rstrip("/") + ".__old__"
    fs.delete(spark, old)
    if fs.exists(spark, dst):
        fs.rename(spark, dst, old)
    fs.rename(spark, src, dst)
    fs.delete(spark, old)


def _overwrite_buckets_atomic(merged: DataFrame, target_path: str,
                              buckets: Sequence,
                              partition_col: str = BUCKET_COL) -> None:
    """Write ``merged`` (carrying ``partition_col``) to a staging
    sibling, then swap ONLY the affected partition directories into
    the target.

    The merge plan reads the target's files; staging breaks the
    read-then-overwrite self-dependency WITHOUT relying on cache
    pinning (persist+count) or on partitionOverwriteMode=dynamic being
    set in the caller's session — correctness is self-contained.
    """
    from cdc_data_pipeline_spark.sources import fsutil as fs

    spark = merged.sparkSession
    tmp = target_path.rstrip("/") + ".__staging__"
    fs.delete(spark, tmp)
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    for b in buckets:
        src = fs.path_join(tmp, f"{partition_col}={b}")
        if fs.exists(spark, src):
            _replace_dir(spark, fs.path_join(target_path, f"{partition_col}={b}"), src)
    fs.delete(spark, tmp)


def upsert_bucketed(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    n_buckets: int = 64,
    tiebreakers: Sequence[str] = (),
    evolve_schema: bool = False,
) -> None:
    """M2/M3 against a hash-bucketed parquet target, touching ONLY the
    buckets the batch's keys hash into.

    This is the design that survives 100 TB: the target is partitioned
    by ``pmod(xxhash64(keys), n_buckets)``; a micro-batch (a) computes
    its bucket set (small distinct collect), (b) scans just those
    partitions (partition pruning), (c) merges, and (d) rewrites just
    those partitions (dynamic partition overwrite). Per-batch cost is
    O(affected buckets), not O(table) — the whole-table read+overwrite
    of the naive sink does not scale past a few GB.

    Idempotent under replay: latest-record-wins within the bucket.

    ``evolve_schema=True`` accepts drifted batches (see ``upsert``):
    the merge unions by name with missing columns as NULL, and the
    target read merges footers across buckets so earlier evolution is
    visible whatever bucket it landed in. Untouched buckets keep their
    old physical schema — readers of an evolved table must read with
    ``mergeSchema`` (as this sink itself does) until a compaction
    rewrites them. Default stays strict."""
    from cdc_data_pipeline_spark.sources import fsutil

    if batch.isEmpty():
        # 0-row guard (reference: base_loader.py:308-310) — also keeps an
        # empty first micro-batch from creating a file-less target dir
        return
    stamped = batch.withColumn(BUCKET_COL, bucket_of(keys, n_buckets))
    deduped = latest_per_key(stamped, keys, tracking_column, tiebreakers)
    target = None
    if fsutil.exists(spark, target_path):
        try:
            reader = spark.read.option("mergeSchema", "true") \
                if evolve_schema else spark.read
            target = reader.parquet(target_path)
        except Exception:
            target = None  # dir exists but holds no data files yet
    if target is None:
        deduped.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path)
        return
    buckets = [r[0] for r in stamped.select(BUCKET_COL).distinct().collect()]
    # partition filter prunes the scan to the affected buckets only
    affected = target.filter(F.col(BUCKET_COL).isin(buckets))
    merged = upsert_dedup(affected, deduped, keys, tracking_column,
                          tiebreakers, evolve_schema=evolve_schema)
    _overwrite_buckets_atomic(merged, target_path, buckets)


def write_merged(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """Materialize a merge result, handling the read-then-overwrite
    self-dependency (SURVEY §7.2): the merged plan reads the target
    path, so overwriting in place would corrupt the scan. The result
    is fully written to a staging sibling first, then swapped into
    place — durable before anything is deleted, with no reliance on
    cache pinning surviving memory pressure. Works against any
    Hadoop-FS root (``file://``, ``hdfs://``, ``s3a://``).
    """
    from cdc_data_pipeline_spark.sources import fsutil as fs

    spark = df.sparkSession
    tmp = path.rstrip("/") + ".__staging__"
    fs.delete(spark, tmp)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _replace_dir(spark, path, tmp)


def backfill_snapshot(
    spark,
    build_for_date,
    target_path: str,
    dates: Sequence[str],
    derived_column: str = "snapshot_date",
) -> list[str]:
    """Date-range backfill: rebuild one snapshot partition per date,
    idempotently (re-running any date overwrites ONLY that date's
    partition — dynamic partition overwrite, reference semantics of
    `ALTER TABLE ... DELETE WHERE derived_col = today()` + insert,
    base_loader.py:518-584, generalized from today() to any date).

    ``build_for_date(spark, date_str) -> DataFrame`` builds the
    snapshot content for one date; partitions not in ``dates`` are
    untouched, so a backfill can run concurrently with the daily
    schedule and be re-run after a partial failure (each date commits
    independently — crash mid-range loses nothing already written).

    At scale each date's build is its own Spark job: linear in the
    backfill window, no job holds more than one partition's data.
    Returns the list of dates written.
    """
    done: list[str] = []
    for d in dates:
        df = build_for_date(spark, d)
        stamped = df.withColumn(derived_column, F.lit(d).cast("date"))
        (stamped.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(derived_column)
         .parquet(target_path))
        done.append(d)
    return done
