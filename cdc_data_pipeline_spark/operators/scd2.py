"""SCD Type 2 change tracking (M7) — dbt snapshot `check` strategy.

Reference: dbt_project/dbt/snapshots/users_snapshot.sql:1-18 (config:
strategy='check', unique_key, check_cols) consumed with
``WHERE dbt_valid_to IS NULL`` (models/marts/dim_users.sql:13-15).
Worked example: reference README.md:69-88.

Semantics per batch (run timestamp ``run_ts``):
- brand-new key            -> open row  (valid_from=run_ts, valid_to=NULL)
- changed key (any check   -> close old open row (valid_to=run_ts)
  col differs, null-safe)     + insert new open row
- unchanged key            -> untouched
- key absent from batch    -> closed (valid_to=run_ts) only when
                              ``close_deleted`` (dbt invalidate_hard_deletes)
- closed history rows      -> untouched forever

Scale notes: one key-equi join between the OPEN slice of the snapshot
(filter pushed to the parquet scan) and the incoming batch. Change
detection is a null-safe comparison (``<=>`` negation) — native
expressions, codegen'd. History rows never shuffle: they pass through
by union. Snapshot tables should be written partitioned so the open
slice (valid_to IS NULL) prunes to few partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("dbt_valid_from", "dbt_valid_to", "dbt_scd_id", "dbt_updated_at")


def _scd_id(key_cols: Sequence[str], ts_col) -> F.Column:
    # md5(concat_ws('|', key..., ts)) — matches what a SQL oracle computes
    return F.md5(F.concat_ws("|", *[F.col(k).cast("string") for k in key_cols], ts_col.cast("string")))


def scd2_init(batch: DataFrame, keys: Sequence[str], run_ts: str) -> DataFrame:
    """First snapshot run: every row opens at run_ts."""
    ts = F.lit(run_ts).cast("timestamp")
    return (
        batch.withColumn("dbt_valid_from", ts)
        .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
        .withColumn("dbt_scd_id", _scd_id(keys, ts))
        .withColumn("dbt_updated_at", ts)
    )


_CLS = "__scd2_cls"


def _scd2_classified(
    current: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    check_cols: Sequence[str],
    run_ts: str,
    close_deleted: bool = False,
    with_preimages: bool = False,
) -> DataFrame:
    """ONE-pass classification of an SCD2 merge: a single full-outer
    key join between the OPEN slice and the batch, each joined row
    exploding into the 0-3 output rows it implies, tagged ``_CLS`` in
    {unchanged, closed, closed_pre, missing, opened}. ``closed_pre``
    (emitted only ``with_preimages``) is each closed version AS IT WAS
    (open, valid_to NULL) — the update preimage; it belongs to the
    change feed, never to the merged state.

    The r12 optimization pass replaced the previous shape — five
    separately-filtered copies of the same join unioned together —
    which made Catalyst recompute the classification join (and rescan
    the snapshot source) once per class: 8+ source scans for one
    ``scd2_check`` plan (guide §1.2/§2.4; values are expression-
    identical, only the plan shape changed)."""
    ts = F.lit(run_ts).cast("timestamp")
    payload_cols = [c for c in batch.columns]

    inc = batch.select(*payload_cols)
    # one full-outer key join decides every row's fate. Presence on
    # each side is derived from a non-nullable marker column, NOT from
    # keys[0].isNotNull() (ADVICE r12): the join is null-safe, so a
    # row whose first key column is legitimately NULL joins its
    # counterpart — the key-based test misread it as absent from both
    # sides and silently dropped it from the merge.
    cur_k = current.withColumn("__scd2_in_cur", F.lit(True)).alias("cur")
    inc_k = inc.withColumn("__scd2_in_inc", F.lit(True)).alias("inc")
    cond = [F.col(f"cur.{k}").eqNullSafe(F.col(f"inc.{k}")) for k in keys]
    joined = cur_k.join(inc_k, cond, "full_outer")

    in_cur = F.col("cur.__scd2_in_cur").isNotNull()
    in_inc = F.col("inc.__scd2_in_inc").isNotNull()
    changed = F.lit(False)
    for c in check_cols:
        changed = changed | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"inc.{c}"))

    cur_meta = [F.col(f"cur.{m}") for m in META_COLS]
    closed_meta = [F.col("cur.dbt_valid_from"), ts,
                   F.col("cur.dbt_scd_id"), F.col("cur.dbt_updated_at")]
    opened_meta = [ts, F.lit(None).cast("timestamp"),
                   _scd_id([f"inc.{k}" for k in keys], ts), ts]

    # Slim slots (r13, guide §2.1): only the class tag, a
    # which-side bit and the four meta values ride through the
    # explode; the payload columns — the wide part of the row — are
    # projected ONCE after it (Generate carries them alongside the
    # generator output), instead of being copied into every packed
    # struct and compacted away again. Values are unchanged: the
    # per-class meta expressions and the side selection are the same.
    def pack(cls: str, use_inc: bool, meta) -> F.Column:
        fields = [F.lit(cls).alias("c"), F.lit(use_inc).alias("ui")]
        fields += [m.alias(f"m{i}") for i, m in enumerate(meta)]
        return F.struct(*fields)

    close_pred = (in_cur & in_inc & changed) \
        | ((in_cur & ~in_inc) if close_deleted else F.lit(False))
    slots = [
        # unchanged current rows pass through untouched
        F.when(in_cur & in_inc & ~changed,
               pack("unchanged", False, cur_meta)),
        # changed (and optionally deleted) current rows close at run_ts
        F.when(close_pred, pack("closed", False, closed_meta)),
        # changed + brand-new keys open a fresh version
        F.when((in_inc & ~in_cur) | (in_cur & in_inc & changed),
               pack("opened", True, opened_meta)),
    ]
    if with_preimages:
        slots.append(F.when(close_pred,
                            pack("closed_pre", False, cur_meta)))
    if not close_deleted:
        # keys absent from the batch and not closed stay open
        slots.append(F.when(in_cur & ~in_inc,
                            pack("missing", False, cur_meta)))
    rows = joined.select(
        F.explode(F.array_compact(F.array(*slots))).alias("__s"),
        *[F.col(f"cur.{c}").alias(f"__cur_{c}") for c in payload_cols],
        *[F.col(f"inc.{c}").alias(f"__inc_{c}") for c in payload_cols])
    side = F.col("__s.ui")
    return rows.select(
        *[F.when(side, F.col(f"__inc_{c}")).otherwise(F.col(f"__cur_{c}"))
          .alias(c) for c in payload_cols],
        *[F.col(f"__s.m{i}").alias(m) for i, m in enumerate(META_COLS)],
        F.col("__s.c").alias(_CLS))


def _scd2_state(history: DataFrame, classified: DataFrame) -> DataFrame:
    """The new snapshot state: closed history passes through untouched,
    every classified row except the feed-only preimages lands — ONE
    place, so the plain and bucketed merge paths can never drift."""
    return history.unionByName(
        classified.filter(F.col(_CLS) != "closed_pre").drop(_CLS))


def scd2_merge(
    snapshot: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    check_cols: Sequence[str],
    run_ts: str,
    close_deleted: bool = False,
) -> DataFrame:
    """Merge one batch into an SCD2 snapshot table; returns new state.

    ``run_ts`` is an explicit parameter (never ``current_timestamp()``)
    so merges are deterministic and replayable.
    """
    if snapshot is None:
        return scd2_init(batch, keys, run_ts)
    history = snapshot.filter(F.col("dbt_valid_to").isNotNull())
    current = snapshot.filter(F.col("dbt_valid_to").isNull())
    return _scd2_state(history, _scd2_classified(
        current, batch, keys, check_cols, run_ts, close_deleted))


def scd2_current(snapshot: DataFrame) -> DataFrame:
    """R5: current-version filter — ``WHERE dbt_valid_to IS NULL``."""
    return snapshot.filter(F.col("dbt_valid_to").isNull())


def scd2_bucketed(
    spark,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    check_cols: Sequence[str],
    run_ts: str,
    n_buckets: int | None = None,
    close_deleted: bool = False,
    emit_changes: bool = False,
    update_preimages: bool = False,
    evolve_schema: bool = False,
    lock: bool = False,
    lock_ttl: float = 3600.0,
    lock_timeout: float = 60.0,
    on_duplicate_keys: str = "error",
) -> None:
    """Maintain an SCD2 snapshot at ``target_path`` partitioned by key
    hash, merging ``batch`` while touching ONLY the buckets its keys
    hash into — O(batch) per merge, not O(table).

    ``on_duplicate_keys`` guards the precondition every SCD2 engine
    has (dbt snapshots fail the run on duplicate snapshot keys): a
    batch carrying the same key twice is MULTIPLIED by the
    classification full-outer join, and because the duplicates land
    as multiple OPEN versions, every later merge of that key doubles
    them — exponential table growth from one dirty batch (found by
    the r10 scaled feed-age soak, whose fixture key turned out
    non-unique). ``"error"`` (default) raises with sample keys before
    anything is written — one small batch-sized check job;
    ``"dedup"`` keeps an arbitrary single row per key (the
    ``upsert_bucketed`` latest-wins discipline needs a tracking
    column SCD2 does not have — prefer cleaning upstream);
    ``"allow"`` skips the check (pre-r10 behavior; only safe when the
    producer guarantees uniqueness). A LEGACY table that already
    holds duplicated open versions should be deduplicated once before
    new merges (read, dropDuplicates on keys + dbt_valid_from,
    rewrite).

    Mirrors ``incremental.upsert_bucketed``: a key's entire version
    history lives in one bucket (the hash covers only ``keys``), so the
    merge scans just the affected partitions and the write swaps just
    those bucket directories via the atomic staging path.

    ``close_deleted=True`` must observe every key to detect absences,
    so it degrades to a full-table merge (all buckets affected) — the
    cost is inherent to hard-delete detection, not to this layout.

    ``emit_changes=True`` maintains the SAME exactly-once change data
    feed as ``upsert_bucketed``, carrying VERSION TRANSITIONS keyed by
    ``dbt_scd_id`` (version rows are immutable once closed, so the
    version IS the natural change unit): a newly-opened version is an
    ``insert``; a version being closed is an ``update`` whose
    postimage carries its final ``dbt_valid_to`` (with
    ``update_preimages=True``, the still-open row is committed as the
    ``update_preimage``). Nothing is ever a feed ``delete`` — SCD2
    forgets nothing. A replica maintained by
    ``incremental.apply_changes(feed, path, keys=["dbt_scd_id"])``
    therefore equals the snapshot exactly, and dim-history consumers
    read deltas instead of diffing snapshots (the fact/dim feed
    asymmetry VERDICT r7 flagged). Replay detection covers both batch
    content and ``run_ts``: two consecutive runs seeing identical
    batch content are distinct merges, while a foreachBatch redelivery
    (same batch, same deterministic run_ts) is skipped.

    ``evolve_schema=True`` accepts DRIFTED batches, closing the
    fact/dim asymmetry (the upsert family tolerates mid-stream drift,
    ``incremental.upsert_bucketed``; without this knob a new column in
    the dim source fails the merge read): the snapshot is read with
    ``mergeSchema`` and both sides are aligned to the UNION of their
    payload columns before classification — a column NEW in the batch
    surfaces as NULL on historical versions (and, when it is a
    check_col, NULL-vs-value compares as CHANGED, so the drifted key
    correctly opens a new version); a column the batch DROPPED
    surfaces as NULL on its newly-opened versions. Untouched buckets
    keep their old physical schema until ``compact_table`` — readers
    of an evolved snapshot must read with ``mergeSchema`` (as this
    sink itself does). Default stays strict.

    ``lock=True`` serializes against other locked writers via the
    table maintenance lock (see ``upsert_bucketed``).

    The layout persists in ``_cdc_table.json`` like
    ``incremental.upsert_bucketed`` (tracking_column None — versioning
    here is SCD2's validity interval, not a tracking column):
    ``n_buckets=None`` follows the table, a mismatch raises.
    """
    from cdc_data_pipeline_spark.operators.incremental import (
        _maybe_table_lock)

    # Materialize the batch ONCE (same rationale as upsert_bucketed):
    # the emptiness probe, duplicate-key guard, content digest,
    # affected-bucket set, change-feed classification and merged write
    # are all separate actions — without this each re-runs the batch
    # lineage from the source (guide §1.2). Call-scoped, not a cache.
    # The emptiness probe and the duplicate-key COUNT check are folded
    # into the locked body's single stats aggregate (r13) — the
    # separate take(1) and groupBy-count jobs every merge paid are
    # gone; only the error path (duplicates found) still runs a job
    # to sample the offending keys.
    batch = batch.localCheckpoint(eager=True)
    if on_duplicate_keys not in ("error", "dedup", "allow"):
        raise ValueError(
            f"on_duplicate_keys={on_duplicate_keys!r}: expected "
            "'error', 'dedup' or 'allow'")
    if on_duplicate_keys == "dedup":
        batch = batch.dropDuplicates(list(keys))
    with _maybe_table_lock(spark, target_path, lock, lock_ttl,
                           lock_timeout):
        _scd2_bucketed_locked(spark, target_path, batch, keys,
                              check_cols, run_ts, n_buckets,
                              close_deleted, emit_changes,
                              update_preimages, evolve_schema,
                              dup_guard=on_duplicate_keys == "error")


def _align_payloads(affected: DataFrame,
                    batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Align a drifted batch and the snapshot's affected slice to the
    UNION of their payload columns (missing side gets typed NULLs) so
    one classification join serves both schemas."""
    snap_names = {f.name for f in affected.schema.fields}
    batch_names = {f.name for f in batch.schema.fields}
    for f in affected.schema.fields:
        if f.name not in batch_names and f.name not in META_COLS:
            batch = batch.withColumn(f.name,
                                     F.lit(None).cast(f.dataType))
    for f in batch.schema.fields:
        if f.name not in snap_names:
            affected = affected.withColumn(f.name,
                                           F.lit(None).cast(f.dataType))
    return affected, batch


def _scd2_bucketed_locked(
    spark,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    check_cols: Sequence[str],
    run_ts: str,
    n_buckets: int | None,
    close_deleted: bool,
    emit_changes: bool,
    update_preimages: bool,
    evolve_schema: bool = False,
    dup_guard: bool = False,
) -> None:
    from cdc_data_pipeline_spark.operators.incremental import (
        BUCKET_COL, _commit_changes, _digest_aggs, _format_digest,
        _overwrite_buckets_atomic, _publish_table_meta,
        _read_table_meta, _resolve_table_layout, bucket_of,
        recover_table)
    from cdc_data_pipeline_spark.sources import fsutil

    def _with_run_ts(content_digest: str) -> str:
        import hashlib

        # run_ts folded in: identical batch content under a NEW run_ts
        # is a new merge, not a replay
        return (content_digest + "."
                + hashlib.md5(run_ts.encode("utf-8")).hexdigest()[:8])

    recover_table(spark, target_path)
    meta = _read_table_meta(spark, target_path)
    n_buckets = _resolve_table_layout(meta, keys, None, n_buckets)
    # ONE stats pass over the checkpointed batch (guide §1.2): the
    # 0-row guard, the duplicate-key COUNT check, the affected-bucket
    # set and (when feeding) the content digest — previously up to
    # four separate jobs (take + groupBy-count + bucket collect +
    # digest). NULL-keyed rows group together under both groupBy and
    # count_distinct-of-struct, so the duplicate check is unchanged.
    stat_aggs = [F.count(F.lit(1)).alias("__n"),
                 F.count_distinct(F.struct(*[F.col(k) for k in keys]))
                 .alias("__nkeys"),
                 F.collect_set(bucket_of(keys, n_buckets)).alias("__bset")]
    if emit_changes:
        stat_aggs += _digest_aggs(batch.columns)
    srow = batch.agg(*stat_aggs).first()
    if srow["__n"] == 0:
        return
    if dup_guard and srow["__n"] != srow["__nkeys"]:
        dupes = (batch.groupBy(*keys).count()
                 .filter(F.col("count") > 1).limit(5).collect())
        sample = [tuple(r[k] for k in keys) for r in dupes]
        raise ValueError(
            f"scd2_bucketed: batch carries duplicate key(s) "
            f"{sample}{'...' if len(dupes) == 5 else ''} — SCD2 "
            "requires one row per key per run (dbt snapshot "
            "semantics); duplicates would multiply through the "
            "classification join into exponential open-version "
            "growth. Clean upstream, or pass "
            "on_duplicate_keys='dedup' to keep an arbitrary row")
    digest = _with_run_ts(_format_digest(srow)) if emit_changes else None
    target = None
    if fsutil.exists(spark, target_path):
        try:
            reader = spark.read.option("mergeSchema", "true") \
                if evolve_schema else spark.read
            target = reader.parquet(target_path)
        except Exception:
            target = None
    if target is None:
        merged = scd2_merge(None, batch, keys, check_cols, run_ts)
        if emit_changes:
            # materialized: the init rows are a projection of the
            # batch checkpoint, and a non-empty batch always opens a
            # version — no extra checkpoint or emptiness job
            _commit_changes(spark, target_path, digest,
                            merged.withColumn("_op", F.lit("insert")),
                            materialized=True, known_nonempty=True)
        # staged per-bucket moves, not mode("overwrite") on the target:
        # a static-partitionOverwriteMode session would truncate the
        # whole directory including the feed commit just published
        stamped = merged.withColumn(BUCKET_COL, bucket_of(keys, n_buckets))
        _overwrite_buckets_atomic(stamped, target_path, None)
        _publish_table_meta(spark, target_path, keys, None, n_buckets)
        return
    if close_deleted:
        buckets = list(range(n_buckets))
        affected = target.drop(BUCKET_COL)
    else:
        buckets = sorted(srow["__bset"])
        affected = target.filter(F.col(BUCKET_COL).isin(buckets)).drop(BUCKET_COL)
    if evolve_schema:
        affected, batch = _align_payloads(affected, batch)
    history = affected.filter(F.col("dbt_valid_to").isNotNull())
    current = affected.filter(F.col("dbt_valid_to").isNull())
    cls = _scd2_classified(current, batch, keys, check_cols, run_ts,
                           close_deleted,
                           with_preimages=emit_changes and update_preimages)
    if emit_changes:
        # the change slice and the merged state are two separate
        # ACTIONS — materialize the classification once so the join
        # runs once per merge, not once per sink (guide §1.2)
        cls = cls.localCheckpoint(eager=True)
        # committed BEFORE the bucket swap (the upsert_bucketed
        # rationale: a crash in between replays with the same digest
        # and is skipped; classifying AFTER the swap would misread
        # replayed transitions)
        op = (F.when(F.col(_CLS) == "opened", F.lit("insert"))
              .when(F.col(_CLS) == "closed", F.lit(
                  "update_postimage" if update_preimages else "update"))
              .otherwise(F.lit("update_preimage")))
        changes = (cls.filter(F.col(_CLS).isin(
            "opened", "closed", "closed_pre"))
            .withColumn("_op", op).drop(_CLS))
        # materialized: the change slice is a filter of the checkpoint
        # just taken — a second checkpoint inside _commit_changes
        # would copy the same rows again (r12 paid that job); the
        # emptiness probe stays (an unchanged batch commits nothing)
        _commit_changes(spark, target_path, digest, changes,
                        materialized=True)
    merged = _scd2_state(history, cls)
    stamped = merged.withColumn(BUCKET_COL, bucket_of(keys, n_buckets))
    _overwrite_buckets_atomic(stamped, target_path, buckets)
    if meta is None:  # legacy pre-metadata table: backfill the layout
        _publish_table_meta(spark, target_path, keys, None, n_buckets)


def temporal_join(facts: DataFrame, snapshot: DataFrame, keys: Sequence[str],
                  event_ts: str, how: str = "left") -> DataFrame:
    """Point-in-time-correct enrichment: each fact row joins the SCD2
    version that was valid AT ITS EVENT TIME —
    ``dbt_valid_from <= event_ts < dbt_valid_to`` (open rows have NULL
    valid_to = valid forever). The canonical consumer of a dbt
    snapshot beyond ``dbt_valid_to IS NULL``, and the feature-store
    discipline that prevents time-travel leakage (training rows must
    see only dimension state known at event time).

    Plan: ONE join whose condition is the key equality PLUS the
    validity window — Spark extracts the equi component for the
    hash/sort-merge join and evaluates the window as an in-join
    residual, so left semantics need no second pass and no
    nested-loop. Multiplicity before the residual is versions-per-key
    (bounded by SCD2 construction); at most ONE version matches per
    fact row because validity intervals partition the timeline.
    """
    ren = snapshot
    cond = None
    for k in keys:
        ren = ren.withColumnRenamed(k, f"__r_{k}")
        c = F.col(k) == F.col(f"__r_{k}")
        cond = c if cond is None else (cond & c)
    valid = ((F.col("dbt_valid_from") <= F.col(event_ts))
             & (F.col("dbt_valid_to").isNull()
                | (F.col(event_ts) < F.col("dbt_valid_to"))))
    out = facts.join(ren, cond & valid, how)
    for k in keys:
        out = out.drop(f"__r_{k}")
    return out
