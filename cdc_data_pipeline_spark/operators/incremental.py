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

# Row cap under which a merge's per-key flag/marker frame is hinted
# broadcast (one narrow row per batch key: key columns + a boolean).
# 4M keys x ~30 B is ~120 MB framed — comfortably inside executor
# memory and far under Spark's 8 GB / 512M-row broadcast relation cap.
# The cap is on DATA (batch keys), never on cluster size: a giant
# backfill batch simply falls back to the planner's join choice.
_BCAST_KEYS_CAP = 4_000_000

# Feed-commit file sizing: target rows per parquet file for the
# change slices that inherit the classification checkpoint's
# scan-aligned partitioning (coalesce target — no shuffle). ~250k
# rows of a typical CDC row is a few tens of MB; a commit is always
# batch-bounded, so this is a DATA-derived target, not a cluster one.
_COMMIT_ROWS_PER_FILE = 250_000


def bucket_of(keys: Sequence[str], n_buckets: int) -> Column:
    """Stable key-hash bucket id — the partition key for upsert targets."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def _old_sibling(dst: str) -> str:
    """Hidden strand name for a swap's previous state: dot-PREFIXED so
    Spark's file index never discovers it. A visible
    ``<table>/__kb=5.__old__`` would parse as a partition directory
    (``__kb`` value ``"5.__old__"``) and feed every scan duplicate
    rows until the next swap of that bucket; ``.__kb=5.__old__`` is
    invisible to readers and unambiguous to recovery."""
    d = dst.rstrip("/")
    head, _, base = d.rpartition("/")
    return (head + "/" if head else "") + "." + base + ".__old__"


def _replace_dir(spark: SparkSession, dst: str, src: str) -> None:
    """Swap ``src`` into place at ``dst`` via sibling renames.

    The previous ``dst`` is renamed aside (to the hidden
    ``_old_sibling`` name) before the new data moves in, so the
    fully-written result is durable on disk before anything is
    deleted — no data is ever lost. The swap is NOT atomic though:
    between rename(dst -> old) and rename(src -> dst) the destination
    does not exist, and a crash in that window leaves the previous
    state stranded with nothing live. ``recover_swap`` (called here
    before each swap, by the IVM fold before each read, and via
    ``recover_table`` by every table merge) restores the stranded
    copy instead of deleting it.

    All FS metadata ops go through the Hadoop FileSystem API
    (``sources/fsutil``), so the same protocol runs on ``file://``,
    ``hdfs://`` or ``s3a://`` roots, not only bare local paths.
    """
    from cdc_data_pipeline_spark.sources import fsutil as fs

    old = _old_sibling(dst)
    recover_swap(spark, dst)
    fs.delete(spark, old)
    if fs.exists(spark, dst):
        fs.rename(spark, dst, old)
    fs.rename(spark, src, dst)
    fs.delete(spark, old)


def recover_swap(spark: SparkSession, dst: str) -> bool:
    """Heal one crashed swap: when ``dst`` is missing but its
    ``_old_sibling`` strand exists (a crash hit the window between
    ``_replace_dir``'s two renames), rename the stranded previous
    state back into place. Returns True when a restore happened.
    When ``dst`` exists, a leftover strand is garbage from a crash
    AFTER the swap completed — it is deleted here (leaving it would
    let a LATER legitimate drain of ``dst`` make the stale copy look
    like a crashed swap and resurrect deleted rows).

    The legacy VISIBLE strand name (``<dst>.__old__``, the naming a
    pre-dot-prefix release used) is healed the same way: an IVM mart
    (or merge result) stranded by a crash under the OLD release must
    not read as "no mart" after an upgrade — that would silently
    reset every accumulated group sum to the next batch's deltas."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    restored = False
    for old in (_old_sibling(dst), dst.rstrip("/") + ".__old__"):
        if not fs.exists(spark, old):
            continue
        if fs.exists(spark, dst):
            fs.delete(spark, old)      # completed-swap leftover
        else:
            fs.rename(spark, old, dst)
            restored = True
    return restored


def recover_table(spark: SparkSession, target_path: str) -> list[str]:
    """Crash-recovery entry point for a bucketed table — run
    automatically by every merge/rewrite before reading, and callable
    on restart. Restores (a) the whole table if a ``_rewrite_table``
    crash left it stranded at ``<table>.__old__`` (feed included),
    and (b) any bucket partition stranded at the hidden
    ``<table>/.__kb=N.__old__`` name by a crashed
    ``_overwrite_buckets_atomic`` swap; completed-swap leftovers are
    swept. Returns the restored paths (empty = nothing to heal).
    Cost is one directory listing — O(n_buckets) entries, bounded by
    the table LAYOUT, never by its age or commit count."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    restored: list[str] = []
    if _recover_rewrite(spark, target_path):
        restored.append(target_path)
    elif fs.exists(spark, target_path):
        # completed-rewrite leftovers (crash after the final rename but
        # before cleanup): a full old-table copy and/or a finished
        # staging dir sitting beside the live table — whole-table-sized
        # garbage nothing else would ever collect. Before sweeping the
        # rewrite staging dir, pull the change feed back out of it when
        # the live table has none of its own: a crash inside
        # _recover_rewrite between rename(old -> table) and its feed
        # pull leaves the table live but its feed (commits, _latest
        # pointer, anchors) marooned in .__rewrite__/_changes —
        # deleting that wholesale would silently restart the feed at
        # seq 0 and confuse every streaming consumer.
        rew = target_path.rstrip("/") + ".__rewrite__"
        rew_changes = fs.path_join(rew, CHANGES_DIR)
        t_changes = fs.path_join(target_path, CHANGES_DIR)
        if not fs.exists(spark, t_changes) \
                and fs.exists(spark, rew_changes):
            fs.rename(spark, rew_changes, t_changes)
            restored.append(t_changes)
        fs.delete(spark, target_path.rstrip("/") + ".__old__")
        fs.delete(spark, rew)
    # crashed-merge staging leaks: _overwrite_buckets_atomic stages
    # under a nonce-suffixed <table>.__staging__-<hex> sibling; a crash
    # mid-staging-write leaves that directory forever (it is never
    # reused — the nonce exists so racing writers cannot collide), so
    # sweep any found here, same as create_anchor's staging sweep.
    # Safe under the single-writer/lock contract recover_table already
    # runs under: no live merge can have one in flight concurrently.
    d = target_path.rstrip("/")
    head, _, base = d.rpartition("/")
    parent = head if head else "."
    for leak in fs.glob_names(spark, parent, base + ".__staging__-*"):
        fs.delete(spark, fs.path_join(parent, leak))
    for name in fs.list_names(spark, target_path):
        if not name.endswith(".__old__"):
            continue
        if name.startswith("."):
            victim = fs.path_join(target_path,
                                  name[1:-len(".__old__")])
            if recover_swap(spark, victim):
                restored.append(victim)
        else:
            # legacy VISIBLE strand naming (pre dot-prefix): it parses
            # as a partition directory and corrupts every scan — heal
            # it the same way, or sweep it when its bucket is live
            strand = fs.path_join(target_path, name)
            victim = fs.path_join(target_path,
                                  name[:-len(".__old__")])
            if fs.exists(spark, victim):
                fs.delete(spark, strand)
            else:
                fs.rename(spark, strand, victim)
                restored.append(victim)
    return restored


def _overwrite_buckets_atomic(merged: DataFrame, target_path: str,
                              buckets: Sequence | None,
                              partition_col: str = BUCKET_COL) -> None:
    """Write ``merged`` (carrying ``partition_col``) to a staging
    sibling, then swap ONLY the affected partition directories into
    the target. ``buckets=None`` (the CREATION path) swaps whatever
    partitions the staging write produced — discovered from one
    staging listing, no extra Spark job — which is exact when no
    bucket can be drained (nothing exists yet to drain).

    The merge plan reads the target's files; staging breaks the
    read-then-overwrite self-dependency WITHOUT relying on cache
    pinning (persist+count) or on partitionOverwriteMode=dynamic being
    set in the caller's session — correctness is self-contained.
    """
    from cdc_data_pipeline_spark.sources import fsutil as fs

    import uuid

    spark = merged.sparkSession
    # nonce-suffixed staging (the LSM staging lesson): two writers
    # racing the same table can never write into one staging dir and
    # destroy each other's in-flight data. Racing the SWAP itself
    # stays a documented single-writer contract — detected, for feed
    # tables, by the duplicate-seq check in _list_change_commits.
    tmp = target_path.rstrip("/") + f".__staging__-{uuid.uuid4().hex[:12]}"
    fs.delete(spark, tmp)
    # NOTE on file sizing (guide §6): a REBALANCE-by-bucket hint here
    # was measured (r12) to cost an extra AQE shuffle of the whole
    # affected-bucket payload per merge for no benefit — with the
    # caller's batch checkpointed, the merge plan's write already
    # lands ~1 file per bucket at bench scale, and at production
    # scale the anti-join side keeps the scan's ~128MB splits, which
    # compact_table can consolidate offline without taxing every merge.
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    fs.mkdirs(spark, target_path)     # first write: renames need a parent
    if buckets is None:
        buckets = [n.split("=", 1)[1]
                   for n in fs.list_names(spark, tmp)
                   if n.startswith(partition_col + "=")]
    for b in buckets:
        src = fs.path_join(tmp, f"{partition_col}={b}")
        dst = fs.path_join(target_path, f"{partition_col}={b}")
        if fs.exists(spark, src):
            _replace_dir(spark, dst, src)
        else:
            # an affected bucket with no staged rows is now EMPTY —
            # hard deletes can drain a whole bucket, and skipping the
            # swap would resurrect its old rows. The strand sibling
            # goes too: a stale completed-swap copy left beside a
            # drained bucket would read as a crashed swap later and
            # resurrect the deleted rows via recover_swap.
            fs.delete(spark, dst)
            fs.delete(spark, _old_sibling(dst))
    fs.delete(spark, tmp)


TABLE_META = "_cdc_table.json"


def _read_table_meta(spark: SparkSession, target_path: str) -> dict | None:
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(target_path, TABLE_META))
    if txt is None:
        return None
    import json

    return json.loads(txt)


def _publish_table_meta(spark: SparkSession, root: str, keys: Sequence[str],
                        tracking_column: str, n_buckets: int) -> None:
    from cdc_data_pipeline_spark.sources import fsutil

    import json

    fsutil.publish_text(
        spark, fsutil.path_join(root, TABLE_META),
        json.dumps({"keys": list(keys), "tracking_column": tracking_column,
                    "n_buckets": n_buckets}))


def _resolve_table_layout(meta: dict | None, keys: Sequence[str],
                          tracking_column: str,
                          n_buckets: int | None) -> int:
    """The bucket count is a TABLE property, not a call property: a
    batch stamped with a different ``n_buckets`` than the table's
    layout hashes keys into the wrong partitions, the anti-join then
    misses the old row versions living elsewhere, and the table
    silently accumulates duplicate keys. Persisted metadata makes that
    drift a loud error instead."""
    if meta is None:
        return 64 if n_buckets is None else n_buckets
    if list(keys) != list(meta["keys"]) \
            or tracking_column != meta["tracking_column"]:
        raise ValueError(
            f"table layout mismatch: table is keyed on {meta['keys']} "
            f"tracking {meta['tracking_column']!r}, caller passed "
            f"{list(keys)} / {tracking_column!r}")
    if n_buckets is not None and n_buckets != meta["n_buckets"]:
        raise ValueError(
            f"n_buckets={n_buckets} conflicts with the table's persisted "
            f"layout ({meta['n_buckets']} buckets) — pass n_buckets=None "
            f"to follow the table, or run rebucket() to change the layout")
    return meta["n_buckets"]


def upsert_bucketed(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    n_buckets: int | None = None,
    tiebreakers: Sequence[str] = (),
    evolve_schema: bool = False,
    delete_col: str | None = None,
    emit_changes: bool = False,
    update_preimages: bool = False,
    stale_protection: bool = False,
    lock: bool = False,
    lock_ttl: float = 3600.0,
    lock_timeout: float = 60.0,
) -> None:
    """M2/M3 against a hash-bucketed parquet target, touching ONLY the
    buckets the batch's keys hash into.

    ``lock=True`` takes the table's maintenance lock
    (``<table>.__maint__``, same contract as ``compact_table``'s) for
    the duration of the merge — hard exclusion for CONCURRENT batch
    upserters outside a single foreachBatch stream (which already
    serializes its own batches). Default stays lock-free: the
    single-writer contract is otherwise detect-only (duplicate-seq
    raise at feed read).

    ``stale_protection=True`` (Hudi preCombine / ClickHouse
    ReplacingMergeTree semantics) applies a batch op only when its
    tracking value is >= the target's current row — a backfill or
    out-of-order redelivery of an OLDER version becomes a no-op
    instead of silently regressing the row (and, with
    ``emit_changes``, emits nothing). Default stays batch-wins: the
    reference's delete+insert contract, and the right call when the
    feed is per-key ordered (Kafka keeps key order within a
    partition).

    ``update_preimages=True`` switches the feed to Delta-CDF-style
    update rows: each update commits an ``update_preimage`` (the row
    as it was) AND an ``update_postimage`` — the pair incremental view
    maintenance needs to subtract the old contribution and add the
    new one (``agg_deltas_from_feed``). Default keeps the single
    ``update`` row (postimage only), which replication
    (``apply_changes``) is happy with.

    This is the design that survives 100 TB: the target is partitioned
    by ``pmod(xxhash64(keys), n_buckets)``; a micro-batch (a) computes
    its bucket set (small distinct collect), (b) scans just those
    partitions (partition pruning), (c) merges, and (d) rewrites just
    those partitions (dynamic partition overwrite). Per-batch cost is
    O(affected buckets), not O(table) — the whole-table read+overwrite
    of the naive sink does not scale past a few GB.

    Idempotent under replay: latest-record-wins within the bucket.

    ``delete_col`` names a boolean column marking HARD DELETES (the
    Debezium op='d' shape): the batch is collapsed to the latest op
    per key by ``tracking_column`` first — so an upsert followed by a
    later delete for the same key deletes, and vice versa — then
    delete keys are dropped from their buckets and the column itself
    never reaches the table.

    ``emit_changes=True`` maintains a CHANGE DATA FEED under
    ``<target>/_changes`` (invisible to table scans): each merge
    commits one ``commit-<seq>-<digest>`` directory of row-level
    changes (``_op`` in insert/update/delete — deletes carry the
    preimage — plus ``_seq``), published via tmp+rename so consumers
    never see a partial commit. The digest is content-derived from
    the input batch, so a replayed micro-batch (foreachBatch redelivery)
    is recognized and NOT re-committed — the feed stays exactly-once
    while the merge itself stays idempotent. Downstream incrementals
    consume deltas (``read_changes`` / ``stream_changes``) instead of
    diffing snapshots.

    ``evolve_schema=True`` accepts drifted batches (see ``upsert``):
    the merge unions by name with missing columns as NULL, and the
    target read merges footers across buckets so earlier evolution is
    visible whatever bucket it landed in. Untouched buckets keep their
    old physical schema — readers of an evolved table must read with
    ``mergeSchema`` (as this sink itself does) until ``compact_table``
    rewrites them. Default stays strict.

    The layout (keys, tracking column, bucket count) persists in
    ``_cdc_table.json`` (``_``-prefixed: invisible to Spark scans) on
    create; later calls follow it — ``n_buckets=None`` adopts the
    table's value, an explicit mismatch raises (see
    ``_resolve_table_layout``), and a pre-metadata table is backfilled
    from the caller's values, which its data already embodies."""
    # Materialize the micro-batch ONCE: every downstream action of the
    # merge (emptiness probe, content digest, affected-bucket set, the
    # change-feed classification, the merged write) is a separate Spark
    # action, and without this each one re-runs the batch's whole
    # lineage — source scan, filters, unions — from scratch. One
    # localCheckpoint turns 4-6 recomputes into one pass (optimization
    # guide §1.2: remove redundant passes before anything else). Not a
    # cross-run cache: the checkpoint lives and dies with this call.
    # Tradeoff (ADVICE r12): the blocks live on executor local
    # storage, so losing an executor mid-merge fails the batch instead
    # of recomputing it — safe (digest replay keeps the retry
    # exactly-once) but a hard failure; clusters with dynamic
    # allocation that care should disable executor decommission
    # during merges or swap in reliable checkpoint()s.
    # The 0-row guard (reference: base_loader.py:308-310) lives in the
    # locked body's single stats aggregate — folding it there removed
    # the separate take(1) job every non-empty merge paid (r13).
    batch = batch.localCheckpoint(eager=True)
    with _maybe_table_lock(spark, target_path, lock, lock_ttl,
                           lock_timeout):
        _upsert_bucketed_locked(
            spark, target_path, batch, keys, tracking_column, n_buckets,
            tiebreakers, evolve_schema, delete_col, emit_changes,
            update_preimages, stale_protection)


def _upsert_bucketed_locked(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    n_buckets: int | None,
    tiebreakers: Sequence[str],
    evolve_schema: bool,
    delete_col: str | None,
    emit_changes: bool,
    update_preimages: bool,
    stale_protection: bool,
) -> None:
    from cdc_data_pipeline_spark.sources import fsutil

    # heal crash remnants BEFORE the existence probe and the read: a
    # stranded table would read as "new" and be re-created from this
    # batch alone, and a stranded BUCKET would be invisible to the
    # merge — its unmatched rows silently dropped when the swap then
    # destroys the strand (one bounded listing when healthy)
    recover_table(spark, target_path)
    meta = _read_table_meta(spark, target_path)
    n_resolved = _resolve_table_layout(meta, keys, tracking_column, n_buckets)
    stamped = batch.withColumn(BUCKET_COL, bucket_of(keys, n_resolved))
    # ONE stats pass over the checkpointed batch: the 0-row guard, the
    # affected-bucket set and (when feeding) the content digest —
    # previously up to three separate jobs (take(1) + bucket collect +
    # digest), each its own action (guide §1.2)
    stat_aggs = [F.count(F.lit(1)).alias("__n"),
                 F.collect_set(F.col(BUCKET_COL)).alias("__bset")]
    if emit_changes:
        stat_aggs += _digest_aggs(stamped.columns)
    srow = stamped.agg(*stat_aggs).first()
    if srow["__n"] == 0:
        # 0-row guard — also keeps an empty first micro-batch from
        # creating a file-less target dir
        return
    buckets = sorted(srow["__bset"])
    digest = _format_digest(srow) if emit_changes else None
    # latest op per key: delete/upsert ordering within the batch is
    # settled HERE, by the tracking column — one op survives per key
    deduped = latest_per_key(stamped, keys, tracking_column, tiebreakers)
    if delete_col is not None:
        is_del = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        dels = deduped.filter(is_del)
        ups = deduped.filter(~is_del).drop(delete_col)
    else:
        dels = None
        ups = deduped
    target = None
    if fsutil.exists(spark, target_path):
        try:
            reader = spark.read.option("mergeSchema", "true") \
                if evolve_schema else spark.read
            target = reader.parquet(target_path)
        except Exception:
            target = None  # dir exists but holds no data files yet
    if target is None:
        if emit_changes:
            # materialized: the feed rows are a filter/projection of
            # the batch checkpoint; with no delete column every batch
            # key provably emits one insert, so the emptiness probe
            # job is skipped too
            _commit_changes(
                spark, target_path, digest,
                ups.drop(BUCKET_COL).withColumn("_op", F.lit("insert")),
                materialized=True,
                known_nonempty=delete_col is None)
        # staged per-bucket moves, NOT mode("overwrite") on the target:
        # a static-partitionOverwriteMode session would truncate the
        # whole directory — including the _changes commit and pointer
        # just published above. Correctness must not depend on the
        # caller's session config (same rationale as the merge path).
        _overwrite_buckets_atomic(ups, target_path, None)
        _publish_table_meta(spark, target_path, keys, tracking_column,
                            n_resolved)
        return
    # partition filter prunes the scan to the affected buckets only
    affected = target.filter(F.col(BUCKET_COL).isin(buckets))
    if stale_protection:
        # Hudi-preCombine semantics: a batch op applies only when its
        # (tracking, tiebreakers) is >= the target's current row —
        # ties go to the batch (replaying an applied batch stays
        # idempotent). The probe is a column-PRUNED scan of the
        # affected buckets (keys + ordering columns only) joined to
        # the batch — O(batch + affected-bucket keys), no full-row
        # shuffle. Without this, a backfill or out-of-order delivery
        # of an older version silently regresses rows.
        order_cols = [tracking_column, *tiebreakers]
        cur = affected.select(
            *keys, *[F.col(c).alias(f"__cur_{c}") for c in order_cols])
        newer = (F.struct(*[F.col(c) for c in order_cols])
                 >= F.struct(*[F.col(f"__cur_{c}") for c in order_cols]))
        deduped = (deduped.join(cur, list(keys), "left")
                   .filter(F.col(f"__cur_{order_cols[0]}").isNull()
                           | newer)
                   .drop(*[f"__cur_{c}" for c in order_cols]))
        if deduped.isEmpty():
            return                      # fully-stale batch: no-op
        if delete_col is not None:
            is_del = F.coalesce(F.col(delete_col).cast("boolean"),
                                F.lit(False))
            dels = deduped.filter(is_del)
            ups = deduped.filter(~is_del).drop(delete_col)
        else:
            ups = deduped
        buckets = [r[0] for r in
                   deduped.select(BUCKET_COL).distinct().collect()]
        affected = target.filter(F.col(BUCKET_COL).isin(buckets))
    # flags: one row per batch key with its op kind — `deduped` is
    # already unique per key, so this needs no distinct, and one tiny
    # broadcast frame classifies every current row in a single join
    # (r12: previously four separate key-set distincts, each its own
    # broadcast-build job; r13 fused the anti + semi + flag joins)
    is_del_flag = (F.coalesce(F.col(delete_col).cast("boolean"),
                              F.lit(False)) if delete_col is not None
                   else F.lit(False))
    flags = deduped.select(*keys, is_del_flag.alias("__chg_isdel"))
    # Broadcast the key-flag frame when the stats pass PROVES it small:
    # checkpoint-backed frames carry no size statistics, so the planner
    # estimates them huge and sort-merges the classification join —
    # shuffling the AFFECTED BUCKETS (the big side) to disk every
    # merge, and freezing that 32-way layout into the classification
    # checkpoint below (33 sliver files per feed commit, measured
    # r13). The flag frame is exactly one narrow row per batch key, so
    # the batch row count bounds it; past the cap (very large
    # micro-batches) the planner's choice stands — AQE's runtime
    # sort-merge->broadcast conversion still applies there.
    if srow["__n"] <= _BCAST_KEYS_CAP:
        flags = F.broadcast(flags)
    if not emit_changes:
        anti = affected.join(flags.select(*keys), list(keys), "left_anti")
        merged = anti.unionByName(ups, allowMissingColumns=evolve_schema)
        _overwrite_buckets_atomic(merged, target_path, buckets)
        if meta is None:  # legacy pre-metadata table: backfill the layout
            _publish_table_meta(spark, target_path, keys, tracking_column,
                                n_resolved)
        return
    # ONE pass over the affected buckets (r13; guide §1.2): a single
    # left join against the batch key flags classifies every current
    # row — pass-through (`__chg_isdel` NULL: key not in batch),
    # replaced, or deleted — checkpointed so the feed commit, the
    # batch-side op classification and the staged bucket write all
    # read the materialized rows instead of re-running the target
    # scan + join per sink (the r12 shape scanned the affected
    # buckets three times per merge: semi + flag join for the feed,
    # anti join for the staging write). `__chg_isdel` is never NULL
    # on a match (coalesced to a literal), so NULL is a sound
    # absence marker even for NULL-keyed current rows, which match
    # nothing under plain equality — exactly the old anti-join
    # semantics. Call-scoped materialization, not a cross-run cache;
    # same executor-loss tradeoff as the batch checkpoint above.
    cls = affected.join(flags, list(keys), "left") \
        .localCheckpoint(eager=True)
    keep_old = cls.filter(F.col("__chg_isdel").isNull()) \
        .select(*affected.columns)
    old = cls.filter(F.col("__chg_isdel").isNotNull())
    # keys with a current version — derived from the classification,
    # NOT from a second target scan; the distinct guards legacy
    # tables holding duplicate key rows (same guard the r12 shape
    # had). Bounded by the batch key count, so the same broadcast
    # reasoning as `flags` applies.
    old_k = old.select(*keys).distinct() \
        .withColumn("__chg_has_old", F.lit(True))
    if srow["__n"] <= _BCAST_KEYS_CAP:
        old_k = F.broadcast(old_k)
    # batch-side rows classify in ONE left join: key present in the
    # target -> update, absent -> insert (r12: was an anti + a semi
    # over the same inputs — two joins computing one bit)
    ups_ops = (ups.join(old_k, list(keys), "left")
               .withColumn("_op", F.when(
                   F.col("__chg_has_old").isNotNull(),
                   F.lit("update_postimage" if update_preimages
                         else "update")).otherwise(F.lit("insert")))
               .drop("__chg_has_old"))
    parts = [ups_ops]
    if update_preimages or dels is not None:
        # old-side rows classify per OLD ROW against the per-key op
        # flag: a deleted key's old row is the delete PREIMAGE, a
        # replaced key's old row is the update_preimage (what
        # incremental view maintenance subtracts — Delta CDF)
        old_op = F.when(F.col("__chg_isdel"), F.lit("delete")) \
            .otherwise(F.lit("update_preimage"))
        keep = F.lit(True)
        if not update_preimages:
            keep = F.col("__chg_isdel")          # preimages not wanted
        if dels is None:
            keep = ~F.col("__chg_isdel")         # no deletes possible
        # COALESCE the old-row slice (narrow dependency — no shuffle,
        # no extra job): it inherits the classification checkpoint's
        # scan-aligned partitioning, so writing it as-is lands one
        # sliver per scan split in the feed commit (measured 33 files
        # at bench; thousands at scale — guide §6). The slice is
        # bounded by the batch key count, so a row-count-derived
        # partition target keeps commit files real-sized at every
        # scale; the filter work per row is trivial, so the reduced
        # parallelism costs nothing. The merged bucket write below
        # stays on the scan-aligned layout (bytes-proportional per
        # bucket — the right shape at scale).
        nf = max(1, -(-int(srow["__n"]) // _COMMIT_ROWS_PER_FILE))
        parts.append(old.filter(keep)
                     .withColumn("_op", old_op).drop("__chg_isdel")
                     .coalesce(nf))
    changes = parts[0]
    for p in parts[1:]:
        changes = changes.unionByName(p, allowMissingColumns=True)
    # committed BEFORE the bucket swap: a crash in between replays
    # with the same input digest, which is recognized and skipped,
    # while recomputing AFTER the swap would misclassify replayed
    # inserts as updates. materialized: every input is a filter of
    # the classification/batch checkpoints; with no delete column a
    # non-empty batch provably changes something, so the emptiness
    # probe is skipped too.
    _commit_changes(spark, target_path, digest,
                    changes.drop(BUCKET_COL), materialized=True,
                    known_nonempty=delete_col is None)
    merged = keep_old.unionByName(ups, allowMissingColumns=evolve_schema)
    _overwrite_buckets_atomic(merged, target_path, buckets)
    if meta is None:  # legacy pre-metadata table: backfill the layout
        _publish_table_meta(spark, target_path, keys, tracking_column,
                            n_resolved)


CHANGES_DIR = "_changes"


def _batch_digest(df: DataFrame) -> str:
    """Order-independent content digest of a batch: per-row xxhash64
    over the sorted column list, summed under two independent prime
    moduli (keeps the running sums far from long overflow under ANSI
    mode — raw 64-bit sums trip ARITHMETIC_OVERFLOW), plus the row
    count. A replayed foreachBatch delivery carries identical content,
    so its digest matches and the change-feed commit is skipped — the
    at-least-once input becomes an exactly-once feed."""
    r = df.agg(*_digest_aggs(df.columns)).first()
    return _format_digest(r)


def _digest_aggs(columns: Sequence[str]) -> list:
    """The three aggregate expressions behind ``_batch_digest``,
    exposed so callers can fold the digest into an existing one-pass
    aggregate (merge stats) instead of paying a separate job."""
    cols = [F.col(c) for c in sorted(columns)]
    h1 = F.pmod(F.xxhash64(*cols), F.lit(2147483647))
    h2 = F.pmod(F.xxhash64(F.lit(0x9e3779b9), *cols), F.lit(2147483629))
    return [F.sum(h1).alias("__dig_s1"), F.sum(h2).alias("__dig_s2"),
            F.count(F.lit(1)).alias("__dig_c")]


def _format_digest(r) -> str:
    return (f"{(r['__dig_s1'] or 0):x}.{(r['__dig_s2'] or 0):x}"
            f"-{r['__dig_c']}")


def _list_change_commits(spark: SparkSession, target_path: str) -> list[str]:
    """Sorted commit directory names. Raises when two commits carry
    the same sequence number — the signature of two writers racing one
    table (the merge protocol is single-writer; foreachBatch provides
    that within a stream). Surfacing the violation beats silently
    feeding duplicate ``_seq`` rows to every downstream collapse."""
    from cdc_data_pipeline_spark.sources import fsutil

    root = fsutil.path_join(target_path, CHANGES_DIR)
    if not fsutil.exists(spark, root):
        return []
    commits = sorted(n for n in fsutil.list_names(spark, root)
                     if n.startswith("commit-"))
    seqs = [int(c.split("-", 2)[1]) for c in commits]
    if len(set(seqs)) != len(seqs):
        dupes = sorted({x for x in seqs if seqs.count(x) > 1})
        raise RuntimeError(
            f"{root}: duplicate change-feed sequence(s) {dupes} — two "
            "writers raced this table (the merge protocol is "
            "single-writer per table); run reconcile_changes() or "
            "`table-reconcile --path <table>` to keep the "
            "first-landed commit per seq and quarantine the rest, "
            "then re-converge replicas")
    return commits


LATEST_PTR = "_latest"


def _read_latest_ptr(spark: SparkSession, target_path: str) -> dict | None:
    """The feed's ``_latest`` pointer: ``{"seq": N, "digest": "..."}``
    for the newest commit. None for pre-pointer (legacy) feeds."""
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(
        target_path, CHANGES_DIR, LATEST_PTR))
    if txt is None:
        return None
    import json

    return json.loads(txt)


def _publish_latest_ptr(spark: SparkSession, target_path: str, seq: int,
                        digest: str) -> None:
    from cdc_data_pipeline_spark.sources import fsutil

    import json

    fsutil.publish_text(
        spark, fsutil.path_join(target_path, CHANGES_DIR, LATEST_PTR),
        json.dumps({"seq": seq, "digest": digest}))


def _commit_changes(spark: SparkSession, target_path: str, digest: str,
                    changes: DataFrame, *, materialized: bool = False,
                    known_nonempty: bool = False) -> bool:
    """Publish one change-feed commit: ``commit-<seq10>-<digest>``,
    written to a dot-prefixed temp dir (hidden from listings and from
    the streaming file source) and renamed into place — consumers
    never observe a partial commit. Returns False when the NEWEST
    commit already carries this input digest (micro-batch replay).

    ``materialized=True`` promises that ``changes`` derives only from
    already-checkpointed frames (the merge's batch/classification
    checkpoints), so the defensive localCheckpoint here would be a
    THIRD materialization of the same rows — skipped (guide §1.2).
    ``known_nonempty=True`` additionally skips the emptiness probe for
    callers that can prove it from the batch shape (a non-empty batch
    with no delete column emits one change row per key by
    construction).

    Replay detection is against the newest commit ONLY — foreachBatch
    redelivers only the last uncommitted batch, so a digest seen
    deeper in the history is a batch whose content legitimately
    recurred (delete K, re-insert K, delete K again — the second
    delete's digest equals the first's but it is a NEW change) and
    must commit. Matching against the whole history would silently
    drop it from the feed while the merge still applied it, diverging
    every replica/mart/time-travel consumer.

    Hot-path cost is O(1) per merge regardless of table age: the
    newest (seq, digest) lives in an atomically-published ``_latest``
    pointer consulted first, plus one seq-prefixed glob probe that
    detects a stale pointer (crash between commit rename and pointer
    publish) before a duplicate sequence could be minted; the full
    commit-directory listing is only the repair/bootstrap path
    (legacy pre-pointer feed, deleted pointer, or stale pointer with
    a different next batch)."""
    from cdc_data_pipeline_spark.sources import fsutil

    ptr = _read_latest_ptr(spark, target_path)
    if ptr is None:
        commits = _list_change_commits(spark, target_path)
        last_seq = int(commits[-1].split("-", 2)[1]) if commits else -1
        last_digest = commits[-1].split("-", 2)[2] if commits else None
    else:
        last_seq, last_digest = int(ptr["seq"]), ptr["digest"]
    if digest == last_digest:
        return False
    if not materialized:
        # materialize once: isEmpty and the write below are separate
        # ACTIONS, so without this the change lineage runs twice
        # (ReusedExchange only dedupes within one plan). Callers whose
        # ``changes`` is already a cheap filter of a checkpoint pass
        # materialized=True and skip this copy. With the merge batch
        # checkpointed upstream, the AQE-coalesced branch partitions
        # are few, so the commit lands as 1-2 files (measured r12;
        # previously 34 slivers) without any extra rebalance shuffle.
        changes = changes.localCheckpoint(eager=True)
    if not known_nonempty and changes.isEmpty():
        # a batch that changed nothing (e.g. deletes of absent keys)
        # commits nothing — replay skips via the same empty check, so
        # no idempotency marker is needed (same hygiene as the
        # index families' no-op deletes)
        return False
    seq = last_seq + 1
    root = fsutil.path_join(target_path, CHANGES_DIR)
    taken = fsutil.glob_names(spark, root, f"commit-{seq:010d}-*")
    if taken:
        # the pointer is STALE: a crash landed commit `seq` but died
        # before the pointer publish. Two sub-cases:
        if taken[0].split("-", 2)[2] == digest:
            # the foreachBatch replay — same content, same
            # deterministic name: already committed; repair the
            # pointer and skip.
            _publish_latest_ptr(spark, target_path, seq, digest)
            return False
        # a DIFFERENT next batch (batch-mode caller that moved on):
        # blindly writing seq would mint a duplicate sequence and
        # brick every feed read. Recover the true tail with one
        # listing (the repair path), then re-run the replay check.
        commits = _list_change_commits(spark, target_path)
        last_seq = int(commits[-1].split("-", 2)[1])
        last_digest = commits[-1].split("-", 2)[2]
        _publish_latest_ptr(spark, target_path, last_seq, last_digest)
        if digest == last_digest:
            return False
        seq = last_seq + 1
    final = fsutil.path_join(root, f"commit-{seq:010d}-{digest}")
    tmp = fsutil.path_join(root, f".staging-{digest}")
    fsutil.delete(spark, tmp)
    changes.withColumn("_seq", F.lit(seq).cast("long")) \
        .write.mode("overwrite").parquet(tmp)
    fsutil.rename(spark, tmp, final)
    _publish_latest_ptr(spark, target_path, seq, digest)
    return True


def read_changes(spark: SparkSession, target_path: str,
                 since_seq: int = -1,
                 upto_seq: int | None = None) -> DataFrame | None:
    """Batch-consume the change feed: all commits with ``_seq`` >
    ``since_seq`` (consumers persist their high-water ``_seq`` and
    pass it back — the same watermark discipline as ``get_watermark``,
    but over row-level deltas instead of snapshots), optionally capped
    at ``upto_seq`` inclusive (as-of reads). Commit pruning happens on
    the directory LIST, not a data scan — commits outside the range
    are never opened. None when nothing is in range."""
    from cdc_data_pipeline_spark.sources import fsutil

    root = fsutil.path_join(target_path, CHANGES_DIR)
    dirs = [fsutil.path_join(root, c)
            for c in _list_change_commits(spark, target_path)
            if int(c.split("-", 2)[1]) > since_seq
            and (upto_seq is None or int(c.split("-", 2)[1]) <= upto_seq)]
    if not dirs:
        return None
    feed = spark.read.option("mergeSchema", "true").parquet(*dirs)
    # LINEAGE: stamp the fed table's root on the _seq column metadata
    # so downstream consumers (apply_changes) can enforce the
    # reconcile staleness guard without the caller re-passing the
    # path — the guard is fail-closed by default (VERDICT r10 #1).
    # cdc_max_seq (the newest commit in this slice, known from the
    # directory names — zero jobs) lets the consumer advance its
    # cached watermark without aggregating the feed. Column metadata
    # survives select/filter as long as _seq does.
    max_seq = max(int(d.rsplit("/", 1)[-1].split("-", 2)[1])
                  for d in dirs)
    return feed.withMetadata("_seq", {"cdc_source_root": target_path,
                                      "cdc_max_seq": max_seq})


def stream_changes(spark: SparkSession, target_path: str,
                   schema=None) -> DataFrame:
    """Streaming-consume the change feed: a parquet file-stream source
    over ``<target>/_changes`` — each published commit's files are
    discovered as they appear (the dot-prefixed staging dir is
    invisible, so partial commits never surface). ``schema`` defaults
    to whatever the feed currently holds (file stream sources cannot
    infer)."""
    if schema is None:
        got = read_changes(spark, target_path)
        if got is None:
            raise ValueError(
                f"change feed at {target_path}/{CHANGES_DIR} is empty; "
                "pass an explicit schema to stream from it")
        schema = got.schema
        # STRIP the lineage metadata read_changes stamped on _seq: a
        # file-stream source would freeze this snapshot's cdc_max_seq
        # into EVERY future micro-batch, so a foreachBatch consumer
        # calling apply_changes would cache a watermark BELOW the rows
        # it actually applied — the stale-low fail-open the staleness
        # guard exists to prevent. Streaming consumers pass
        # source_path explicitly (or inherit none) and the guard takes
        # the exact O(slice) fallback instead of a frozen lie.
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField(f.name, f.dataType, f.nullable)
            if f.name == "_seq" else f
            for f in schema.fields])
    from cdc_data_pipeline_spark.sources import fsutil

    return (spark.readStream.schema(schema)
            .option("recursiveFileLookup", "false")
            .parquet(fsutil.path_join(target_path, CHANGES_DIR, "commit-*")))


ANCHOR_PREFIX = "anchor-"


def _list_anchor_seqs(spark: SparkSession, target_path: str) -> list[int]:
    from cdc_data_pipeline_spark.sources import fsutil

    root = fsutil.path_join(target_path, CHANGES_DIR)
    if not fsutil.exists(spark, root):
        return []
    return sorted(int(n.split("-", 1)[1])
                  for n in fsutil.list_names(spark, root)
                  if n.startswith(ANCHOR_PREFIX))


def create_anchor(spark: SparkSession, target_path: str,
                  force: bool = False) -> int:
    """SNAPSHOT ANCHOR for the change feed — the Delta-checkpoint
    analogue. Materializes the table's CURRENT state (which IS the
    state as of the newest commit, between merges) under
    ``_changes/anchor-<seq>``, published via tmp+rename. ``table_at``
    then reconstructs from the newest anchor at or below the
    requested seq — O(commits since anchor), not O(feed prefix) — and
    ``vacuum_changes`` may prune commits at or below an anchor
    without losing as-of reads above it: anchors make vacuum and time
    travel compose instead of being mutually exclusive. Run between
    merges under the table's single-writer discipline (or with
    ``upsert_bucketed``'s ``lock=True`` writers, while holding the
    same lock) — in particular, after a WRITER CRASH let the stream
    replay its last batch before anchoring: a crash between the feed
    commit and the bucket swap leaves the pointer one ahead of the
    table, and an anchor cut in that window would label the old state
    with the new seq (the anchor's idempotency then pins the mislabel).
    Idempotent: an anchor that already exists for the newest seq is
    left in place — unless ``force=True``, which re-cuts it from the
    table's CURRENT state (the repair for exactly that mislabel
    hazard: once the stream has replayed its batch and the table again
    reflects the pointer seq, ``force`` replaces the suspect anchor
    instead of pinning it forever). Returns the anchored seq."""
    from cdc_data_pipeline_spark.sources import fsutil

    # heal crash strands first: an anchor cut while a bucket is
    # stranded would silently omit that bucket's rows forever
    recover_table(spark, target_path)
    ptr = _read_latest_ptr(spark, target_path)
    if ptr is not None:
        seq = int(ptr["seq"])
    else:
        commits = _list_change_commits(spark, target_path)
        if not commits:
            raise ValueError(f"{target_path} has no change feed to anchor")
        seq = int(commits[-1].split("-", 2)[1])
    root = fsutil.path_join(target_path, CHANGES_DIR)
    # sweep staging left by a crashed prior anchor attempt (a full
    # table copy nothing else collects — vacuum_anchors only matches
    # published anchors)
    for stale in fsutil.glob_names(spark, root, ".anchor-staging-*"):
        fsutil.delete(spark, fsutil.path_join(root, stale))
    final = fsutil.path_join(root, f"{ANCHOR_PREFIX}{seq:010d}")
    replace = fsutil.exists(spark, final)
    if replace and not force:
        return seq
    df = spark.read.option("mergeSchema", "true").parquet(target_path) \
        .drop(BUCKET_COL)
    tmp = fsutil.path_join(root, f".anchor-staging-{seq:010d}")
    fsutil.delete(spark, tmp)
    df.write.mode("overwrite").parquet(tmp)
    if replace:
        # force re-cut: the replacement is fully staged before the
        # suspect anchor goes — a reader never sees a missing anchor
        fsutil.delete(spark, final)
    fsutil.rename(spark, tmp, final)
    return seq


def vacuum_anchors(spark: SparkSession, target_path: str,
                   keep: int = 2) -> int:
    """Prune old snapshot anchors, keeping the newest ``keep``. An
    anchor is a FULL materialized table state (the Delta-checkpoint
    cost model — O(table) storage apiece), so a periodic
    create-anchor cadence must be paired with this or storage grows
    by one table copy per anchor. Keeping >= 1 anchor preserves
    time travel above it; pruning an anchor only loses as-of reads in
    ranges whose commits were already vacuumed below the NEXT anchor.
    Returns the number of anchors removed."""
    from cdc_data_pipeline_spark.sources import fsutil

    seqs = _list_anchor_seqs(spark, target_path)
    removed = 0
    for a in seqs[:-keep] if keep > 0 else seqs:
        fsutil.delete(spark, fsutil.path_join(
            target_path, CHANGES_DIR, f"{ANCHOR_PREFIX}{a:010d}"))
        removed += 1
    return removed


def _feed_collapse_keys(meta: dict) -> list[str]:
    """The feed's CHANGE-UNIT key, for collapsing feed slices to final
    state. Fact tables change per business key; an SCD2 snapshot
    (persisted ``tracking_column`` None) changes per VERSION — its
    feed is keyed by ``dbt_scd_id`` (open = insert, close = update),
    and collapsing it by business key would tie-break arbitrarily
    between the closing and opening version rows of one commit."""
    if meta.get("tracking_column") is None:
        return ["dbt_scd_id"]
    return list(meta["keys"])


def _resolve_feed_base(spark: SparkSession, target_path: str,
                       upto_seq: int) -> tuple[int, int]:
    """(base_seq, newest_seq) for a feed reconstruction up to
    ``upto_seq``: the newest anchor at or below it (-1 = start from
    commit 0), validated so every commit in (base, min(upto, newest)]
    is present — sequence numbers are dense, so a vacuumed-away commit
    inside the needed range is detectable. Raises when reconstruction
    would be partial. ONE place for the vacuum-safety invariant,
    shared by ``table_at`` and ``bootstrap_replica``."""
    seqs = [int(c.split("-", 2)[1])
            for c in _list_change_commits(spark, target_path)]
    base = max((a for a in _list_anchor_seqs(spark, target_path)
                if a <= upto_seq), default=-1)
    if base < 0:
        if not seqs:
            raise ValueError(f"{target_path} has no change feed")
        if seqs[0] != 0:
            raise ValueError(
                "change feed has been vacuumed below commit 0 and no "
                f"snapshot anchor covers seq {upto_seq} — "
                "reconstruction would be partial (create_anchor "
                "before vacuuming to keep time travel and replica "
                "bootstrap)")
    newest = seqs[-1] if seqs else base
    missing = sorted(set(range(base + 1, min(upto_seq, newest) + 1))
                     - set(seqs))
    if missing:
        raise ValueError(
            f"change feed commits {missing} needed up to seq "
            f"{upto_seq} have been vacuumed past the newest covering "
            f"anchor ({base}) — reconstruction would be partial")
    return base, newest


def table_at(spark: SparkSession, target_path: str, seq: int) -> DataFrame:
    """TIME TRAVEL from the change feed: the table AS OF commit
    ``seq`` — no snapshot copies per version were ever stored; the
    feed IS the version history. Reconstruction starts from the
    newest SNAPSHOT ANCHOR at or below ``seq`` when one exists
    (``create_anchor`` — cost O(commits since anchor)) and otherwise
    from commit 0 (cost O(feed prefix)); the base is then collapsed
    with the needed feed slice to the final op per change-unit key
    (deletes drop out; on an SCD2 snapshot the unit is the VERSION,
    ``dbt_scd_id``, so the result is the full snapshot as of that
    commit). Sequence numbers are dense, so a vacuumed-away commit
    inside the needed range is detected and raised — as-of reads
    survive vacuum exactly up to the newest covering anchor. For
    frequent as-of serving, materialize with ``apply_changes``."""
    if seq < 0:
        raise ValueError(f"table_at seq must be >= 0, got {seq}")
    meta = _read_table_meta(spark, target_path)
    if not meta or not meta.get("keys"):
        raise ValueError("table has no persisted layout")
    keys = _feed_collapse_keys(meta)
    base_seq, _newest = _resolve_feed_base(spark, target_path, seq)
    from cdc_data_pipeline_spark.sources import fsutil

    parts = []
    if base_seq >= 0:
        anchor = spark.read.parquet(fsutil.path_join(
            target_path, CHANGES_DIR, f"{ANCHOR_PREFIX}{base_seq:010d}"))
        parts.append(anchor.withColumn("_op", F.lit("insert"))
                     .withColumn("_seq", F.lit(base_seq).cast("long")))
    # bounded both ways on the directory list: commits past ``seq``
    # are never opened, so an as-of read near an anchor costs
    # O(commits in (anchor, seq]) however long the feed has grown
    feed = read_changes(spark, target_path, since_seq=base_seq,
                        upto_seq=seq)
    if feed is not None:
        parts.append(feed.filter(F.col("_op") != "update_preimage"))
    upto = parts[0]
    for p in parts[1:]:
        upto = upto.unionByName(p, allowMissingColumns=True)
    final = latest_per_key(upto, keys, "_seq")
    return final.filter(F.col("_op") != "delete").drop("_op", "_seq")


def vacuum_changes(spark: SparkSession, target_path: str,
                   before_seq: int, anchor_first: bool = True,
                   force: bool = False) -> int:
    """Prune change-feed commits with ``_seq`` <= ``before_seq`` —
    run once every consumer's watermark has advanced past it. The
    feed otherwise grows one directory per merge forever (the MERGE
    hot path itself is O(1) per batch — replay state lives in the
    ``_latest`` pointer — but batch readers still pay the listing and
    storage grows unbounded). Returns the number of commits removed.
    The newest commit is always kept: it is the pointer's
    repair/bootstrap source if ``_latest`` is ever lost.

    The safe path is the default path: pruning commits no snapshot
    anchor covers silently forfeits time travel and replica bootstrap
    FOREVER (``table_at``/``bootstrap_replica`` then raise — correct,
    but the capability is gone). When the prune would do that,
    ``anchor_first=True`` (default) cuts an anchor at the feed's
    newest seq first — vacuum-then-``table_at(newest)`` always
    succeeds; as-of reads strictly BELOW the pruned bound are the
    caller's explicit forfeit. ``anchor_first=False`` refuses such a
    prune unless ``force=True`` (the old fully-destructive behavior,
    now opt-in). Run between merges, same single-writer discipline as
    ``create_anchor``."""
    from cdc_data_pipeline_spark.sources import fsutil

    commits = _list_change_commits(spark, target_path)
    victims = [c for c in commits[:-1]              # never the newest
               if int(c.split("-", 2)[1]) <= before_seq]
    if victims:
        max_victim = max(int(c.split("-", 2)[1]) for c in victims)
        covered = any(a >= max_victim
                      for a in _list_anchor_seqs(spark, target_path))
        if not covered:
            if anchor_first:
                # anchors the CURRENT state at the newest seq — every
                # pruned commit is <= it, so reconstruction at or
                # above the anchor survives this vacuum
                create_anchor(spark, target_path)
            elif not force:
                raise ValueError(
                    f"vacuuming {target_path} through seq {max_victim} "
                    "would prune commits no snapshot anchor covers — "
                    "time travel and replica bootstrap would be "
                    "permanently lost. Pass anchor_first=True to cut "
                    "an anchor first (default), or force=True to "
                    "discard the capability deliberately")
    removed = 0
    for c in victims:
        fsutil.delete(spark, fsutil.path_join(
            target_path, CHANGES_DIR, c))
        removed += 1
    return removed


def maybe_vacuum_changes(spark: SparkSession, target_path: str,
                         keep_commits: int, keep_anchors: int = 2) -> int:
    """Bound a 24/7 stream's feed growth: when more than
    ``keep_commits`` commits exist, prune the oldest so exactly the
    newest ``keep_commits`` survive — cutting a snapshot anchor first
    when none covers the prune (``vacuum_changes`` default), then
    bounding the anchors themselves to ``keep_anchors``
    (``vacuum_anchors`` — each anchor is a full table copy). The feed
    analogue of ``lsm.maybe_compact_index``: without it a long-running
    stream grows one commit directory per merge forever.

    Choose ``keep_commits`` >= the slowest batch consumer's lag (in
    commits): a consumer whose watermark falls behind the prune must
    re-converge via ``bootstrap_replica`` (anchor seed + surviving
    tail) instead of ``read_changes``. Returns commits removed. Run it
    from the writer's own cadence (e.g. inside foreachBatch via the
    streaming sinks' ``vacuum_keep_commits``) so it serializes with
    merges under the single-writer contract."""
    commits = _list_change_commits(spark, target_path)
    if len(commits) <= keep_commits:
        return 0
    before = int(commits[-(keep_commits + 1)].split("-", 2)[1])
    removed = vacuum_changes(spark, target_path, before)
    vacuum_anchors(spark, target_path, keep=keep_anchors)
    return removed


CONFLICT_DIR = "_conflict"
FEED_GEN = "_generation"


class StaleFeedConsumerError(RuntimeError):
    """A feed consumer's state covers a commit that was later
    QUARANTINED by ``reconcile_changes`` — the consumer ingested rows
    the feed no longer vouches for, and incremental catch-up cannot
    repair that. Re-converge from the table: ``create_anchor`` on the
    source, then ``bootstrap_replica`` (replicas) or recompute
    (marts), then resume incremental feeds."""


#: Fail-closed generation for a torn/invalid marker: larger than any
#: real reconcile count, so EVERY consumer (whatever generation it
#: recorded from a past readable marker) is refused until the marker
#: is repaired — ``reconcile_changes`` republishes a valid one above
#: this value, after which re-bootstrapped consumers pass again.
#: (ADVICE r10: the old ``gen=1`` fallback failed OPEN for any
#: consumer already recorded at gen>=1 — exactly when the marker is
#: corrupt and nothing can be vouched.)
GEN_UNREADABLE = 2 ** 62


def read_feed_generation(spark: SparkSession, target_path: str) -> dict:
    """The feed's reconcile GENERATION marker: ``{"gen": N,
    "min_quarantined_seq": M}``. ``gen`` increments every time
    ``reconcile_changes`` quarantines commits; ``min_quarantined_seq``
    is the lowest seq ever quarantined. A consumer that synced under
    an older generation AND whose watermark reaches
    ``min_quarantined_seq`` may hold unvouched rows (VERDICT r9 #7).
    ``{"gen": 0, ...}`` for a feed that never needed reconciling.

    A marker that exists but cannot be parsed (torn write, missing
    keys, wrong types) returns ``{"gen": GEN_UNREADABLE,
    "min_quarantined_seq": -1, "corrupt": True}`` — a value that
    refuses EVERY consumer (fail-closed: coverage is unknown, so
    nothing can be vouched) until ``reconcile_changes`` repairs the
    marker."""
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(
        target_path, CHANGES_DIR, FEED_GEN))
    if txt is None:
        return {"gen": 0, "min_quarantined_seq": None}
    import json

    try:
        marker = json.loads(txt)
        gen = int(marker["gen"])
        m = marker.get("min_quarantined_seq")
        return {"gen": gen,
                "min_quarantined_seq": None if m is None else int(m)}
    except (ValueError, KeyError, TypeError):
        return {"gen": GEN_UNREADABLE, "min_quarantined_seq": -1,
                "corrupt": True}


def check_feed_vouched(spark: SparkSession, target_path: str,
                       consumer_gen: int, consumer_seq: int) -> dict:
    """Raise :class:`StaleFeedConsumerError` when a consumer that
    last synced under ``consumer_gen`` with watermark ``consumer_seq``
    may have ingested a commit that ``reconcile_changes`` later
    quarantined. Returns the current generation marker when the
    consumer is vouched (callers persist ``gen`` forward). A consumer
    still BELOW the lowest quarantined seq never saw unvouched rows
    and passes whatever its generation. A CORRUPT marker refuses
    unconditionally — coverage is unknown, so no watermark can be
    vouched; ``reconcile_changes`` repairs the marker."""
    marker = read_feed_generation(spark, target_path)
    if marker.get("corrupt"):
        raise StaleFeedConsumerError(
            f"{target_path}: feed generation marker is unreadable "
            "(torn or malformed) — no consumer state can be vouched; "
            "run reconcile_changes to repair the marker, then "
            "re-converge via create_anchor + bootstrap_replica")
    if marker["gen"] > consumer_gen:
        m = marker.get("min_quarantined_seq")
        if m is None or consumer_seq >= int(m):
            raise StaleFeedConsumerError(
                f"{target_path}: feed generation {marker['gen']} > "
                f"consumer's {consumer_gen} and the consumer watermark "
                f"{consumer_seq} covers quarantined history (min "
                f"quarantined seq {m}) — state may include rows the "
                "feed no longer vouches for; re-converge via "
                "create_anchor + bootstrap_replica (or mart recompute)")
    return marker


def reconcile_changes(spark: SparkSession, target_path: str) -> dict:
    """Repair a change feed bricked by a detected WRITER RACE: two
    unlocked batch-mode writers racing one table can mint duplicate
    sequence numbers, after which every feed read raises
    (``_list_change_commits``) until someone intervenes — detection
    without a recovery path (VERDICT r8 watch item #2). For each
    duplicated seq this keeps the commit that LANDED FIRST (oldest
    modification time, commit name as the deterministic tiebreak — the
    loser's merge raced it and its claim to that position in the
    history is the weaker one) and quarantines the rest under
    ``_changes/_conflict/`` (``_``-prefixed: invisible to Spark scans
    and to the ``commit-*`` streaming glob), then repairs the
    ``_latest`` pointer from the now-clean listing.

    Restores feed READABILITY — it cannot restore exactly-once
    semantics the race already broke: the losing writer's rows were
    merged into the TABLE but are now absent from the feed, so
    replicas/marts must be re-converged (``bootstrap_replica`` from a
    fresh anchor, or a mart recompute), and a streaming consumer that
    already ingested a quarantined commit has seen rows the feed no
    longer vouches for. The quarantined commits are kept, not
    deleted, so that audit is possible. Returns
    ``{"quarantined": [names], "latest_seq": N}``."""
    from cdc_data_pipeline_spark.sources import fsutil

    root = fsutil.path_join(target_path, CHANGES_DIR)
    by_seq: dict[int, list[str]] = {}
    for n in fsutil.list_names(spark, root):
        if n.startswith("commit-"):
            by_seq.setdefault(int(n.split("-", 2)[1]), []).append(n)
    dup_seqs = sorted(s for s, g in by_seq.items() if len(g) > 1)
    old = read_feed_generation(spark, target_path)
    if dup_seqs or old.get("corrupt"):
        # bump the feed GENERATION so consumers can detect that their
        # watermark may cover unvouched history (VERDICT r9 #7):
        # check_feed_vouched / apply_changes(source_path=...) raise
        # StaleFeedConsumerError instead of serving silently-stale
        # state, and re-converge via create_anchor+bootstrap_replica.
        # Published BEFORE the quarantine renames, crash-ordering on
        # purpose: a crash after the renames but before this marker
        # would leave a re-run seeing a clean feed and never bumping —
        # consumers of the quarantined commit would never be refused.
        # The inverse crash (marker published, renames pending) is
        # safe: the feed stays visibly bricked until reconcile
        # re-runs, and an extra generation bump is merely conservative.
        # A CORRUPT marker is repaired here too (its fail-closed
        # GEN_UNREADABLE refuses everyone until this re-publish): the
        # real lost generation is unknowable, so the repaired one is
        # GEN_UNREADABLE+1 with all history suspect (min=-1) — every
        # consumer is forced through one re-bootstrap, after which
        # the recorded generations are consistent again.
        import json as _json

        prev_min = old.get("min_quarantined_seq")
        new_min = min(dup_seqs + ([int(prev_min)]
                                  if prev_min is not None else []))
        fsutil.publish_text(
            spark, fsutil.path_join(root, FEED_GEN),
            _json.dumps({"gen": int(old["gen"]) + 1,
                         "min_quarantined_seq": new_min}))
    quarantined: list[str] = []
    for seq in dup_seqs:
        group = by_seq[seq]
        keep = min(group, key=lambda n: (
            fsutil.mtime(spark, fsutil.path_join(root, n)) or 0, n))
        qdir = fsutil.path_join(root, CONFLICT_DIR)
        fsutil.mkdirs(spark, qdir)
        for loser in group:
            if loser == keep:
                continue
            fsutil.rename(spark, fsutil.path_join(root, loser),
                          fsutil.path_join(qdir, loser))
            quarantined.append(loser)
    commits = _list_change_commits(spark, target_path)  # now raise-free
    latest = -1
    if commits:
        latest = int(commits[-1].split("-", 2)[1])
        _publish_latest_ptr(spark, target_path, latest,
                            commits[-1].split("-", 2)[2])
    return {"quarantined": quarantined, "latest_seq": latest,
            "generation": read_feed_generation(spark, target_path)["gen"]}


REPLICA_SYNC = "_feed_sync.json"


def read_replica_sync(spark: SparkSession, replica_path: str) -> dict:
    """The replica's sync record ``{"gen": G, "seq": S}``: the feed
    generation it last synced under (0 for replicas maintained by
    pre-generation code) and — when present — its applied-commit
    watermark, cached so the staleness guard is O(1) metadata instead
    of a MAX scan over a possibly-100TB replica. ``seq`` is absent
    for replicas last written by older code or by an
    ``allow_unvouched`` apply (which deliberately invalidates the
    cache — see ``apply_changes``); callers fall back to the scan."""
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(replica_path,
                                                   REPLICA_SYNC))
    if txt is None:
        return {"gen": 0, "seq": None}
    import json

    try:
        rec = json.loads(txt)
        gen = int(rec["gen"])
        seq = rec.get("seq")
        return {"gen": gen, "seq": None if seq is None else int(seq)}
    except (ValueError, KeyError, TypeError):
        return {"gen": 0, "seq": None}


def read_replica_generation(spark: SparkSession,
                            replica_path: str) -> int:
    """The feed generation this replica last synced under (0 for
    replicas maintained by pre-generation code)."""
    return read_replica_sync(spark, replica_path)["gen"]


def _write_replica_sync(spark: SparkSession, replica_path: str,
                        gen: int, seq: int | None = None) -> None:
    from cdc_data_pipeline_spark.sources import fsutil

    import json

    rec = {"gen": int(gen)}
    if seq is not None:
        rec["seq"] = int(seq)
    fsutil.publish_text(spark, fsutil.path_join(replica_path,
                                                REPLICA_SYNC),
                        json.dumps(rec))


def apply_changes(spark: SparkSession, feed: DataFrame,
                  replica_path: str, keys: Sequence[str],
                  n_buckets: int | None = None,
                  source_path: str | None = None,
                  allow_unvouched: bool = False,
                  reconverge: bool = False) -> None:
    """Maintain a REPLICA table from a change feed: collapse the feed
    to the final op per key (latest ``_seq`` wins; preimage rows never
    carry final state and are dropped), then apply it as ONE bucketed
    merge — deletes and upserts together. Cost is O(changed keys), not
    O(feed length) and not O(replica), however many commits are being
    caught up at once; applying commits one at a time gives the same
    end state (the collapse is associative). Idempotent: re-applying
    an already-applied feed slice is a no-op merge.

    A NEW replica must see the feed from commit 0 — applying a
    vacuumed feed to an empty target silently misses every row whose
    last change was pruned; use ``bootstrap_replica`` (anchor seed +
    surviving tail) in that case.

    The reconcile STALENESS GUARD (VERDICT r9 #7) is FAIL-CLOSED by
    default (VERDICT r10 #1): before applying, the replica's recorded
    feed generation and watermark are checked against the source
    feed's generation marker — if ``reconcile_changes`` quarantined a
    commit this replica already consumed, the apply raises
    :class:`StaleFeedConsumerError` instead of silently compounding
    unvouched state; on success the replica records the current
    generation. The source root comes from ``source_path`` or, when
    omitted, from the lineage ``read_changes`` stamps on the feed's
    ``_seq`` column metadata. A feed with NEITHER (hand-built, or the
    ``_seq`` column was rebuilt) raises ``ValueError`` — the ONLY
    unguarded path is the explicit ``allow_unvouched=True`` opt-out
    (``bootstrap_replica`` uses it internally: it re-vouches from the
    table side afterwards).

    ``reconverge=True`` mechanizes the refusal runbook (VERDICT r10
    #5): instead of raising, a refused consumer is rebuilt in place —
    ``create_anchor`` on the source (the table is the source of
    truth; it holds every merged row including the quarantined
    commits'), then ``bootstrap_replica`` from that anchor plus the
    clean tail, which re-vouches the replica under the feed's current
    generation. Requires a resolvable source root. A corrupt
    generation marker still raises — repairing the marker
    (``reconcile_changes``) is a table-owner action, not a
    consumer-side rebuild. NOTE: the rebuild FAST-FORWARDS the replica
    to the table's newest commit — an ``upto_seq``-capped slice's
    as-of intent does not survive a reconverge — and it uses the
    table's persisted collapse keys: caller keys that differ raise
    instead of being silently substituted (ADVICE r11)."""
    if source_path is None and not allow_unvouched:
        if "_seq" in feed.columns:
            source_path = (feed.schema["_seq"].metadata or {}).get(
                "cdc_source_root")
        if source_path is None:
            raise ValueError(
                "apply_changes: cannot locate the source feed's "
                "generation marker — the feed carries no lineage "
                "(read_changes stamps it on _seq) and no source_path "
                "was given. Pass source_path=<table root> to enable "
                "the staleness guard, or allow_unvouched=True to "
                "explicitly skip it (unsafe after a reconcile).")
    sync = None
    if source_path is not None and not allow_unvouched:
        from cdc_data_pipeline_spark.sources import fsutil

        # consumer watermark: the sync record caches it (O(1)
        # metadata); the MAX(__feed_seq) scan is only the fallback
        # for replicas last written by pre-cache code or after an
        # allow_unvouched apply (which invalidates the cache) — at
        # 100 TB the guard must not cost an O(replica) job per apply
        sync = read_replica_sync(spark, replica_path)
        consumer_seq = sync["seq"]
        if consumer_seq is None:
            consumer_seq = -1
            if fsutil.exists(spark, replica_path):
                try:
                    consumer_seq = int(
                        spark.read.parquet(replica_path)
                        .agg(F.max("__feed_seq")).first()[0] or -1)
                except Exception:
                    consumer_seq = -1
        try:
            marker = check_feed_vouched(
                spark, source_path, sync["gen"], consumer_seq)
        except StaleFeedConsumerError:
            if not reconverge:
                raise
            if read_feed_generation(spark, source_path).get("corrupt"):
                raise
            # NB (ADVICE r11): the rebuild FAST-FORWARDS the replica to
            # the table's newest commit under the table-meta keys — a
            # caller's as-of intent (an upto_seq-capped slice) and any
            # caller keys differing from the persisted layout do not
            # survive a reconverge. Surface the key substitution
            # loudly instead of silently adopting the layout.
            table_meta = _read_table_meta(spark, source_path)
            if table_meta is not None \
                    and list(keys) != _feed_collapse_keys(table_meta):
                raise ValueError(
                    f"apply_changes(reconverge=True): caller keys "
                    f"{list(keys)} differ from the source table's "
                    f"persisted collapse keys "
                    f"{_feed_collapse_keys(table_meta)} — a rebuilt "
                    "replica would silently switch key sets; pass the "
                    "table's keys or rebuild explicitly with "
                    "bootstrap_replica")
            create_anchor(spark, source_path)
            bootstrap_replica(spark, source_path, replica_path,
                              n_buckets=n_buckets)
            return
    data_cols = [c for c in feed.columns if c not in ("_op", "_seq")]
    final = latest_per_key(
        feed.filter(~F.col("_op").isin("update_preimage")),
        keys, "_seq")
    batch = final.select(
        *data_cols, (F.col("_op") == "delete").alias("__is_del"),
        F.col("_seq").alias("__feed_seq"))
    upsert_bucketed(spark, replica_path, batch, keys, "__feed_seq",
                    n_buckets=n_buckets, delete_col="__is_del")
    # __feed_seq rides along as the replica's tracking column — it IS
    # the replication watermark (MAX(__feed_seq) = last applied commit)
    meta = (feed.schema["_seq"].metadata or {}) \
        if "_seq" in feed.columns else {}
    if source_path is not None and not allow_unvouched:
        # advance the cached watermark: the slice's newest commit is
        # in the lineage metadata (from the directory names — no
        # job); a metadata-less feed costs one O(slice) aggregate.
        # Recording a seq ABOVE what a filtered feed actually applied
        # is safe — the guard only ever uses it to refuse MORE.
        applied = meta.get("cdc_max_seq")
        if applied is None:
            applied = feed.agg(F.max("_seq")).first()[0]
        new_seq = max(int(applied if applied is not None else -1),
                      int(consumer_seq))
        _write_replica_sync(spark, replica_path, marker["gen"], new_seq)
    else:
        # an UNGUARDED apply may have moved the replica past the
        # cached watermark: drop the cache (keep the generation) so
        # the next guarded apply re-derives it from the data —
        # keeping a stale-low cache would fail OPEN
        old = read_replica_sync(spark, replica_path)
        if old["seq"] is not None:
            _write_replica_sync(spark, replica_path, old["gen"], None)


def bootstrap_replica(spark: SparkSession, table_path: str,
                      replica_path: str,
                      n_buckets: int | None = None) -> int:
    """Create (or fast-forward) a replica when the feed may no longer
    reach back to commit 0. ``apply_changes`` over a VACUUMED feed
    silently builds a partial replica — the rows whose last change was
    pruned never arrive. This bootstrap seeds from the newest snapshot
    anchor (stamped at the anchor's seq so later feed slices win per
    key) and then applies the surviving feed above it — the same
    recovery a Delta reader gets from checkpoint + tail. With no
    anchor it requires a feed complete from commit 0 and raises
    otherwise, instead of converging on the wrong state. Returns the
    replica's watermark (the last applied ``_seq``) for the caller's
    incremental ``apply_changes`` cadence."""
    from cdc_data_pipeline_spark.sources import fsutil

    meta = _read_table_meta(spark, table_path)
    if meta is None:
        raise ValueError(f"{table_path} has no persisted layout")
    keys = _feed_collapse_keys(meta)
    base, newest = _resolve_feed_base(spark, table_path, 2**62)
    if base >= 0:
        anchor = spark.read.parquet(fsutil.path_join(
            table_path, CHANGES_DIR, f"{ANCHOR_PREFIX}{base:010d}"))
        seed = anchor.withColumn("__is_del", F.lit(False)) \
            .withColumn("__feed_seq", F.lit(base).cast("long"))
        upsert_bucketed(spark, replica_path, seed, keys, "__feed_seq",
                        n_buckets=n_buckets, delete_col="__is_del")
    feed = read_changes(spark, table_path, since_seq=base)
    if feed is not None:
        # allow_unvouched: the bootstrap IS the re-convergence — it
        # seeds from the table-side anchor and re-vouches below under
        # the feed's CURRENT generation, so the per-slice guard would
        # only refuse the very repair it documents
        apply_changes(spark, feed, replica_path, keys,
                      n_buckets=n_buckets, allow_unvouched=True)
    # a bootstrap converges from the TABLE-side anchor + clean tail —
    # it is the documented re-convergence after a reconcile, so it
    # vouches the replica under the feed's CURRENT generation. A
    # CORRUPT marker cannot vouch anything (recording its fail-closed
    # sentinel would pass every future check): repair it first.
    marker = read_feed_generation(spark, table_path)
    if marker.get("corrupt"):
        raise StaleFeedConsumerError(
            f"{table_path}: feed generation marker is unreadable — "
            "run reconcile_changes to repair it before bootstrapping "
            "(a bootstrap must record a real generation to vouch)")
    _write_replica_sync(spark, replica_path, marker["gen"], newest)
    return newest


def agg_deltas_from_feed(feed: DataFrame, group_cols: Sequence[str],
                         sum_cols: Sequence[str]) -> DataFrame:
    """Incremental view maintenance deltas from a change feed built
    with ``update_preimages=True``: each group's net change to
    ``SUM(col)`` and ``COUNT(*)`` — postimages and inserts add,
    preimages and deletes subtract. Merging these into a materialized
    aggregate (add deltas, drop zero-count groups) keeps it equal to a
    full recompute WITHOUT rescanning the table: per-refresh cost is
    O(feed slice), the whole point of maintaining marts from a feed at
    100 TB. Requires preimages: with postimage-only updates the old
    contribution is unknown."""
    sign = F.when(F.col("_op").isin("insert", "update_postimage",
                                    "update"), F.lit(1)) \
        .otherwise(F.lit(-1))
    aggs = [F.sum(sign * F.col(c)).alias(f"delta_{c}") for c in sum_cols]
    aggs.append(F.sum(sign).alias("delta_count"))
    return feed.groupBy(*group_cols).agg(*aggs)


def merge_agg_deltas(mart: DataFrame | None, deltas: DataFrame,
                     group_cols: Sequence[str]) -> DataFrame:
    """Fold IVM deltas into a materialized aggregate: full outer join
    on the group, add component-wise, drop groups whose count reaches
    zero. ``mart`` None bootstraps from the deltas alone."""
    if mart is None:
        return deltas.filter(F.col("delta_count") != 0)
    val_cols = [c for c in deltas.columns if c not in group_cols]
    m = mart
    for c in val_cols:
        m = m.withColumnRenamed(c, f"__m_{c}")
    joined = m.join(deltas, list(group_cols), "full_outer")
    out = joined.select(
        *group_cols,
        *[(F.coalesce(F.col(f"__m_{c}"), F.lit(0))
           + F.coalesce(F.col(c), F.lit(0))).alias(c)
          for c in val_cols])
    return out.filter(F.col("delta_count") != 0)


def recompute_mart_from_table(spark: SparkSession, table_path: str,
                              mart_path: str,
                              group_cols: Sequence[str],
                              sum_cols: Sequence[str]) -> int:
    """Mechanized MART re-convergence after a reconcile refusal
    (VERDICT r10 #5, the aggregate-side twin of
    ``apply_changes(reconverge=True)``): rebuild the IVM mart with one
    aggregate over the TABLE — the source of truth, which holds every
    merged row including the quarantined commits' — stamped at the
    table's current feed seq under the feed's CURRENT generation.
    This is the one O(table) scan the IVM path otherwise never pays,
    spent once per reconcile instead of on every refresh. Returns the
    stamped seq. A corrupt generation marker raises (repairing it is
    a table-owner action — ``reconcile_changes``)."""
    marker = read_feed_generation(spark, table_path)
    if marker.get("corrupt"):
        raise StaleFeedConsumerError(
            f"{table_path}: feed generation marker is unreadable — "
            "run reconcile_changes to repair it before recomputing "
            "(the mart must record a real generation to vouch)")
    # heal crash strands first, same as create_anchor: a recompute
    # over a table with a stranded bucket would bake the omission in
    recover_table(spark, table_path)
    ptr = _read_latest_ptr(spark, table_path)
    if ptr is not None:
        seq = int(ptr["seq"])
    else:
        commits = _list_change_commits(spark, table_path)
        seq = int(commits[-1].split("-", 2)[1]) if commits else -1
    df = spark.read.option("mergeSchema", "true").parquet(table_path)
    if BUCKET_COL in df.columns:
        df = df.drop(BUCKET_COL)
    aggs = [F.sum(c).alias(f"delta_{c}") for c in sum_cols]
    aggs.append(F.count(F.lit(1)).alias("delta_count"))
    mart = df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
    write_mart_merged(mart, mart_path, seq, feed_gen=marker["gen"])
    return seq


MART_WATERMARK = "_ivm_applied.json"


def read_mart_seq(spark: SparkSession, mart_path: str) -> int:
    """Highest feed ``_seq`` already folded into an IVM mart; -1 when
    the mart has never recorded one (bootstrap, or a mart maintained
    by pre-watermark code)."""
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(mart_path,
                                                   MART_WATERMARK))
    if txt is None:
        return -1
    import json

    return int(json.loads(txt)["seq"])


def read_mart_generation(spark: SparkSession, mart_path: str) -> int:
    """The feed generation the mart last folded under (0 for marts
    maintained by pre-generation code — see ``read_feed_generation``)."""
    from cdc_data_pipeline_spark.sources import fsutil

    txt = fsutil.read_text(spark, fsutil.path_join(mart_path,
                                                   MART_WATERMARK))
    if txt is None:
        return 0
    import json

    return int(json.loads(txt).get("gen", 0))


def write_mart_merged(df: DataFrame, mart_path: str,
                      applied_seq: int, feed_gen: int = 0) -> None:
    """``write_merged`` plus the IVM replay watermark, atomically:
    the watermark sidecar (``_``-prefixed — invisible to parquet
    scans) is written INTO the staging directory before the swap, so
    mart content and watermark always move together. A crash leaves
    either the old pair or the new pair on disk — never a new mart
    without its watermark, which is exactly the window where a
    redelivered micro-batch would fold its (non-idempotent) deltas in
    a second time and double-count every sum."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    import json

    spark = df.sparkSession
    tmp = mart_path.rstrip("/") + ".__staging__"
    fs.delete(spark, tmp)
    df.write.mode("overwrite").parquet(tmp)
    fs.publish_text(spark, fs.path_join(tmp, MART_WATERMARK),
                    json.dumps({"seq": int(applied_seq),
                                "gen": int(feed_gen)}))
    _replace_dir(spark, mart_path, tmp)


def delete_bucketed(spark: SparkSession, target_path: str,
                    keys_df: DataFrame, emit_changes: bool = False,
                    lock: bool = False, lock_ttl: float = 3600.0,
                    lock_timeout: float = 60.0) -> None:
    """Hard-delete by key from a bucketed table: prunes to the buckets
    the keys hash into, anti-joins them out, rewrites only those
    buckets. With ``emit_changes`` the feed records the deleted
    preimages (keys that matched nothing commit nothing). ``lock=True``
    serializes against other locked writers (see ``upsert_bucketed``)."""
    with _maybe_table_lock(spark, target_path, lock, lock_ttl,
                           lock_timeout):
        _delete_bucketed_locked(spark, target_path, keys_df, emit_changes)


def _delete_bucketed_locked(spark: SparkSession, target_path: str,
                            keys_df: DataFrame,
                            emit_changes: bool) -> None:
    recover_table(spark, target_path)
    meta = _read_table_meta(spark, target_path)
    if meta is None:
        raise ValueError("table has no persisted layout; run one "
                         "upsert_bucketed first")
    keys = meta["keys"]
    # materialize the key set once; the digest, bucket set, feed
    # emission and the anti-join all reuse it (same rationale as
    # upsert_bucketed's batch checkpoint)
    stamped = keys_df.select(*keys).distinct() \
        .withColumn(BUCKET_COL, bucket_of(keys, meta["n_buckets"])) \
        .localCheckpoint(eager=True)
    target = spark.read.option("mergeSchema", "true").parquet(target_path)
    stat_aggs = [F.count(F.lit(1)).alias("__n"),
                 F.collect_set(F.col(BUCKET_COL)).alias("__bset")]
    if emit_changes:
        stat_aggs += _digest_aggs(stamped.columns)
    srow = stamped.agg(*stat_aggs).first()
    buckets = sorted(srow["__bset"])
    affected = target.filter(F.col(BUCKET_COL).isin(buckets))
    small = srow["__n"] <= _BCAST_KEYS_CAP
    if emit_changes:
        # ONE pass over the affected buckets (r13, the upsert_bucketed
        # pattern): a single left join against the marked key set
        # classifies every current row as victim or survivor,
        # checkpointed so the feed commit and the bucket rewrite both
        # read the materialized rows — the r12 shape ran the semi and
        # anti joins as separate target scans. NULL marker = no match,
        # sound even for NULL-keyed rows (plain-equality join).
        marked = stamped.drop(BUCKET_COL) \
            .withColumn("__chg_del", F.lit(True))
        if small:
            # checkpoint-backed key sets carry no size stats — hint
            # the provably-small side so the big side never shuffles
            marked = F.broadcast(marked)
        cls = affected.join(marked, list(keys), "left") \
            .localCheckpoint(eager=True)
        victims = cls.filter(F.col("__chg_del").isNotNull()) \
            .select(*affected.columns)
        merged = cls.filter(F.col("__chg_del").isNull()) \
            .select(*affected.columns)
        # materialized: both slices are filters of the checkpoint; the
        # emptiness probe stays (deletes of absent keys commit nothing).
        # The victim slice is key-set-bounded — coalesce it off the
        # scan-aligned checkpoint layout so the commit lands sized
        # files, not one sliver per scan split (no shuffle; see
        # _COMMIT_ROWS_PER_FILE in the upsert path)
        nf = max(1, -(-int(srow["__n"]) // _COMMIT_ROWS_PER_FILE))
        _commit_changes(spark, target_path, _format_digest(srow),
                        victims.drop(BUCKET_COL)
                        .withColumn("_op", F.lit("delete"))
                        .coalesce(nf),
                        materialized=True)
    else:
        victims_k = stamped.drop(BUCKET_COL)
        if small:
            victims_k = F.broadcast(victims_k)
        merged = affected.join(victims_k, list(keys), "left_anti")
    _overwrite_buckets_atomic(merged, target_path, buckets)


def _recover_rewrite(spark: SparkSession, target_path: str) -> bool:
    """Heal a crashed ``_rewrite_table`` swap: when the table is
    missing but ``<table>.__old__`` exists, restore it — and if the
    crash hit after the change feed had already moved into the
    ``.__rewrite__`` staging dir, pull the feed back too. The strand
    name here is ``_rewrite_table``'s own ``<table>.__old__`` (a
    visible SIBLING of the table — it is never inside a scanned
    directory, unlike bucket strands). Returns True when a restore
    happened."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    old = target_path.rstrip("/") + ".__old__"
    if not fs.exists(spark, old) or fs.exists(spark, target_path):
        return False
    fs.rename(spark, old, target_path)
    tmp = target_path.rstrip("/") + ".__rewrite__"
    t_changes = fs.path_join(target_path, CHANGES_DIR)
    tmp_changes = fs.path_join(tmp, CHANGES_DIR)
    if not fs.exists(spark, t_changes) and fs.exists(spark, tmp_changes):
        fs.rename(spark, tmp_changes, t_changes)
    return True


def _rewrite_table(spark: SparkSession, target_path: str, meta: dict,
                   files_per_bucket: int = 1,
                   sort_by: Sequence[str] = (),
                   old_n_buckets: int | None = None) -> str:
    """Full-table rewrite under the (possibly new) layout in ``meta``:
    re-stamp buckets, cluster each bucket into ``files_per_bucket``
    files, write to a staging sibling WITH its metadata, then swap —
    readers see the old table until the swap begins. The swap itself
    is NOT atomic: it is two renames (table -> ``.__old__``, staging
    -> table) with the feed moved between them, and a crash inside
    that window leaves no live table — the previous state is stranded
    in ``.__old__``, never deleted. Every rewrite (and
    ``recover_table``) first heals such a remnant via
    ``_recover_rewrite``, so a rerun after the crash restores the
    pre-rewrite table (feed included) and redoes the rewrite from
    scratch. ``sort_by`` sorts
    rows within each task before the write so parquet row groups carry
    tight min/max statistics on those columns — scans filtering on
    them then skip whole row groups at the reader level (the
    data-skipping half of Delta's OPTIMIZE ZORDER, for the common
    single-column time-range case).

    Returns the strategy used: ``"split"`` or ``"shuffle"``. When the
    new bucket count is a MULTIPLE of the old (the natural way to grow
    — double it), the rewrite needs NO exchange: ``pmod(h, m*n)`` is
    congruent to ``pmod(h, n)`` mod ``n``, so every row of old bucket
    ``b`` lands in one of exactly ``m`` children ``{b, b+n, …,
    b+(m-1)n}`` — each scan task splits its own bucket's rows locally.
    At 100 TB that is the difference between a map-only pass and a
    full shuffle of the table; at any scale it also preserves
    within-file ordering (sort_by survives splitting for free)."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    _recover_rewrite(spark, target_path)
    keys, n = meta["keys"], meta["n_buckets"]
    df = spark.read.option("mergeSchema", "true").parquet(target_path)
    data = df.drop(BUCKET_COL).withColumn(BUCKET_COL, bucket_of(keys, n))
    f = max(int(files_per_bucket), 1)
    splittable = (old_n_buckets is not None and old_n_buckets > 0
                  and n % old_n_buckets == 0 and f == 1)
    if splittable:
        strategy = "split"          # map-only: no exchange added
        if sort_by:
            # rows arrive grouped per parent file; a task-local sort
            # restores row-group clustering without a shuffle
            data = data.sortWithinPartitions(BUCKET_COL, *sort_by)
    else:
        strategy = "shuffle"
        if f > 1:
            # salt WITHIN each bucket so one oversized bucket still splits
            salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.lit(1)),
                          F.lit(f))
            data = data.repartition(n * f, F.col(BUCKET_COL), salt)
        else:
            data = data.repartition(n, F.col(BUCKET_COL))
        if sort_by:
            data = data.sortWithinPartitions(BUCKET_COL, *sort_by)
    tmp = target_path.rstrip("/") + ".__rewrite__"
    fs.delete(spark, tmp)
    data.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
    import json

    fs.publish_text(spark, fs.path_join(tmp, TABLE_META), json.dumps(meta))
    # the _replace_dir swap, inlined so the change feed moves INSIDE
    # the protected window: a rewrite is a layout operation, not a
    # data change — no feed commit is added and none may be lost.
    # Moving it before the target->old rename would maroon the feed in
    # a staging dir a crashed run's rerun deletes wholesale.
    old = target_path.rstrip("/") + ".__old__"
    fs.delete(spark, old)
    fs.rename(spark, target_path, old)
    old_changes = fs.path_join(old, CHANGES_DIR)
    if fs.exists(spark, old_changes):
        fs.rename(spark, old_changes, fs.path_join(tmp, CHANGES_DIR))
    fs.rename(spark, tmp, target_path)
    fs.delete(spark, old)
    return strategy


def _maybe_table_lock(spark: SparkSession, target_path: str, lock: bool,
                      lock_ttl: float, lock_timeout: float):
    """Optional hard exclusion for table rewrites, same contract as
    ``lsm.maintenance_lock`` on the index families. The marker lives
    under a SIBLING root (``<table>.__maint__``): the rewrite swaps
    the table directory wholesale, which would delete a marker living
    inside it mid-hold."""
    if not lock:
        from contextlib import nullcontext

        return nullcontext()
    from cdc_data_pipeline_spark.operators.lsm import maintenance_lock

    return maintenance_lock(spark, target_path.rstrip("/") + ".__maint__",
                            ttl_sec=lock_ttl, timeout_sec=lock_timeout)


def rebucket(spark: SparkSession, target_path: str, n_buckets: int,
             keys: Sequence[str] | None = None,
             tracking_column: str | None = None,
             files_per_bucket: int = 1, sort_by: Sequence[str] = (),
             lock: bool = False, lock_ttl: float = 3600.0,
             lock_timeout: float = 60.0) -> str:
    """Change a bucketed table's layout — the grow operation. A bucket
    count fixed at table creation stops fitting as the table grows
    1000×: per-bucket merge cost in ``upsert_bucketed`` is O(bucket),
    so buckets must stay executor-sized. Rebucketing is ONE planned
    full rewrite (shuffle on the new bucket id) after which every
    incremental batch is cheap again — versus every batch paying for
    oversized buckets forever. Growing to a MULTIPLE of the current
    count (double it) is a map-only SPLIT — no shuffle at all (see
    ``_rewrite_table``); returns the strategy used. Layout args come
    from the persisted metadata; ``keys``/``tracking_column`` are only for pre-metadata
    tables. The swap is atomic; concurrent upserts remain unsafe
    during a rewrite (single-maintenance-writer contract, same as the
    index families — use ``lsm.maintenance_lock`` for hard exclusion)."""
    with _maybe_table_lock(spark, target_path, lock, lock_ttl,
                           lock_timeout):
        recover_table(spark, target_path)
        meta = _read_table_meta(spark, target_path)
        if meta is None:
            if keys is None or tracking_column is None:
                raise ValueError(
                    "table has no persisted layout; pass keys and "
                    "tracking_column to rebucket a pre-metadata table")
            meta = {"keys": list(keys), "tracking_column": tracking_column}
        old_n = meta.get("n_buckets")
        meta["n_buckets"] = int(n_buckets)
        return _rewrite_table(spark, target_path, meta, files_per_bucket,
                              sort_by, old_n_buckets=old_n)


def compact_table(spark: SparkSession, target_path: str,
                  files_per_bucket: int = 1,
                  sort_by: Sequence[str] = (), lock: bool = False,
                  lock_ttl: float = 3600.0,
                  lock_timeout: float = 60.0) -> str:
    """Maintenance rewrite under the CURRENT layout: clusters every
    bucket into ``files_per_bucket`` files (a shuffle-partition-spread
    write can leave ~shuffle.partitions files per bucket) and rewrites
    every footer with the merged schema — after ``evolve_schema``
    upserts, untouched buckets keep their old physical schema until
    this runs, forcing readers through ``mergeSchema``. Post-compact,
    a plain read sees the full schema. ``sort_by`` additionally
    clusters rows inside each bucket for row-group data skipping
    (see ``_rewrite_table``) — for a CDC table the natural choice is
    the tracking column, making time-range scans skip cold row
    groups."""
    with _maybe_table_lock(spark, target_path, lock, lock_ttl,
                           lock_timeout):
        recover_table(spark, target_path)
        meta = _read_table_meta(spark, target_path)
        if meta is None:
            raise ValueError(
                "table has no persisted layout; run one upsert_bucketed "
                "(which backfills it) or use rebucket(keys=..., "
                "tracking_column=...)")
        return _rewrite_table(spark, target_path, meta, files_per_bucket,
                              sort_by)


def table_stats(spark: SparkSession, target_path: str) -> dict:
    """Maintenance signal for a bucketed table (the table analogue of
    ``lsm.index_stats``): row counts and skew across buckets (a
    max/mean ratio ≫ 1 says hot keys or a stale layout — rebucket or
    salt), physical file count, and whether bucket footers disagree on
    schema (drift from ``evolve_schema`` upserts — compact to unify).
    Schema drift is probed per BUCKET, not per file: a bucket is
    always rewritten wholesale by one write, so all its files share
    one schema; n_buckets footer reads, no data scan."""
    from cdc_data_pipeline_spark.sources import fsutil

    meta = _read_table_meta(spark, target_path)
    df = spark.read.option("mergeSchema", "true").parquet(target_path)
    per = df.groupBy(BUCKET_COL).count().collect()  # ≤ n_buckets rows
    counts = [r["count"] for r in per]
    n_rows = sum(counts)
    skew = (max(counts) * len(counts) / n_rows) if n_rows else 0.0
    n_files = 0
    max_files = 0
    schemas = set()
    for name in fsutil.list_names(spark, target_path):
        if not name.startswith(f"{BUCKET_COL}="):
            continue
        bucket_dir = fsutil.path_join(target_path, name)
        files = [x for x in fsutil.list_names(spark, bucket_dir)
                 if x.endswith(".parquet")]
        n_files += len(files)
        max_files = max(max_files, len(files))
        if files:
            schemas.add(tuple(sorted(
                spark.read.parquet(bucket_dir).schema.fieldNames())))
    return {
        "meta": meta,
        "n_rows": n_rows,
        "n_buckets_observed": len(counts),
        "n_files": n_files,
        "max_files_per_bucket": max_files,
        "bucket_skew": round(skew, 3),
        "distinct_schemas": len(schemas),
        "schema_drift": len(schemas) > 1,
        "columns": df.schema.fieldNames(),
    }


def lookup_bucketed(spark: SparkSession, target_path: str,
                    probe: DataFrame) -> DataFrame:
    """Point lookup by key over a bucketed table — the serving-side
    counterpart of the merge's bucket pruning. Each probe key is
    stamped with the bucket its key hashes to (the table's persisted
    layout, same ``bucket_of`` the writers use), the scan is pruned to
    those PARTITIONS (``__kb`` is the partition column, so the filter
    lands in the scan's PartitionFilters and non-matching bucket
    directories are never opened — IO is O(table / n_buckets x
    buckets probed), not O(table)), and a broadcast left-semi join
    (the probe is small by definition of a point lookup) selects the
    matching rows. Crash strands are healed first: a lookup against a
    table with a stranded bucket would silently miss that bucket's
    keys. ``probe`` must carry exactly the table's key columns.

    At 100 TB this is the difference between a key fetch costing one
    bucket directory's row groups (further narrowed by parquet
    min/max pushdown on the key) and a full-table scan."""
    meta = _read_table_meta(spark, target_path)
    if meta is None:
        raise ValueError(
            f"{target_path} has no persisted layout ({TABLE_META}) — "
            "lookup_bucketed serves bucketed CDC tables only")
    keys = list(meta["keys"])
    if sorted(probe.columns) != sorted(keys):
        raise ValueError(
            f"probe columns {probe.columns} must be exactly the "
            f"table's keys {keys}")
    recover_table(spark, target_path)
    stamped = probe.dropDuplicates(keys) \
        .withColumn(BUCKET_COL, bucket_of(keys, int(meta["n_buckets"])))
    buckets = [r[0] for r in
               stamped.select(BUCKET_COL).distinct().collect()]
    df = spark.read.option("mergeSchema", "true").parquet(target_path) \
        .filter(F.col(BUCKET_COL).isin(buckets))
    return df.join(F.broadcast(stamped.select(*keys)), on=keys,
                   how="left_semi").drop(BUCKET_COL)


def fsck_table(spark: SparkSession, target_path: str,
               deep: bool = False) -> dict:
    """READ-ONLY invariant audit of a bucketed CDC table — the
    diagnostic counterpart of the repair tools (``recover_table``
    heals, ``reconcile_changes`` resolves, ``fsck_table`` only
    REPORTS, so it is always safe to run, even beside a live writer).

    Structural checks (metadata listings only, O(n_buckets +
    n_commits) names, no data scan): layout metadata parses; bucket
    partition dirs parse and sit inside the layout's id range; crash
    debris is inventoried (rewrite strand/staging siblings, merge
    staging leaks, bucket swap strands, feed/anchor staging dirs) with
    the tool that heals each; commit names are well-formed with
    duplicate-free DENSE sequences (interior gap = corruption,
    duplicate = writer race -> ``reconcile_changes``); a vacuumed
    prefix is covered by an anchor (else as-of reads below it are
    gone); the ``_latest`` pointer agrees with the newest commit
    (stale pointer = healable crash window; pointer AHEAD of the
    commits = out-of-band deletion); quarantined conflicts and a held
    maintenance lock are surfaced as info.

    ``deep=True`` adds two data-scan equivalences (O(table +
    commits-since-anchor)): every row lives in the bucket its key
    hashes to (a misbucketed row silently escapes every future merge's
    anti-join — the exact drift ``_resolve_table_layout`` exists to
    prevent), and the live table equals ``table_at(newest commit)``
    (the feed replay reproduces the table — the same equivalence the
    crash-protocol sweep pins, here checkable on demand in
    production).

    Returns ``{"ok": bool, "errors": n, "warnings": n, "findings":
    [{"severity", "check", "detail"}, ...], ...}``; ``ok`` means no
    error-severity finding (warnings are healable debris or lost
    optional capabilities, info is observability)."""
    from cdc_data_pipeline_spark.sources import fsutil as fs

    findings: list[dict] = []

    def add(severity: str, check: str, detail: str) -> None:
        findings.append({"severity": severity, "check": check,
                         "detail": detail})

    def report() -> dict:
        errors = sum(1 for f in findings if f["severity"] == "error")
        warnings = sum(1 for f in findings if f["severity"] == "warn")
        return {"path": target_path, "ok": errors == 0,
                "errors": errors, "warnings": warnings, "deep": deep,
                "findings": findings}

    d = target_path.rstrip("/")
    head, _, base = d.rpartition("/")
    parent = head if head else "."

    if not fs.exists(spark, target_path):
        if fs.exists(spark, d + ".__old__") \
                or fs.exists(spark, d + ".__rewrite__"):
            add("error", "table_missing",
                "table absent but rewrite strands exist — a rewrite "
                "crashed mid-swap; recover_table()/`table-recover` "
                "restores it")
        else:
            add("error", "table_missing", "path does not exist")
        return report()

    meta = _read_table_meta(spark, target_path)
    if meta is None:
        add("warn", "meta",
            f"no {TABLE_META} — not a bucketed CDC table (or a legacy "
            "layout); bucket-range and deep checks skipped")

    # --- sibling crash debris (each healable by an existing tool)
    if fs.exists(spark, d + ".__old__"):
        add("warn", "rewrite_strand",
            f"{base}.__old__ sibling present — crashed/unswept rewrite; "
            "recover_table() heals or sweeps it")
    if fs.exists(spark, d + ".__rewrite__"):
        add("warn", "rewrite_staging",
            f"{base}.__rewrite__ sibling present — crashed/unswept "
            "rewrite staging; recover_table() pulls any marooned feed "
            "back and sweeps it")
    for leak in fs.glob_names(spark, parent, base + ".__staging__-*"):
        add("warn", "merge_staging_leak",
            f"{leak} — crashed merge staging; recover_table() sweeps it")
    from cdc_data_pipeline_spark.operators.lsm import MAINT_LOCK

    if fs.exists(spark, fs.path_join(d + ".__maint__", MAINT_LOCK)):
        add("info", "write_lock",
            "maintenance-lock marker held — a locked writer is live, "
            "or crashed mid-hold (stale markers expire by TTL)")

    # --- bucket partitions
    bucket_ids: list[int] = []
    for name in fs.list_names(spark, target_path):
        if name.startswith(f"{BUCKET_COL}="):
            try:
                bucket_ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                add("error", "bucket_dir",
                    f"unparseable bucket partition {name!r}")
        elif name.endswith(".__old__"):
            add("warn", "bucket_strand",
                f"{name} — crashed bucket swap; recover_table() heals "
                "or sweeps it")
        elif name not in (CHANGES_DIR, TABLE_META) \
                and not name.startswith(".") \
                and not name.startswith("_"):
            add("warn", "foreign_entry",
                f"unexpected entry {name!r} inside the table root")
    if meta is not None:
        nb = int(meta["n_buckets"])
        bad = sorted(b for b in bucket_ids if not 0 <= b < nb)
        if bad:
            add("error", "bucket_range",
                f"bucket id(s) {bad} outside the layout's 0..{nb - 1} — "
                "stale layout write or foreign data; rebucket() repairs")

    # --- change feed
    root = fs.path_join(target_path, CHANGES_DIR)
    seqs: list[int] = []
    newest_digest = None
    if fs.exists(spark, root):
        names = fs.list_names(spark, root)
        for c in sorted(n for n in names if n.startswith("commit-")):
            parts = c.split("-", 2)
            if len(parts) != 3 or not parts[1].isdigit() \
                    or len(parts[1]) != 10 or not parts[2]:
                add("error", "commit_name",
                    f"malformed commit dir {c!r}")
                continue
            seqs.append(int(parts[1]))
            newest_digest = parts[2]
        dupes = sorted({s for s in seqs if seqs.count(s) > 1})
        if dupes:
            add("error", "duplicate_seq",
                f"duplicate change-feed sequence(s) {dupes} — two "
                "writers raced this table; reconcile_changes() / "
                "`table-reconcile` keeps the first-landed commit per "
                "seq and quarantines the rest")
        uniq = sorted(set(seqs))
        if uniq:
            have = set(uniq)
            gaps = [s for s in range(uniq[0], uniq[-1] + 1)
                    if s not in have]
            if gaps:
                add("error", "seq_gap",
                    f"interior commit seq(s) missing: {gaps[:10]}"
                    f"{'...' if len(gaps) > 10 else ''} — vacuum only "
                    "prunes a prefix, so a hole means out-of-band "
                    "deletion; every feed consumer past the hole "
                    "diverges")
            anchors = []
            for n in names:
                if not n.startswith(ANCHOR_PREFIX):
                    continue
                suffix = n.split("-", 1)[1]
                if suffix.isdigit():
                    anchors.append(int(suffix))
                else:
                    # same guard discipline as commit names: a
                    # malformed anchor is a FINDING, never a crash of
                    # the auditor itself (ADVICE r9)
                    add("error", "anchor_name",
                        f"malformed anchor dir {n!r} — non-numeric "
                        "seq suffix; out-of-band write or truncated "
                        "rename")
            anchors.sort()
            if uniq[0] > 0 and not any(a >= uniq[0] - 1 for a in anchors):
                add("warn", "vacuum_uncovered",
                    f"commits below seq {uniq[0]} were vacuumed with no "
                    "covering anchor — table_at()/bootstrap_replica() "
                    "below that seq are permanently unavailable "
                    "(vacuum_changes(anchor_first=True), the default, "
                    "prevents this)")
            # the pointer is untrusted input to the auditor: a torn
            # or tampered _latest must become a finding, not a crash
            # (fsck_index already treats its manifest this way;
            # ADVICE r9 closed the asymmetry)
            ptr = None
            ptr_corrupt = False
            try:
                ptr = _read_latest_ptr(spark, target_path)
                pseq = int(ptr["seq"]) if ptr is not None else None
                if ptr is not None:
                    _ = ptr["digest"]
            except Exception as exc:
                add("error", "latest_ptr_corrupt",
                    f"_latest pointer unreadable ({type(exc).__name__}: "
                    f"{exc}) — torn write or out-of-band edit; the "
                    "next merge republishes it from the newest commit")
                ptr, ptr_corrupt = None, True
            if ptr is None:
                if not ptr_corrupt:
                    add("info", "latest_ptr",
                        "no _latest pointer (legacy feed) — the next "
                        "merge publishes one")
            else:
                if pseq < uniq[-1]:
                    add("warn", "latest_ptr_stale",
                        f"_latest points at seq {pseq}, newest commit is "
                        f"{uniq[-1]} — crash between commit rename and "
                        "pointer publish; the next merge repairs it")
                elif pseq > uniq[-1]:
                    add("error", "latest_ptr_ahead",
                        f"_latest points at seq {pseq} but the newest "
                        f"commit is {uniq[-1]} — commits were deleted "
                        "out-of-band; feed consumers may have read "
                        "rows the table no longer explains")
                elif ptr["digest"] != newest_digest:
                    add("error", "latest_ptr_digest",
                        "_latest digest disagrees with the newest "
                        "commit's name — out-of-band tampering")
        if CONFLICT_DIR in names:
            add("info", "conflict_quarantine",
                f"{CHANGES_DIR}/{CONFLICT_DIR} present — a writer race "
                "was reconciled; quarantined commits kept for audit")
        for stale in (fs.glob_names(spark, root, ".anchor-staging-*")
                      + fs.glob_names(spark, root, ".staging-*")):
            add("warn", "feed_staging_leak",
                f"{stale} — crashed anchor/commit staging; the next "
                "anchor/merge sweeps it")
    else:
        add("info", "no_feed",
            "no change feed (table written without emit_changes)")

    # --- deep data-scan equivalences
    if deep and meta is not None and bucket_ids:
        df = spark.read.option("mergeSchema", "true").parquet(target_path)
        if "dbt_valid_to" in df.columns:
            # SCD2 snapshot: at most ONE open version per key — the
            # invariant duplicate batch keys silently broke before the
            # r10 on_duplicate_keys guard; duplicates multiply through
            # every later classification join (exponential growth)
            dup_open = (df.filter(F.col("dbt_valid_to").isNull())
                        .groupBy(*meta["keys"]).count()
                        .filter(F.col("count") > 1).count())
            if dup_open:
                add("error", "scd2_duplicate_open",
                    f"{dup_open} key(s) carry multiple OPEN versions — "
                    "a duplicate-key batch was merged (pre-guard "
                    "writer, or on_duplicate_keys='allow'); every "
                    "future merge of these keys multiplies them. "
                    "Deduplicate once (dropDuplicates on keys + "
                    "dbt_valid_from) and rewrite")
        mis = df.filter(
            bucket_of(meta["keys"], int(meta["n_buckets"]))
            != F.col(BUCKET_COL)).count()
        if mis:
            add("error", "misbucketed_rows",
                f"{mis} row(s) sit in a bucket their key does not hash "
                "to — future merges' anti-joins will miss them "
                "(duplicate keys incoming); rebucket() repairs")
        if seqs:
            cur = df.drop(BUCKET_COL)
            asof = table_at(spark, target_path, max(seqs))
            cols = sorted(set(cur.columns) & set(asof.columns))
            cur_c, asof_c = cur.select(*cols), asof.select(*cols)
            n_cur, n_asof = cur_c.count(), asof_c.count()
            diverged = n_cur != n_asof \
                or cur_c.exceptAll(asof_c).limit(1).count() > 0 \
                or asof_c.exceptAll(cur_c).limit(1).count() > 0
            if diverged:
                add("error", "replay_divergence",
                    f"live table ({n_cur} rows) != table_at(newest="
                    f"{max(seqs)}) ({n_asof} rows) — the feed no longer "
                    "reproduces the table (crashed half-applied write "
                    "or out-of-band edit); bootstrap replicas from the "
                    "table, not the feed, until reconciled")
            if sorted(cur.columns) != sorted(asof.columns):
                add("warn", "replay_schema_drift",
                    "live table and feed replay disagree on columns — "
                    "schema evolved without a covering anchor/commit")
    return report()


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
