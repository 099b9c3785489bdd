"""Streaming CDC sink: foreachBatch reuse of the batch merge strategies.

The reference's hourly-cron extract-merge loop (reference:
base_loader.py:631-692 driving _perform_incremental_load) becomes a
Structured Streaming query whose sink applies the SAME pure merge
functions per micro-batch — one code path for batch and streaming,
which is the idiomatic Spark CDC design.

Every persisted-index sink takes ``compact_over`` (default None =
off): after a batch lands, fold base + deltas into a fresh generation
when MORE than that many committed deltas are unfolded
(``lsm.maybe_compact_index``). Inside foreachBatch the fold is
serialized with the sink's own mutations, so the
single-maintenance-writer contract holds by construction — the one
place auto-compaction needs no external lock. Without it a 24/7
stream grows per-query read amplification without bound.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators.incremental import upsert_bucketed


def collapse_latest_op(batch_df: DataFrame, id_col: str,
                       delete_col: str | None,
                       order_col: str | None) -> DataFrame:
    """Collapse a CDC micro-batch to the LATEST operation per id.

    Debezium-style feeds routinely batch several ops for one key into
    a single micro-batch (insert then update, update then delete). The
    index sinks apply all deletes before all upserts — correct only
    when the delete is the EARLIER op. Without collapsing, an upsert
    followed by a later delete for the same id would re-insert after
    the delete and silently lose it. With ``order_col`` (an
    lsn/ts/offset column that orders ops within a key), only each
    key's final op survives, so apply-deletes-then-upserts is exact
    for any op mix. Ties on ``order_col`` resolve to the upsert (the
    same outcome the delete-then-reinsert path already produces).

    When ``order_col`` is None the sinks CANNOT know which op came
    last; input batches must then contain at most one op per key (or
    only delete-before-reinsert mixes) — this is a documented contract
    of every ``stream_upsert_to_*_index`` sink."""
    if order_col is None:
        return batch_df
    order = [F.col(order_col).desc()]
    if delete_col is not None:
        order.append(F.coalesce(F.col(delete_col),
                                F.lit(False)).cast("int").asc())
    w = Window.partitionBy(id_col).orderBy(*order)
    return (batch_df.withColumn("__opn", F.row_number().over(w))
            .filter(F.col("__opn") == 1).drop("__opn"))


def apply_trigger(writer, trigger_available_now: bool = True,
                  processing_time: str | None = None):
    """Micro-batch cadence (O4 — the reference's cron schedules,
    schedules/all_schedules.py:12-52, hourly transactions / daily
    users within a 15-minute freshness target).

    ``processing_time`` (e.g. ``"1 hour"``, ``"15 minutes"``) maps a
    cron cadence onto a continuously-running query — strictly fresher
    than cron-launched batch runs and with no per-run startup cost.
    ``trigger_available_now`` is the catch-up/backfill mode: drain
    everything available, then stop (the cron-job-shaped execution).
    """
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time)
    if trigger_available_now:
        return writer.trigger(availableNow=True)
    return writer


def default_batch_ts(batch_id: int) -> str:
    """Deterministic, strictly monotonic version timestamp per
    micro-batch: a fixed epoch plus batch_id seconds. Never wraps —
    a repeated version timestamp would collide dbt_scd_ids and break
    validity-interval monotonicity in a long-running stream."""
    from datetime import datetime, timedelta

    return (datetime(2024, 1, 1) + timedelta(seconds=batch_id)) \
        .strftime("%Y-%m-%d %H:%M:%S")


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    tracking_column: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    n_buckets: int | None = None,
    processing_time: str | None = None,
    evolve_schema: bool = False,
    delete_col: str | None = None,
    emit_changes: bool = False,
    update_preimages: bool = False,
    stale_protection: bool = False,
    vacuum_keep_commits: int | None = None,
):
    """Run a streaming query that upsert-dedup-merges every micro-batch
    into a hash-bucketed parquet target. Exactly-once-ish: the merge is
    idempotent (latest-record-wins by tracking column), so micro-batch
    replay after failure converges to the same state — same property
    the reference gets from delete-before-insert, without the
    visibility gap.

    The target is partitioned by key-hash bucket and each micro-batch
    rewrites only the buckets its keys fall in (see
    ``incremental.upsert_bucketed``) — per-batch cost stays O(batch),
    not O(table), which is what makes this sink viable at 100 TB.

    ``delete_col`` routes Debezium-style hard deletes into the merge
    (latest op per key wins by the tracking column).

    ``emit_changes=True`` maintains the table's change data feed; a
    replayed micro-batch is recognized by its content digest and not
    re-committed, so the feed is exactly-once even though foreachBatch
    delivery is at-least-once (see ``incremental.upsert_bucketed``).

    ``evolve_schema=True`` tolerates mid-stream schema drift in the
    feed (see ``incremental.upsert`` — note the stream's own source
    schema is fixed at start; this matters when the sink path is
    shared with batch writers or the stream is restarted with a wider
    schema).

    ``vacuum_keep_commits=N`` bounds the feed for a 24/7 stream: after
    each merge, prune so the newest N commits survive, auto-anchoring
    first (``incremental.maybe_vacuum_changes``) — inside foreachBatch
    the vacuum serializes with the merges, so the single-writer
    contract holds by construction (the same reasoning as
    ``compact_over`` on the index sinks). Choose N >= the slowest
    consumer's lag in commits."""
    from cdc_data_pipeline_spark.operators.incremental import (
        maybe_vacuum_changes)

    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        upsert_bucketed(spark, target_path, batch, keys, tracking_column,
                        n_buckets=n_buckets, evolve_schema=evolve_schema,
                        delete_col=delete_col, emit_changes=emit_changes,
                        update_preimages=update_preimages,
                        stale_protection=stale_protection)
        if vacuum_keep_commits is not None and emit_changes:
            maybe_vacuum_changes(spark, target_path, vacuum_keep_commits)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    return apply_trigger(writer, trigger_available_now, processing_time).start()


def stream_scd2_to_parquet(
    stream: DataFrame,
    target_path: str,
    keys,
    check_cols,
    checkpoint_dir: str,
    ts_of_batch=None,
    trigger_available_now: bool = True,
    n_buckets: int | None = None,
    processing_time: str | None = None,
    emit_changes: bool = False,
    update_preimages: bool = False,
    evolve_schema: bool = False,
    vacuum_keep_commits: int | None = None,
    on_duplicate_keys: str = "error",
):
    """Maintain an SCD2 snapshot from a change stream: each micro-batch
    is merged with the `check` strategy (reference: the users snapshot,
    dbt_project/dbt/snapshots/users_snapshot.sql:1-18, fed hourly by
    cron — here the feed is a real stream).

    ``on_duplicate_keys`` passes through to ``scd2_bucketed``: a CDC
    micro-batch can legitimately carry several changes of one key;
    SCD2's check strategy snapshots STATES, not events, so either
    collapse upstream to latest-per-key (the correct fix — an order
    column exists in a real CDC feed) or pass ``"dedup"`` to keep an
    arbitrary row. The default ``"error"`` fails the stream loudly —
    strictly better than the silent open-version multiplication it
    replaced.

    ``emit_changes=True`` maintains the snapshot's change data feed
    (version transitions keyed by dbt_scd_id, exactly-once under
    redelivery because the commit digest folds in the deterministic
    per-batch run_ts — see ``scd2.scd2_bucketed``); dim-history
    consumers then read deltas instead of diffing snapshots.

    ``ts_of_batch(batch_id) -> str`` supplies the version timestamp per
    micro-batch. The default derives it monotonically from the full
    batch_id (no wrap, ever: a long-running stream must never reuse a
    version timestamp or dbt_scd_id collides and validity intervals go
    non-monotonic), staying deterministic for replay.

    The snapshot is partitioned by key-hash bucket and each micro-batch
    rewrites only the buckets its keys fall in (scd2.scd2_bucketed) —
    per-batch cost stays O(batch), not O(table), same design as the
    upsert sink above. ``vacuum_keep_commits`` bounds the feed like
    the upsert sink's knob (auto-anchored, serialized in-batch).
    """
    from cdc_data_pipeline_spark.operators.incremental import (
        maybe_vacuum_changes)
    from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed

    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        run_ts = ts_of_batch(batch_id) if ts_of_batch else default_batch_ts(batch_id)
        scd2_bucketed(spark, target_path, batch, keys, check_cols, run_ts,
                      n_buckets=n_buckets, emit_changes=emit_changes,
                      update_preimages=update_preimages,
                      evolve_schema=evolve_schema,
                      on_duplicate_keys=on_duplicate_keys)
        if vacuum_keep_commits is not None and emit_changes:
            maybe_vacuum_changes(spark, target_path, vacuum_keep_commits)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    return apply_trigger(writer, trigger_available_now, processing_time).start()


def stream_ivm_to_parquet(
    spark,
    table_path: str,
    mart_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
    reconverge: bool = False,
):
    """Continuously-maintained materialized aggregate: stream a
    table's CHANGE DATA FEED (``incremental.stream_changes``) and fold
    each micro-batch's IVM deltas into a persisted mart — the
    bronze-table -> gold-mart path with NO rescans of the table, ever.
    Per-refresh cost is O(feed slice) + O(mart); the mart is
    group-cardinality-sized (not table-sized), so the full atomic
    rewrite per batch is the cheap part. Requires the feed to carry
    update preimages (``update_preimages=True`` on the table's sink) —
    postimage-only updates cannot be subtracted.

    Replay-safe against REDELIVERY, not just restart: delta addition
    is non-idempotent, so a batch redelivered after a crash between
    the mart swap and the streaming checkpoint commit must not fold
    twice. The mart carries the highest applied feed ``_seq`` in a
    sidecar swapped atomically WITH it (``incremental.read_mart_seq``
    / ``write_mart_merged``); each batch first drops rows at or below
    that watermark, so an already-folded slice contributes nothing on
    redelivery — whatever the checkpoint believed.

    ``reconverge=True`` (VERDICT r10 #5) mechanizes the refusal
    runbook: instead of failing the stream, a mart refused by the
    staleness guard is REBUILT with one aggregate over the table
    (``incremental.recompute_mart_from_table`` — the source of truth,
    stamped at the table's current seq under the current generation),
    then folding resumes; redelivered/quarantined slices at or below
    the recompute seq drop out of the fold as always. A corrupt
    generation marker still fails the stream (repairing it is a
    table-owner action)."""
    from cdc_data_pipeline_spark.operators.incremental import (
        StaleFeedConsumerError, agg_deltas_from_feed,
        check_feed_vouched, merge_agg_deltas, read_mart_generation,
        read_mart_seq, recompute_mart_from_table, recover_swap,
        stream_changes, write_mart_merged)
    from cdc_data_pipeline_spark.sources import fsutil

    feed = stream_changes(spark, table_path)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # heal a crashed mart swap BEFORE reading: a strand left
        # between _replace_dir's two renames would otherwise read as
        # "no mart" (and watermark -1), silently resetting every
        # accumulated group sum to this batch's deltas alone
        recover_swap(spark, mart_path)
        applied = read_mart_seq(spark, mart_path)
        # reconcile staleness guard (VERDICT r9 #7): if a commit this
        # mart already folded was later quarantined by
        # reconcile_changes, its sums include rows the feed no longer
        # vouches for — fail the stream loudly (operator recomputes
        # the mart) or, with reconverge=True, recompute it here
        try:
            marker = check_feed_vouched(
                spark, table_path,
                read_mart_generation(spark, mart_path), applied)
        except StaleFeedConsumerError:
            if not reconverge:
                raise
            applied = recompute_mart_from_table(
                spark, table_path, mart_path, group_cols, sum_cols)
            marker = check_feed_vouched(spark, table_path,
                                        read_mart_generation(
                                            spark, mart_path),
                                        applied)
        fresh = batch.filter(F.col("_seq") > applied)
        if fresh.isEmpty():
            return                     # redelivered, already folded
        new_max = fresh.agg(F.max("_seq").alias("m")).first()["m"]
        deltas = agg_deltas_from_feed(fresh, group_cols, sum_cols)
        mart = None
        if fsutil.exists(spark, mart_path):
            try:
                mart = spark.read.parquet(mart_path)
            except Exception:
                mart = None
        merged = merge_agg_deltas(mart, deltas, group_cols)
        write_mart_merged(merged, mart_path, max(applied, int(new_max)),
                          feed_gen=marker["gen"])

    writer = (
        feed.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    return apply_trigger(writer, trigger_available_now, processing_time).start()


def stream_rollup_to_parquet(
    stream: DataFrame,
    target_path: str,
    time_col: str,
    width: str,
    group_cols: Sequence[str],
    specs: Sequence[tuple],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Continuous-aggregate maintenance as a streaming sink: every
    micro-batch's per-bucket partials merge into the rollup table via
    ``operators.rollup.incremental_rollup`` — only the time partitions
    the batch touches are rewritten (atomic staging swap), so per-batch
    cost tracks batch size, not table size or stream age.

    Versus a windowed streaming aggregation with watermarking, this
    trades bounded state for bounded WRITES: there is no state store
    at all (the rollup table IS the state, merged as a monoid), late
    data of ANY lateness folds in correctly, and the output is a plain
    parquet table that batch queries read directly.
    """
    from cdc_data_pipeline_spark.operators.rollup import incremental_rollup

    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        incremental_rollup(spark, target_path, batch, time_col, width,
                           group_cols, specs)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    return apply_trigger(writer, trigger_available_now, processing_time).start()


def stream_aggregate_to_versioned(
    agg_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Complete-mode aggregate -> atomically versioned table: each
    micro-batch publishes the FULL current aggregate as a new version
    (sources/versioned.py), so downstream readers always see one
    consistent snapshot — never a half-rewritten aggregate — and can
    pin or roll back to any earlier micro-batch's state.

    The publish cost is O(aggregate), not O(stream): right-sized for
    rollup tables (the continuously-republished dashboard shape).
    Pair with vacuum_versions on a schedule to bound history.
    """
    from cdc_data_pipeline_spark.sources.versioned import publish_version

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # heal_crashed: Structured Streaming guarantees one active
        # query per checkpoint, so this sink is the declared single
        # writer and a restarted query may reclaim its own torn dirs
        publish_version(batch_df, table_path, heal_crashed=True)

    writer = (agg_stream.writeStream.outputMode("complete")
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_append_to_ivf_index(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pq_dim: int | None = None,
    compact_over: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Streaming embedding ingest into a persisted ANN index: each
    micro-batch is assigned against the STORED centroids (and encoded
    with the stored codebooks when ``pq_dim`` is set — the IVF-PQ
    form) and appended to its cell partitions
    (``operators/index.py::append_to_*``). The CDC-to-serving shape:
    the index stays queryable throughout, new vectors become
    searchable one micro-batch after arrival, and each batch touches
    only its own cells' directories. Rebuild on drift, as with the
    batch append."""
    from cdc_data_pipeline_spark.operators.index import (
        append_to_ivf_index, append_to_ivfpq_index)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if pq_dim is not None:
            append_to_ivfpq_index(spark, index_path, batch_df, pq_dim,
                                  vec_col, id_col)
        else:
            append_to_ivf_index(spark, index_path, batch_df, vec_col, id_col)
        lsm.maybe_compact_index(spark, index_path, compact_over)

    writer = (vec_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_upsert_to_ivf_index(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pq_dim: int | None = None,
    delete_col: str | None = None,
    order_col: str | None = None,
    compact_over: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Full CDC ingest into a persisted ANN index: latest-wins UPSERT
    per micro-batch (a changed embedding replaces its prior version
    via a root-addressed tombstone even when it moves to a different
    cell — ``operators/index.py::upsert_into_*``), with optional
    DELETE handling: rows whose boolean ``delete_col`` is true
    tombstone the vector instead of replacing it (the Debezium
    ``op = d`` shape after ``streaming/debezium.py`` normalization).
    ``pq_dim`` selects the IVF-PQ form. Replay-idempotent (op-prefixed
    content-digest deltas); single-maintainer like the append sink.

    ``order_col`` (an lsn/ts/offset ordering ops within a key):
    collapses each micro-batch to the latest op per id BEFORE
    splitting deletes from upserts (``collapse_latest_op``), so a
    batch carrying upsert-then-later-delete for one id applies the
    delete. WITHOUT it, batches must contain at most one op per key
    (or only delete-before-reinsert mixes) — an upsert after a later
    delete for the same id would silently undo the delete."""
    from cdc_data_pipeline_spark.operators.index import (
        delete_from_ivf_index, upsert_into_ivf_index,
        upsert_into_ivfpq_index)

    def upsert(spark, batch_df: DataFrame) -> None:
        if pq_dim is not None:
            upsert_into_ivfpq_index(spark, index_path, batch_df, pq_dim,
                                    vec_col, id_col)
        else:
            upsert_into_ivf_index(spark, index_path, batch_df,
                                  vec_col, id_col)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = collapse_latest_op(batch_df, id_col, delete_col,
                                      order_col)
        if delete_col is not None:
            dels = batch_df.filter(F.col(delete_col)).select(id_col)
            ups = batch_df.filter(~F.coalesce(F.col(delete_col),
                                              F.lit(False)))
            # deletes first: a same-batch re-insert of a deleted id
            # must land as the LIVE copy
            if not dels.isEmpty():
                delete_from_ivf_index(spark, index_path, dels, id_col)
            if not ups.isEmpty():
                upsert(spark, ups)
        else:
            upsert(spark, batch_df)
        lsm.maybe_compact_index(spark, index_path, compact_over)

    writer = (vec_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_append_to_text_index(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_over: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Streaming document ingest into the persisted inverted text
    index (``operators/text_index.py``): each micro-batch tokenizes
    its documents and appends postings/doclens plus vocab/stats DELTA
    rows — the index stays queryable throughout, new documents become
    searchable one micro-batch after arrival, and BM25 statistics
    (df, n_docs, avgdl) remain EXACT because search sums the deltas.
    Replay-idempotent under foreachBatch's at-least-once redelivery
    (the batch append anti-joins its own doc-hash buckets)."""
    from cdc_data_pipeline_spark.operators.text_index import (
        append_to_text_index)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_text_index(batch_df.sparkSession, index_path, batch_df,
                             text_col, id_col)
        lsm.maybe_compact_index(batch_df.sparkSession, index_path,
                                compact_over)

    writer = (doc_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_upsert_to_text_index(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    delete_col: str | None = None,
    order_col: str | None = None,
    compact_over: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Full CDC ingest into the persisted inverted text index:
    latest-wins UPSERT per micro-batch (changed documents replace
    their prior version via root-addressed tombstones,
    ``operators/text_index.upsert_into_text_index``), with optional
    DELETE handling — rows whose boolean ``delete_col`` is true
    tombstone the document instead of replacing it (the Debezium
    ``op = d`` shape after ``streaming/debezium.py`` normalization).
    BM25 statistics stay exact through both paths. Replay-idempotent:
    both operations commit op-prefixed content-digest delta
    directories. Single-maintainer: do not run alongside another
    writer on the same index (foreachBatch serializes batches within
    this one stream, which is the supported topology).

    ``order_col`` (lsn/ts/offset): collapses the batch to the latest
    op per id before splitting (``collapse_latest_op``) so
    upsert-then-later-delete mixes apply the delete; without it,
    batches must carry at most one op per key (or only
    delete-before-reinsert mixes)."""
    from cdc_data_pipeline_spark.operators.text_index import (
        delete_from_text_index, upsert_into_text_index)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = collapse_latest_op(batch_df, id_col, delete_col,
                                      order_col)
        if delete_col is not None:
            dels = batch_df.filter(F.col(delete_col)).select(id_col)
            ups = batch_df.filter(~F.coalesce(F.col(delete_col),
                                              F.lit(False)))
            # deletes first: a same-batch re-insert of a deleted id
            # (rare, but CDC replays produce it) must land as the
            # LIVE copy
            if not dels.isEmpty():
                delete_from_text_index(spark, index_path, dels, id_col)
            if not ups.isEmpty():
                upsert_into_text_index(spark, index_path, ups,
                                       text_col, id_col)
        else:
            upsert_into_text_index(spark, index_path, batch_df,
                                   text_col, id_col)
        lsm.maybe_compact_index(spark, index_path, compact_over)

    writer = (doc_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_upsert_to_lsh_index(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    delete_col: str | None = None,
    order_col: str | None = None,
    compact_over: int | None = None,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Full CDC ingest into the persisted MinHash-LSH dedup index:
    latest-wins UPSERT per micro-batch (a re-ingested document whose
    text changed replaces its prior signature rows via root-addressed
    tombstones, ``operators/dedup_index.upsert_lsh_index`` — even
    though the new text signs into different band buckets), with
    optional DELETE handling — rows whose boolean ``delete_col`` is
    true tombstone the document instead (the Debezium ``op = d`` shape
    after ``streaming/debezium.py`` normalization). Near-dup queries
    against the index stay exact through both paths. Replay-idempotent
    (op-prefixed content-digest deltas); single-maintainer like the
    text/ANN sinks (foreachBatch serializes batches within this one
    stream, which is the supported topology).

    ``order_col`` (lsn/ts/offset): collapses the batch to the latest
    op per id before splitting (``collapse_latest_op``) so
    upsert-then-later-delete mixes apply the delete; without it,
    batches must carry at most one op per key (or only
    delete-before-reinsert mixes)."""
    from cdc_data_pipeline_spark.operators.dedup_index import (
        delete_from_lsh_index, upsert_lsh_index)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = collapse_latest_op(batch_df, id_col, delete_col,
                                      order_col)
        if delete_col is not None:
            dels = batch_df.filter(F.col(delete_col)).select(id_col)
            ups = batch_df.filter(~F.coalesce(F.col(delete_col),
                                              F.lit(False)))
            # deletes first: a same-batch re-insert of a deleted id
            # must land as the LIVE copy
            if not dels.isEmpty():
                delete_from_lsh_index(spark, index_path, dels, id_col)
            if not ups.isEmpty():
                upsert_lsh_index(spark, index_path, ups, text_col, id_col)
        else:
            upsert_lsh_index(spark, index_path, batch_df, text_col, id_col)
        lsm.maybe_compact_index(spark, index_path, compact_over)

    writer = (doc_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()


def stream_curate_to_corpus(
    doc_stream: DataFrame,
    corpus_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    stopwords=("the", "a"),
    min_stop_hits: int = 1,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
):
    """Streaming corpus curation: each document micro-batch is quality
    gated (Gopher panel), near-dup-checked against EVERYTHING already
    ingested via the persisted MinHash-LSH index (prefix-pruned reads
    — historical lookup cost is proportional to the batch, not the
    corpus), fuzzy-deduped within itself, and the survivors land in a
    hash-bucketed corpus sink + their signatures in the index.

    Composition of independently-tested pieces: gopher_quality ->
    query_lsh_index + lsh_candidate_pairs/dedup_clusters ->
    upsert_bucketed + append_lsh_index.

    Delivery semantics: the corpus sink is ``upsert_bucketed`` (keyed
    merge, O(batch) bucket rewrite) — a REPLAYED batch upserts the
    same keys and changes nothing, so the corpus is exactly-once under
    at-least-once foreachBatch. The index append commits one
    content-digest-named delta with a last-written ``_COMMIT`` marker
    (``dedup_index.append_lsh_index``), so a REPLAYED batch
    early-returns on the marker — the whole handler is idempotent.
    """
    from cdc_data_pipeline_spark.operators.curation import gopher_quality
    from cdc_data_pipeline_spark.operators.dedup import (
        dedup_clusters, dedup_exact, lsh_candidate_pairs)
    from cdc_data_pipeline_spark.operators.dedup_index import (
        append_lsh_index, query_lsh_index)
    from cdc_data_pipeline_spark.operators.incremental import (
        upsert_bucketed)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        gated = (batch.join(
            gopher_quality(batch, text_col=text_col, id_col=id_col,
                           min_words=min_words, stopwords=stopwords,
                           min_stop_hits=min_stop_hits)
            .select(id_col, "passes"), id_col)
            .filter("passes").drop("passes")
            .localCheckpoint())
        if gated.isEmpty():
            return
        # exact + fuzzy dedup WITHIN the batch
        exact = gated.join(
            dedup_exact(gated, text_col, id_col).select(id_col), id_col)
        pairs = lsh_candidate_pairs(exact, text_col, id_col)
        keep = (dedup_clusters(exact, pairs, id_col=id_col)
                .filter(F.col("is_canonical")).select(id_col))
        batch_kept = exact.join(keep, id_col)
        # near-dup AGAINST HISTORY via the prefix-pruned index
        dup_vs_hist = (query_lsh_index(spark, index_path, batch_kept,
                                       text_col, id_col)
                       .select(F.col("id_new").alias(id_col)).distinct())
        survivors = batch_kept.join(dup_vs_hist, id_col, "left_anti") \
                              .localCheckpoint()
        if survivors.isEmpty():
            return
        # keyed merge first (idempotent), then signatures
        upsert_bucketed(spark, corpus_path,
                        survivors.withColumn("__ingest_batch",
                                             F.lit(batch_id).cast("long")),
                        [id_col], "__ingest_batch")
        append_lsh_index(spark, index_path, survivors, text_col, id_col)

    writer = (doc_stream.writeStream
              .option("checkpointLocation", checkpoint)
              .foreachBatch(handle))
    writer = apply_trigger(writer, trigger_available_now, processing_time)
    return writer.start()
