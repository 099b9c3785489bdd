"""Structured Streaming: real readStream sources through the windowed
aggs and the foreachBatch CDC merge sink."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.sources.readers import read_table
from cdc_data_pipeline_spark.streaming.cdc import stream_upsert_to_parquet
from cdc_data_pipeline_spark.streaming.windows import session_windows, tumbling_counts
from tests.conftest import SF0001


def _events_stream(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF0001}/events.parquet", src / "part-0.parquet")
    batch = read_table(spark, SF0001, "events")
    # stream schema must match the physical file; mirror read_table's
    # conversion, which only applies when the file carries INT64 nanos
    # (surfaced as bigint under nanosAsLong — fixture generations have
    # shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS))
    raw_schema = spark.read.parquet(f"{SF0001}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(str(src))
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream, batch


def test_tumbling_stream_matches_batch(spark, tmp_path):
    stream, batch = _events_stream(spark, tmp_path)
    # nanos->long conversion happens in read_table for batch; apply the
    # same conversion on the raw stream schema (already timestamp here)
    out = tumbling_counts(stream, "1 hour")
    q = (
        out.writeStream.format("memory").queryName("tumbling_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tumbling_test")
    expected = tumbling_counts(batch, "1 hour")
    assert got.count() == expected.count()
    diff = got.exceptAll(expected)
    assert diff.count() == 0


def test_session_windows_stream_runs(spark, tmp_path):
    stream, batch = _events_stream(spark, tmp_path)
    q = (
        session_windows(stream, "15 minutes")
        .writeStream.format("memory").queryName("sessions_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_test")
    assert got.count() > 0
    assert got.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """The CDC sink merges micro-batches with latest-record-wins."""
    src = tmp_path / "cdc_src"
    src.mkdir()
    tgt = str(tmp_path / "cdc_tgt")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame([(1, "2024-01-01", "a"), (2, "2024-01-01", "b")],
                               "k long, updated_at string, v string")
    b1.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q = stream_upsert_to_parquet(stream, tgt, ["k"], "updated_at", ckpt)
    q.awaitTermination(120)
    out = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
    assert out == {1: "a", 2: "b"}

    # second micro-batch: update k=2, insert k=3
    b2 = spark.createDataFrame([(2, "2024-01-02", "b2"), (3, "2024-01-02", "c")], b1.schema)
    b2.write.parquet(str(src / "b2"))
    stream2 = spark.readStream.schema(b1.schema).parquet(f"{src}/*")
    q2 = stream_upsert_to_parquet(stream2, tgt, ["k"], "updated_at", ckpt)
    q2.awaitTermination(120)
    out = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
    assert out == {1: "a", 2: "b2", 3: "c"}


def test_stream_upsert_processing_time_cadence(spark, tmp_path):
    """O4: a cron cadence maps onto a processingTime trigger — the
    query keeps running on the interval (does not drain-and-stop like
    availableNow) and merges what arrives."""
    import time as _time

    src = tmp_path / "pt_src"
    src.mkdir()
    tgt = str(tmp_path / "pt_tgt")
    ckpt = str(tmp_path / "pt_ckpt")

    b1 = spark.createDataFrame([(1, "2024-01-01", "a")],
                               "k long, updated_at string, v string")
    b1.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*")
    q = stream_upsert_to_parquet(stream, tgt, ["k"], "updated_at", ckpt,
                                 trigger_available_now=False,
                                 processing_time="1 seconds")
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            try:
                if spark.read.parquet(tgt).count() == 1:
                    break
            except Exception:
                pass
            _time.sleep(0.5)
        assert q.isActive  # cadence trigger keeps running, unlike availableNow
        out = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
        assert out == {1: "a"}
    finally:
        q.stop()


def test_streaming_dedup_within_watermark_matches_batch(spark, tmp_path):
    """Duplicate events re-sent across micro-batches (within the
    watermark) must reach the sink exactly once, with bounded state —
    and agree with the batch dropDuplicates result."""
    import datetime

    from cdc_data_pipeline_spark.streaming.dedup import dedup_events

    src = tmp_path / "dd_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, v string"
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows, name):
        spark.createDataFrame(
            [(i, t0 + datetime.timedelta(minutes=m), v) for i, m, v in rows],
            schema).coalesce(1).write.parquet(str(src / name))

    mk([(1, 0, "a"), (2, 1, "b"), (1, 0, "a")], "b1")          # dup inside batch
    mk([(2, 1, "b"), (3, 2, "c")], "b2")                        # dup across batches

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(f"{src}/*")
    q = (
        dedup_events(stream, ["event_id"], event_time_col="ts", watermark="30 minutes")
        .writeStream.format("memory").queryName("dedup_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r.event_id, r.v) for r in spark.sql("SELECT * FROM dedup_test").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]

    batch = spark.read.parquet(f"{src}/*")
    expected = sorted((r.event_id, r.v)
                      for r in dedup_events(batch, ["event_id"]).collect())
    assert got == expected


def test_stateful_running_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches to the
    same final state as a batch groupBy."""
    from cdc_data_pipeline_spark.streaming.stateful import running_user_stats

    stream, batch = _events_stream(spark, tmp_path)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory").queryName("stateful_test")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # update mode emits one row per key per micro-batch; keep the last
    got = spark.sql("""
        SELECT user_id, n_events, sum_value, max_ts FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM stateful_test) WHERE rn = 1
    """)
    expected = running_user_stats(batch)
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode tumbling agg with a 10-min watermark: an event
    arriving a micro-batch later but older than the watermark is
    dropped; on-time windows finalize with on-time counts only."""
    import time as _time

    src = tmp_path / "late_src"
    src.mkdir()
    from datetime import datetime

    schema = "ts timestamp, user_id long, event_type string, value double"

    def _dt(s_):
        return datetime.strptime(s_, "%Y-%m-%d %H:%M:%S")

    b1 = spark.createDataFrame(
        [(_dt("2024-01-01 09:05:00"), 1, "click", 1.0),
         (_dt("2024-01-01 10:59:00"), 1, "click", 1.0)], schema)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    ckpt = str(tmp_path / "late_ckpt")
    out_dir = str(tmp_path / "late_out")

    def run_once():
        stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*")
        out = tumbling_counts(stream, "1 hour", delay="10 minutes")
        q = (
            out.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        return {r.window_start.strftime("%H:%M"): r.n_events for r in rows}

    # batch 1: watermark advances to 10:49, 09:00 window finalizes
    got1 = run_once()
    assert got1 == {"09:00": 1}, got1

    b2 = spark.createDataFrame(
        [(_dt("2024-01-01 09:10:00"), 1, "click", 1.0),   # late: behind watermark
         (_dt("2024-01-01 11:30:00"), 1, "click", 1.0)], schema)
    b2.coalesce(1).write.parquet(str(src / "b2"))

    # batch 2: the 09:10 event is behind the 10:49 watermark -> dropped
    # (09:00 stays at 1, already finalized WITHOUT it); 10:00 finalizes.
    got2 = run_once()
    assert got2 == {"09:00": 1, "10:00": 1}, got2


def test_sliding_stream_matches_batch(spark, tmp_path):
    from cdc_data_pipeline_spark.streaming.windows import sliding_counts

    stream, batch = _events_stream(spark, tmp_path)
    q = (
        sliding_counts(stream, "1 hour", "30 minutes")
        .writeStream.format("memory").queryName("sliding_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sliding_test")
    expected = sliding_counts(batch, "1 hour", "30 minutes")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (click->error
    attribution) produces exactly the batch range-join result."""
    from cdc_data_pipeline_spark.streaming.joins import click_error_correlation

    stream, batch = _events_stream(spark, tmp_path)
    q = (
        click_error_correlation(stream)
        .writeStream.format("memory").queryName("ssjoin_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM ssjoin_test")
    expected = click_error_correlation(batch)
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert got.count() > 0


def test_stream_scd2_snapshot(spark, tmp_path):
    """SCD2 maintained from a file stream: a changed key gets a closed
    v1 + open v2 across micro-batches."""
    import time as _time

    from cdc_data_pipeline_spark.streaming.cdc import stream_scd2_to_parquet

    src = tmp_path / "scd_src"
    src.mkdir()
    tgt = str(tmp_path / "scd_tgt")
    ckpt = str(tmp_path / "scd_ckpt")
    schema = "user_id long, occ string"
    ts_of = lambda i: f"2024-01-0{i + 1} 00:00:00"  # noqa: E731

    spark.createDataFrame([(1, "eng"), (2, "ops")], schema) \
        .coalesce(1).write.parquet(str(src / "b1"))
    q = stream_scd2_to_parquet(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        tgt, ["user_id"], ["occ"], ckpt, ts_of_batch=ts_of)
    q.awaitTermination(120)

    _time.sleep(1.1)
    spark.createDataFrame([(1, "mgmt"), (2, "ops"), (3, "new")], schema) \
        .coalesce(1).write.parquet(str(src / "b2"))
    q2 = stream_scd2_to_parquet(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        tgt, ["user_id"], ["occ"], ckpt, ts_of_batch=ts_of)
    q2.awaitTermination(120)

    snap = spark.read.parquet(tgt).collect()
    state = sorted((r.user_id, r.occ, r.dbt_valid_to is None) for r in snap)
    assert state == [(1, "eng", False), (1, "mgmt", True),
                     (2, "ops", True), (3, "new", True)], state


def test_stream_rollup_foreachbatch_matches_oneshot(spark, tmp_path):
    """Streaming continuous aggregate: micro-batches fold into the
    rollup table as monoid partials; the final table equals a one-shot
    aggregation of everything, including arbitrarily late rows."""
    import pyspark.sql.functions as F

    from cdc_data_pipeline_spark.operators import rollup as ru
    from cdc_data_pipeline_spark.streaming.cdc import stream_rollup_to_parquet

    src = tmp_path / "ru_src"
    src.mkdir()
    tgt = str(tmp_path / "ru_tgt")
    ckpt = str(tmp_path / "ru_ckpt")
    specs = [("count", None, "n"), ("sum", "value", "s"),
             ("max", "value", "mx")]

    def mk(rows):
        raw = spark.createDataFrame(rows, "ts string, kind string, value double")
        return raw.select(F.to_timestamp("ts").alias("ts"), "kind", "value")

    b1 = mk([("2024-01-01 10:05:00", "a", 1.0), ("2024-01-01 10:55:00", "a", 2.0),
             ("2024-01-01 11:05:00", "b", 3.0)])
    b1.write.parquet(str(src / "b1"))
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = stream_rollup_to_parquet(stream, tgt, "ts", "1 hour", ["kind"],
                                 specs, ckpt)
    q.awaitTermination(120)

    # late batch lands in an ALREADY-written hour (no watermark limit)
    b2 = mk([("2024-01-01 10:59:59", "a", 10.0),
             ("2024-01-01 12:01:00", "a", 4.0)])
    b2.write.parquet(str(src / "b2"))
    stream2 = spark.readStream.schema(b1.schema).parquet(f"{src}/*")
    q2 = stream_rollup_to_parquet(stream2, tgt, "ts", "1 hour", ["kind"],
                                  specs, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(tgt).drop("__pb")
    want = ru.rollup_delta(b1.unionByName(b2), "ts", "1 hour", ["kind"], specs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the late 10:59:59 row folded into the existing 10:00 bucket
    row = got.filter((F.col("kind") == "a")
                     & (F.hour("bucket") == 10)).first()
    assert row.n == 3 and row.s == 13.0 and row.mx == 10.0


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Cross-micro-batch funnel state: two time-ordered source files ->
    2 batches; final update-mode rows must equal the batch operator on
    the full frame."""
    from cdc_data_pipeline_spark.streaming.stateful import streaming_funnel

    src = tmp_path / "funnel_src"
    src.mkdir()
    ev = read_table(spark, SF0001, "events")
    steps = ["view", "click", "purchase"]
    mid = "2024-01-15"
    ev.filter(F.col("ts") <= F.lit(mid).cast("timestamp")).write.parquet(str(src / "b1"))
    ev.filter(F.col("ts") > F.lit(mid).cast("timestamp")).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = (streaming_funnel(stream, steps)
         .writeStream.format("memory").queryName("funnel_stream")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode emits one row per user per batch: keep the last
    got = spark.sql("""
        SELECT user_id, steps_completed, last_step_ts FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY steps_completed DESC) rn
          FROM funnel_stream) WHERE rn = 1""")
    expected = streaming_funnel(ev, steps)  # batch path
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_stream_static_broadcast_enrich_matches_batch(spark, tmp_path):
    """Stream-static enrichment: a streaming fact joined to a static
    broadcast dim inside the micro-batch plan (the standard Structured
    Streaming dim-enrich shape — the static side is re-resolved per
    batch, no state store involved). Results must equal the batch
    join."""
    stream, batch = _events_stream(spark, tmp_path)
    users = (read_table(spark, SF0001, "customer")
             .select(F.col("c_custkey").alias("user_id"),
                     F.col("c_mktsegment").alias("segment")))
    enriched = (stream.join(F.broadcast(users), "user_id", "left")
                .groupBy("segment")
                .agg(F.count(F.lit(1)).alias("n_events")))
    q = (enriched.writeStream.format("memory").queryName("enrich_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM enrich_test")
    expected = (batch.join(F.broadcast(users), "user_id", "left")
                .groupBy("segment")
                .agg(F.count(F.lit(1)).alias("n_events")))
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_stream_curate_to_corpus(spark, sf_dir, tmp_path):
    """Streaming curation composition: quality gate + within-batch
    fuzzy dedup + against-history near-dup via the persisted LSH
    index, survivors landing in the bucketed corpus. A doc already in
    history must NOT re-enter; an exact clone within one batch
    collapses to one row; replaying the stream adds nothing (keyed
    sink)."""
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators.dedup_index import build_lsh_index
    from cdc_data_pipeline_spark.sources.readers import read_table
    from cdc_data_pipeline_spark.streaming.cdc import stream_curate_to_corpus

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(F.col("doc_id") < 100)
    index_path = str(tmp_path / "lsh_idx")
    build_lsh_index(spark, history, index_path)

    # incoming: 40 genuinely new docs, 1 exact replay of a history doc
    # (id shifted so the keyed sink can't mask the index decision),
    # and one within-batch exact clone pair
    new = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    hist_clone = history.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    batch_clone = docs.filter(F.col("doc_id") == 100).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    incoming = new.unionByName(hist_clone).unionByName(batch_clone)
    src = str(tmp_path / "incoming")
    incoming.write.mode("overwrite").parquet(src)

    corpus_path = str(tmp_path / "corpus")
    stream = (spark.readStream.schema(incoming.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = stream_curate_to_corpus(stream, corpus_path, index_path,
                                str(tmp_path / "ck"),
                                min_words=10, stopwords=("the", "a"),
                                min_stop_hits=1)
    q.awaitTermination(180)

    got = spark.read.parquet(corpus_path)
    ids = {r.doc_id for r in got.select("doc_id").collect()}
    # the history clone (shifted id in [1e6, 2e6)) must not re-enter
    assert not any(1_000_000 <= i < 2_000_000 for i in ids)
    # the exact clone and its original never BOTH survive: same
    # micro-batch -> one canonical; different batches -> the later one
    # collides with the earlier one's indexed signatures
    assert not {100, 2_000_100} <= ids
    n_first = got.count()
    assert 0 < n_first <= 41
    # replay the whole stream from a fresh checkpoint: keyed sink
    # makes it a no-op
    q2 = stream_curate_to_corpus(
        (spark.readStream.schema(incoming.schema)
         .option("maxFilesPerTrigger", 2).parquet(src)),
        corpus_path, index_path, str(tmp_path / "ck2"),
        min_words=10, stopwords=("the", "a"), min_stop_hits=1)
    q2.awaitTermination(180)
    assert spark.read.parquet(corpus_path).count() == n_first


def test_collapse_latest_op_unit(spark):
    """The per-batch latest-op collapse the CDC index sinks apply when
    an ``order_col`` is given: highest order wins per id; an exact
    order tie resolves to the upsert (matching the sink's
    delete-then-reinsert outcome); rows without competition pass
    through untouched."""
    from cdc_data_pipeline_spark.streaming.cdc import collapse_latest_op

    df = spark.createDataFrame(
        [(1, "a1", False, 1), (1, None, True, 2),    # later delete wins
         (2, None, True, 1), (2, "b2", False, 2),    # later upsert wins
         (3, None, True, 5), (3, "c", False, 5),     # tie -> upsert
         (4, "solo", False, 9)],
        "doc_id long, text string, is_deleted boolean, ts long")
    got = {r["doc_id"]: (r["text"], r["is_deleted"])
           for r in collapse_latest_op(df, "doc_id", "is_deleted",
                                       "ts").collect()}
    assert got == {1: (None, True), 2: ("b2", False),
                   3: ("c", False), 4: ("solo", False)}
    # no order column: pass-through unchanged (documented contract:
    # at most one op per key then)
    assert collapse_latest_op(df, "doc_id", "is_deleted",
                              None).count() == 7
