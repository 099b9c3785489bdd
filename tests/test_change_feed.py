"""Change data feed + hard deletes on the bucketed CDC table.

CDC *out*, not just in: every merge commits its row-level deltas
(insert/update/delete with preimage) under ``<table>/_changes`` so
downstream incrementals consume deltas instead of diffing snapshots.
The feed must be exactly-once under foreachBatch redelivery (content
digests), invisible to table scans (underscore prefix), atomic per
commit (tmp+rename), and must survive layout rewrites.
"""

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import (
    delete_bucketed, read_changes, rebucket, stream_changes,
    upsert_bucketed)


def _mk(spark, rows, schema="k long, v string, ts long, is_del boolean"):
    return spark.createDataFrame(rows, schema)


def _feed(spark, tgt, since=-1):
    got = read_changes(spark, tgt, since_seq=since)
    if got is None:
        return []
    return sorted(
        ((r["_seq"], r["_op"], r["k"], r["v"], r["ts"])
         for r in got.collect()))


def test_change_feed_ops_and_delete_preimage(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = _mk(spark, [(1, "a", 10, False), (2, "b", 10, False),
                       (3, "c", 10, False)])
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4,
                    delete_col="is_del", emit_changes=True)
    assert _feed(spark, tgt) == [(0, "insert", 1, "a", 10),
                                 (0, "insert", 2, "b", 10),
                                 (0, "insert", 3, "c", 10)]
    # delete_col never reaches the table
    assert "is_del" not in spark.read.parquet(tgt).columns

    batch = _mk(spark, [(2, "b2", 20, False),     # update
                        (4, "d", 20, False),      # insert
                        (3, None, 20, True)])     # hard delete
    upsert_bucketed(spark, tgt, batch, ["k"], "ts",
                    delete_col="is_del", emit_changes=True)

    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert table == {1: "a", 2: "b2", 4: "d"}    # 3 hard-deleted
    # the delete row carries the PREIMAGE (the row as it was)
    assert _feed(spark, tgt, since=0) == [(1, "delete", 3, "c", 10),
                                          (1, "insert", 4, "d", 20),
                                          (1, "update", 2, "b2", 20)]
    # the consumer watermark contract: nothing newer than seq 1
    assert read_changes(spark, tgt, since_seq=1) is None


def test_upsert_then_delete_same_key_in_one_batch(spark, tmp_path):
    """Latest op per key wins by the tracking column — the ADVICE-r6
    ordering bug shape, now on the TABLE sink: an upsert followed by a
    later delete for one key must delete."""
    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del")
    batch = _mk(spark, [(1, "a2", 20, False), (1, None, 30, True),
                        (2, "b", 20, True), (2, "b2", 30, False)])
    upsert_bucketed(spark, tgt, batch, ["k"], "ts", delete_col="is_del")
    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert table == {2: "b2"}          # 1 deleted last, 2 upserted last


def test_replayed_batch_commits_once(spark, tmp_path):
    """foreachBatch delivery is at-least-once; the feed must be
    exactly-once. A byte-identical replayed batch is recognized by its
    content digest and skipped — while the merge itself stays
    idempotent."""
    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    batch = _mk(spark, [(1, "a2", 20, False), (5, "e", 20, False)])
    for _ in range(3):                 # deliver the same batch 3x
        upsert_bucketed(spark, tgt, batch, ["k"], "ts",
                        delete_col="is_del", emit_changes=True)
    feed = _feed(spark, tgt)
    assert len([x for x in feed if x[0] == 1]) == 2      # one commit
    assert max(x[0] for x in feed) == 1                  # no seq 2/3
    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert table == {1: "a2", 5: "e"}


def test_delete_bucketed_and_noop_hygiene(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(10)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4,
                    emit_changes=True)
    victims = spark.createDataFrame([(3,), (7,), (99,)], "k long")
    delete_bucketed(spark, tgt, victims, emit_changes=True)
    left = {r["k"] for r in spark.read.parquet(tgt).collect()}
    assert left == set(range(10)) - {3, 7}
    feed = _feed(spark, tgt, since=0)
    assert feed == [(1, "delete", 3, "v3", 10), (1, "delete", 7, "v7", 10)]

    # absent-only delete: no table change, NO commit accumulates
    delete_bucketed(spark, tgt,
                    spark.createDataFrame([(99,)], "k long"),
                    emit_changes=True)
    assert read_changes(spark, tgt, since_seq=1) is None


def test_feed_survives_rebucket_and_scan_invisibility(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(20)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=2,
                    emit_changes=True)
    rebucket(spark, tgt, 8)
    # the feed rode along: a layout rewrite adds and loses no commits
    assert len(_feed(spark, tgt)) == 20
    # and it never leaks into table scans
    assert spark.read.parquet(tgt).count() == 20
    # post-rebucket merges keep appending to the same feed
    upsert_bucketed(spark, tgt,
                    spark.createDataFrame([(1, "x", 20)],
                                          "k long, v string, ts long"),
                    ["k"], "ts", emit_changes=True)
    assert _feed(spark, tgt, since=0) == [(1, "update", 1, "x", 20)]


def test_stream_changes_consumes_feed(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(1, None, 20, True), (3, "c", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)

    seen = []
    q = (stream_changes(spark, tgt)
         .writeStream.foreachBatch(
             lambda df, _id: seen.extend(
                 (r["_seq"], r["_op"], r["k"]) for r in df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(seen) == [(0, "insert", 1), (0, "insert", 2),
                            (1, "delete", 1), (1, "insert", 3)]


def test_stream_changes_strips_frozen_lineage(spark, tmp_path):
    """The inferred streaming schema must NOT carry read_changes'
    lineage metadata: a file-stream source freezes the inferred schema,
    so a stamped cdc_max_seq would be a snapshot-time constant in every
    future micro-batch — a foreachBatch apply_changes would cache a
    stale-LOW consumer watermark and a later reconcile inside the gap
    would pass the staleness guard (fail-open). Streaming consumers
    must pass source_path and take the exact O(slice) fallback."""
    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    # the batch reader DOES stamp lineage...
    batch_meta = read_changes(spark, tgt).schema["_seq"].metadata
    assert batch_meta.get("cdc_source_root") == tgt
    # ...the streaming reader must not freeze it
    sfeed = stream_changes(spark, tgt)
    assert not (sfeed.schema["_seq"].metadata or {})


def test_stream_upsert_with_deletes_and_feed(spark, tmp_path):
    """End to end through the streaming sink: a file stream of CDC ops
    (incl. a hard delete) lands in the bucketed table AND the change
    feed, exactly once."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_parquet)

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tbl")
    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False),
                (2, None, 20, True)]).write.parquet(src)
    stream = spark.readStream.schema(
        "k long, v string, ts long, is_del boolean").parquet(src)
    q = stream_upsert_to_parquet(
        stream, tgt, ["k"], "ts", str(tmp_path / "ck"), n_buckets=4,
        delete_col="is_del", emit_changes=True)
    q.awaitTermination(120)
    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert table == {1: "a"}           # 2 upserted then hard-deleted
    feed = _feed(spark, tgt)
    assert feed == [(0, "insert", 1, "a", 10)]


def test_apply_changes_maintains_replica(spark, tmp_path):
    """Replication from the feed alone: a replica caught up via
    apply_changes equals the source byte-for-byte, whether it applies
    many commits at once or one slice at a time, and re-applying an
    already-applied slice changes nothing."""
    from cdc_data_pipeline_spark.operators.incremental import (
        apply_changes, get_watermark)

    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    b0 = _mk(spark, [(i, f"v{i}", 10, False) for i in range(8)])
    upsert_bucketed(spark, src, b0, ["k"], "ts", n_buckets=4,
                    delete_col="is_del", emit_changes=True,
                    update_preimages=True)
    b1 = _mk(spark, [(1, "x1", 20, False), (3, None, 20, True),
                     (9, "v9", 20, False)])
    upsert_bucketed(spark, src, b1, ["k"], "ts", delete_col="is_del",
                    emit_changes=True, update_preimages=True)

    # catch up both commits in ONE merge
    apply_changes(spark, read_changes(spark, src), rep, ["k"],
                  n_buckets=4)

    def rows(p):
        return {(r["k"], r["v"], r["ts"])
                for r in spark.read.parquet(p).select("k", "v", "ts")
                .collect()}

    assert rows(rep) == rows(src)
    wm = get_watermark(spark.read.parquet(rep), "__feed_seq")
    assert wm == 1                      # the replication watermark

    # incremental slice: one more source commit, apply only the delta
    b2 = _mk(spark, [(9, None, 30, True), (2, "x2", 30, False)])
    upsert_bucketed(spark, src, b2, ["k"], "ts", delete_col="is_del",
                    emit_changes=True, update_preimages=True)
    feed_slice = read_changes(spark, src, since_seq=wm)
    apply_changes(spark, feed_slice, rep, ["k"])
    assert rows(rep) == rows(src)
    # idempotent: re-applying the same slice is a no-op
    apply_changes(spark, feed_slice, rep, ["k"])
    assert rows(rep) == rows(src)


def test_agg_deltas_ivm_equals_recompute(spark, tmp_path):
    """Incremental view maintenance: a mart maintained purely from
    feed deltas (preimages subtract, postimages add) equals a full
    recompute over the final table — without ever rescanning it. A
    group whose last row is deleted vanishes from the mart."""
    from cdc_data_pipeline_spark.operators.incremental import (
        agg_deltas_from_feed, merge_agg_deltas)

    src = str(tmp_path / "src")
    rows0 = [(1, "a", 10.0, 10, False), (2, "a", 20.0, 10, False),
             (3, "b", 5.0, 10, False), (4, "c", 7.0, 10, False)]
    schema = "k long, grp string, amt double, ts long, is_del boolean"
    upsert_bucketed(spark, src, spark.createDataFrame(rows0, schema),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True, update_preimages=True)
    # update 1 (a: 10->25), delete 4 (c vanishes), insert 5 into b
    b1 = spark.createDataFrame(
        [(1, "a", 25.0, 20, False), (4, None, None, 20, True),
         (5, "b", 3.0, 20, False)], schema)
    upsert_bucketed(spark, src, b1, ["k"], "ts", delete_col="is_del",
                    emit_changes=True, update_preimages=True)

    mart = None
    for seq in (0, 1):                  # refresh one commit at a time
        feed = read_changes(spark, src, since_seq=seq - 1) \
            .filter(F.col("_seq") == seq)
        deltas = agg_deltas_from_feed(feed, ["grp"], ["amt"])
        mart = merge_agg_deltas(mart, deltas, ["grp"])

    got = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
           for r in mart.collect()}
    want = {(r["grp"], round(r["s"], 2), r["c"]) for r in
            spark.read.parquet(src).groupBy("grp")
            .agg(F.sum("amt").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()}
    assert got == want                  # and 'c' is in neither
    assert not any(g == "c" for g, _s, _c in got)


def test_vacuum_changes_keeps_newest_and_replay_state(spark, tmp_path):
    """Feed hygiene: commits at or below every consumer's watermark
    prune away, the NEWEST commit always survives (its digest is the
    replay-detection state for the next at-least-once delivery), and
    a replay of the newest batch is still recognized post-vacuum."""
    from cdc_data_pipeline_spark.operators.incremental import (
        vacuum_changes)

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    b1 = _mk(spark, [(2, "b", 20, False)])
    b2 = _mk(spark, [(3, "c", 30, False)])
    upsert_bucketed(spark, tgt, b1, ["k"], "ts", delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt, b2, ["k"], "ts", delete_col="is_del",
                    emit_changes=True)

    assert vacuum_changes(spark, tgt, before_seq=99) == 2  # keeps newest
    assert [x[0] for x in _feed(spark, tgt)] == [2]
    # replay of the newest batch: still recognized, no new commit
    upsert_bucketed(spark, tgt, b2, ["k"], "ts", delete_col="is_del",
                    emit_changes=True)
    assert [x[0] for x in _feed(spark, tgt)] == [2]
    # new work continues the sequence past the vacuumed range
    upsert_bucketed(spark, tgt, _mk(spark, [(4, "d", 40, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert [x[0] for x in _feed(spark, tgt)] == [2, 3]


def test_feed_with_schema_evolution(spark, tmp_path):
    """An evolved batch's feed commit carries the new column; earlier
    commits surface NULL for it under the merged read."""
    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,
                    spark.createDataFrame([(1, "a", 10)],
                                          "k long, v string, ts long"),
                    ["k"], "ts", n_buckets=4, emit_changes=True)
    widened = spark.createDataFrame(
        [(1, "a2", 20, "n1"), (2, "b", 20, "n2")],
        "k long, v string, ts long, note string")
    upsert_bucketed(spark, tgt, widened, ["k"], "ts",
                    evolve_schema=True, emit_changes=True)
    feed = {(r["_seq"], r["_op"], r["k"]): r["note"]
            for r in read_changes(spark, tgt).collect()}
    assert feed[(1, "update", 1)] == "n1"
    assert feed[(1, "insert", 2)] == "n2"
    assert feed[(0, "insert", 1)] is None


def test_debezium_envelopes_to_table_and_feed(spark, tmp_path):
    """The reference-shaped path END TO END: raw Debezium envelopes on
    a stream -> parse (images, op normalization) -> bucketed table
    sink with hard deletes -> change data feed out. One key receives
    create+update in-stream (latest wins), one is created then
    hard-deleted (op='d' with before-image only), one survives."""
    import json as _json

    from pyspark.sql import types as T

    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_parquet)
    from cdc_data_pipeline_spark.streaming.debezium import parse_debezium

    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.StringType())])

    def env(op, before=None, after=None, ts=0):
        return _json.dumps({"before": before, "after": after, "op": op,
                            "ts_ms": 1700000000000 + ts})

    rows = [
        env("c", after={"k": 1, "v": "a"}, ts=0),
        env("u", before={"k": 1, "v": "a"}, after={"k": 1, "v": "a2"},
            ts=1000),
        env("c", after={"k": 2, "v": "b"}, ts=0),
        env("d", before={"k": 2, "v": "b"}, ts=2000),
        env("r", after={"k": 3, "v": "c"}, ts=0),      # snapshot read
    ]
    src = str(tmp_path / "kafka")
    spark.createDataFrame([(v,) for v in rows], "value string") \
        .write.parquet(src)

    raw = spark.readStream.schema("value string").parquet(src)
    # fold the envelope's _op into the delete flag, then DROP it —
    # otherwise it lands in the table as stale per-row lineage
    changes = parse_debezium(raw, payload) \
        .withColumn("__is_del", F.col("_op") == "delete").drop("_op")
    tgt = str(tmp_path / "tbl")
    q = stream_upsert_to_parquet(
        changes, tgt, ["k"], "_change_ts", str(tmp_path / "ck"),
        n_buckets=4, delete_col="__is_del", emit_changes=True)
    q.awaitTermination(120)

    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt)
             .select("k", "v").collect()}
    assert table == {1: "a2", 3: "c"}
    feed = {(r["_op"], r["k"]): r["v"]
            for r in read_changes(spark, tgt).collect()}
    assert feed == {("insert", 1): "a2", ("insert", 3): "c"}
    # one micro-batch: key 1's create+update collapsed to its FINAL
    # image before the merge, key 2's create+delete to nothing visible
    assert ("insert", 2) not in feed


def test_table_at_time_travel(spark, tmp_path):
    """The feed IS the version history: table_at(seq) reconstructs
    every past state exactly — including a key that was inserted,
    updated, and finally deleted — and the latest reconstruction
    equals the live table. A vacuumed feed refuses to time-travel
    rather than silently returning a partial state."""
    from cdc_data_pipeline_spark.operators.incremental import (
        table_at, vacuum_changes)

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a2", 20, False),
                                            (3, "c", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, None, 30, True)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)

    def state(seq):
        return {(r["k"], r["v"]) for r in
                table_at(spark, tgt, seq).select("k", "v").collect()}

    assert state(0) == {(1, "a"), (2, "b")}
    assert state(1) == {(1, "a2"), (2, "b"), (3, "c")}
    assert state(2) == {(2, "b"), (3, "c")}
    live = {(r["k"], r["v"]) for r in spark.read.parquet(tgt)
            .select("k", "v").collect()}
    assert state(2) == live

    # the destructive prune is opt-in now (r8 watch item #3): the
    # default cuts an anchor first so table_at(newest) keeps working
    with pytest.raises(ValueError, match="anchor"):
        vacuum_changes(spark, tgt, before_seq=0, anchor_first=False)
    vacuum_changes(spark, tgt, before_seq=0, anchor_first=False,
                   force=True)
    with pytest.raises(ValueError, match="vacuumed"):
        table_at(spark, tgt, 2)


def test_duplicate_seq_detected_as_writer_race(spark, tmp_path):
    """Two writers racing one table both claim the next sequence
    number (different digests, so both renames succeed) — the
    single-writer violation must surface loudly at feed read, not
    silently feed duplicate _seq rows to every downstream collapse."""
    import shutil

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=2, delete_col="is_del",
                    emit_changes=True)
    commits = [p for p in (tmp_path / "tbl" / "_changes").iterdir()
               if p.name.startswith("commit-")]
    assert len(commits) == 1
    # simulate the loser's rename landing beside the winner's
    shutil.copytree(str(commits[0]),
                    str(commits[0].parent / "commit-0000000000-feedbeef-1"))
    with pytest.raises(RuntimeError, match="duplicate change-feed"):
        read_changes(spark, tgt)


def test_stream_ivm_maintains_mart(spark, tmp_path):
    """Bronze table -> gold mart with no table rescans: the IVM sink
    streams the change feed and folds each micro-batch's deltas into a
    persisted aggregate. After inserts, updates, and a
    group-emptying delete, the mart equals a full recompute — and a
    second run over the same checkpoint re-reads nothing."""
    from cdc_data_pipeline_spark.streaming.cdc import stream_ivm_to_parquet

    tbl = str(tmp_path / "tbl")
    mart = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    schema = "k long, grp string, amt double, ts long, is_del boolean"
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(1, "a", 10.0, 10, False), (2, "a", 20.0, 10, False),
         (3, "b", 5.0, 10, False)], schema),
        ["k"], "ts", n_buckets=4, delete_col="is_del",
        emit_changes=True, update_preimages=True)
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(1, "a", 25.0, 20, False), (3, None, None, 20, True),
         (4, "c", 7.0, 20, False)], schema),
        ["k"], "ts", delete_col="is_del", emit_changes=True,
        update_preimages=True)

    q = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q.awaitTermination(180)

    got = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
           for r in spark.read.parquet(mart).collect()}
    want = {(r["grp"], round(r["s"], 2), r["c"]) for r in
            spark.read.parquet(tbl).groupBy("grp")
            .agg(F.sum("amt").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()}
    assert got == want and ("b",) not in {(g,) for g, _s, _c in got}

    # restart on the same checkpoint: nothing new -> mart unchanged
    q2 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q2.awaitTermination(180)
    got2 = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
            for r in spark.read.parquet(mart).collect()}
    assert got2 == got

    # one more source commit streams through incrementally
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(5, "c", 3.0, 30, False)], schema),
        ["k"], "ts", delete_col="is_del", emit_changes=True,
        update_preimages=True)
    q3 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q3.awaitTermination(180)
    got3 = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
            for r in spark.read.parquet(mart).collect()}
    assert ("c", 10.0, 2) in got3


def test_stale_protection_precombine(spark, tmp_path):
    """Hudi-preCombine semantics, opt-in: an out-of-order redelivery
    of an OLDER version (update or delete) is a no-op — the row never
    regresses and the feed emits nothing — while equal-ts redelivery
    stays idempotent (batch wins ties) and genuinely newer ops apply.
    The default path keeps batch-wins (the reference's contract)."""
    from cdc_data_pipeline_spark.operators.incremental import table_at

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(1, "new", 30, False),
                                (2, "b", 30, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)

    # stale update + stale delete: both no-ops under protection
    stale = _mk(spark, [(1, "old", 10, False), (2, None, 10, True),
                        (3, "c", 10, False)])          # 3 is genuinely new
    upsert_bucketed(spark, tgt, stale, ["k"], "ts", delete_col="is_del",
                    emit_changes=True, stale_protection=True)
    table = {r["k"]: (r["v"], r["ts"])
             for r in spark.read.parquet(tgt).collect()}
    assert table == {1: ("new", 30), 2: ("b", 30), 3: ("c", 10)}
    assert _feed(spark, tgt, since=0) == [(1, "insert", 3, "c", 10)]

    # equal-ts redelivery: tie goes to the batch (idempotent replay)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "new2", 30, False)]),
                    ["k"], "ts", delete_col="is_del",
                    stale_protection=True)
    assert {r["v"] for r in spark.read.parquet(tgt)
            .filter(F.col("k") == 1).collect()} == {"new2"}

    # a FULLY stale batch is a complete no-op: no commit, no rewrite
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "ancient", 5, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True,
                    stale_protection=True)
    assert read_changes(spark, tgt, since_seq=1) is None

    # default path: batch wins unconditionally (regression documented)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "old", 10, False)]),
                    ["k"], "ts", delete_col="is_del")
    assert {r["v"] for r in spark.read.parquet(tgt)
            .filter(F.col("k") == 1).collect()} == {"old"}


def test_pipeline_cli_end_to_end(spark, tmp_path):
    """The one-command CDC story (the reference's full pipeline pass):
    bronze with feed -> churn ticks (updates/inserts/hard deletes,
    stale-protected) -> replica from the feed -> streaming IVM mart.
    The command verifies its own equivalences and exits 0 only when
    replica == bronze and mart == recompute."""
    import json

    from cdc_data_pipeline_spark.__main__ import main

    out = str(tmp_path / "pipe")
    rc = main(["pipeline", "--base-path", out, "--ticks", "2",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    # the pipeline ends by anchoring at the newest commit and vacuuming
    # everything below it — only the newest commit plus the anchor
    # remain, and the time-travel equivalence already passed (rc 0)
    feed_dir = tmp_path / "pipe" / "bronze_orders" / "_changes"
    names = [p.name for p in feed_dir.iterdir()]
    assert len([n for n in names if n.startswith("commit-")]) == 1
    assert [n for n in names if n.startswith("anchor-")] == \
        ["anchor-0000000002"]


def test_repeated_content_is_a_new_commit(spark, tmp_path):
    """ADVICE-r7 high: a batch whose content legitimately RECURS
    (delete K, re-insert K, delete K again) must land in the feed as a
    new commit — replay detection compares against the NEWEST commit
    only, because foreachBatch redelivers only the last batch. If the
    digest were matched against the whole history, the table would
    apply the second delete while the feed silently dropped it, and
    every replica / mart / time-travel read would diverge forever."""
    from cdc_data_pipeline_spark.operators.incremental import (
        apply_changes)

    src, rep = str(tmp_path / "src"), str(tmp_path / "rep")
    upsert_bucketed(spark, src,
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    victims = spark.createDataFrame([(1,)], "k long")
    delete_bucketed(spark, src, victims, emit_changes=True)   # digest D
    upsert_bucketed(spark, src, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    delete_bucketed(spark, src, victims, emit_changes=True)   # digest D again

    feed = _feed(spark, tgt=src)
    deletes = [x for x in feed if x[1] == "delete"]
    assert [d[0] for d in deletes] == [1, 3]      # BOTH deletes committed
    # and a replica built purely from the feed equals the table
    apply_changes(spark, read_changes(spark, src), rep, ["k"], n_buckets=4)
    assert ({(r["k"], r["v"]) for r in
             spark.read.parquet(rep).select("k", "v").collect()}
            == {(r["k"], r["v"]) for r in
                spark.read.parquet(src).select("k", "v").collect()})


def test_merge_hot_path_never_lists_commits(spark, tmp_path, monkeypatch):
    """Per-merge feed overhead must not grow with table AGE: once the
    ``_latest`` pointer exists, a merge consults it (one small read)
    and never lists the commit directory — O(1) replay detection
    however many commits have accumulated (VERDICT-r7 #2). Deleting
    the pointer falls back to one bootstrap listing and republishes
    it."""
    from cdc_data_pipeline_spark.operators import incremental
    from cdc_data_pipeline_spark.sources import fsutil

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    for i in range(4):                       # age the feed a little
        upsert_bucketed(spark, tgt,
                        _mk(spark, [(1, f"v{i}", 20 + i, False)]),
                        ["k"], "ts", delete_col="is_del",
                        emit_changes=True)

    listed = []
    real = fsutil.list_names

    def spy(sp, path):
        listed.append(path)
        return real(sp, path)

    monkeypatch.setattr(fsutil, "list_names", spy)
    upsert_bucketed(spark, tgt, _mk(spark, [(2, "b", 99, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert not [p for p in listed if p.endswith("_changes")]
    assert _feed(spark, tgt, since=4) == [(5, "insert", 2, "b", 99)]

    # lost pointer: exactly one repair listing, then O(1) again
    listed.clear()
    (tmp_path / "tbl" / "_changes" / "_latest").unlink()
    upsert_bucketed(spark, tgt, _mk(spark, [(3, "c", 99, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert len([p for p in listed if p.endswith("_changes")]) == 1
    listed.clear()
    upsert_bucketed(spark, tgt, _mk(spark, [(4, "d", 99, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert not [p for p in listed if p.endswith("_changes")]
    assert incremental._read_latest_ptr(spark, tgt)["seq"] == 7


def test_crash_between_commit_and_pointer_repairs(spark, tmp_path):
    """Crash window: the commit rename landed but the pointer publish
    did not. The replayed batch derives the SAME deterministic
    commit name (same seq from the stale pointer, same content
    digest), recognizes it on disk, repairs the pointer and commits
    nothing — the feed stays exactly-once."""
    import json

    from cdc_data_pipeline_spark.operators.incremental import (
        _read_latest_ptr)

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    batch = _mk(spark, [(1, "a2", 20, False), (2, "b", 20, False)])
    upsert_bucketed(spark, tgt, batch, ["k"], "ts", delete_col="is_del",
                    emit_changes=True)                       # seq 1
    ptr_path = tmp_path / "tbl" / "_changes" / "_latest"
    assert json.loads(ptr_path.read_text())["seq"] == 1

    # rewind the pointer to seq 0 (as if the crash ate the publish)
    commit0 = next(p.name for p in ptr_path.parent.iterdir()
                   if p.name.startswith("commit-0000000000-"))
    ptr_path.write_text(json.dumps(
        {"seq": 0, "digest": commit0.split("-", 2)[2]}))

    # foreachBatch redelivers the same batch
    upsert_bucketed(spark, tgt, batch, ["k"], "ts", delete_col="is_del",
                    emit_changes=True)
    commits = sorted(p.name for p in ptr_path.parent.iterdir()
                     if p.name.startswith("commit-"))
    assert len(commits) == 2                  # no duplicate commit
    assert _read_latest_ptr(spark, tgt)["seq"] == 1   # pointer repaired
    table = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert table == {1: "a2", 2: "b"}         # merge stayed idempotent


def test_stream_ivm_replay_does_not_double_count(spark, tmp_path):
    """ADVICE-r7 medium: a crash after the mart swap but before the
    streaming checkpoint commit redelivers the batch — and delta
    addition is non-idempotent, so without a watermark the redelivered
    slice would double every sum. The mart carries the highest applied
    feed _seq in a sidecar swapped atomically with it; simulate the
    WORST case (lose the entire checkpoint, every feed file
    redelivered) and the mart must not move — then a genuinely new
    commit must still fold in."""
    import shutil

    from cdc_data_pipeline_spark.operators.incremental import (
        read_mart_seq)
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_ivm_to_parquet)

    tbl = str(tmp_path / "tbl")
    mart = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    schema = "k long, grp string, amt double, ts long, is_del boolean"
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(1, "a", 10.0, 10, False), (2, "b", 5.0, 10, False)], schema),
        ["k"], "ts", n_buckets=4, delete_col="is_del",
        emit_changes=True, update_preimages=True)
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(1, "a", 25.0, 20, False)], schema),
        ["k"], "ts", delete_col="is_del", emit_changes=True,
        update_preimages=True)

    q = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q.awaitTermination(180)

    def snap():
        return {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
                for r in spark.read.parquet(mart).collect()}

    base = snap()
    assert base == {("a", 25.0, 1), ("b", 5.0, 1)}
    assert read_mart_seq(spark, mart) == 1

    # total checkpoint loss: the file source redelivers EVERY commit
    shutil.rmtree(ck)
    q2 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q2.awaitTermination(180)
    assert snap() == base               # nothing double-counted
    assert read_mart_seq(spark, mart) == 1

    # new commits still fold after a replay
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(3, "b", 2.0, 30, False)], schema),
        ["k"], "ts", delete_col="is_del", emit_changes=True,
        update_preimages=True)
    q3 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q3.awaitTermination(180)
    assert snap() == {("a", 25.0, 1), ("b", 7.0, 2)}
    assert read_mart_seq(spark, mart) == 2


def test_snapshot_anchor_time_travel_survives_vacuum(spark, tmp_path):
    """VERDICT-r7 #3: snapshot anchors (the Delta-checkpoint analogue)
    make vacuum and time travel compose. Anchored reconstruction
    equals the full-prefix reconstruction computed before the anchor
    existed; vacuuming commits at/below the anchor keeps every as-of
    read above it working, while reads below it refuse loudly."""
    from cdc_data_pipeline_spark.operators.incremental import (
        create_anchor, table_at, vacuum_changes)

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,                                  # seq 0
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False),
                                (3, "c", 10, False), (4, "d", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt,                                  # seq 1
                    _mk(spark, [(1, "a2", 20, False), (5, "e", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    upsert_bucketed(spark, tgt,                                  # seq 2
                    _mk(spark, [(2, None, 30, True), (3, "c2", 30, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)

    def state(seq):
        return {(r["k"], r["v"]) for r in
                table_at(spark, tgt, seq).select("k", "v").collect()}

    full_s1 = state(1)                      # full-prefix reconstructions
    full_s2 = state(2)
    assert full_s2 == {(1, "a2"), (3, "c2"), (4, "d"), (5, "e")}

    assert create_anchor(spark, tgt) == 2
    assert create_anchor(spark, tgt) == 2   # idempotent
    assert state(1) == full_s1              # below the anchor: prefix path

    upsert_bucketed(spark, tgt,                                  # seq 3
                    _mk(spark, [(6, "f", 40, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)

    # anchored path equals the pre-anchor full-prefix reconstruction
    assert state(2) == full_s2
    live = {(r["k"], r["v"]) for r in spark.read.parquet(tgt)
            .select("k", "v").collect()}
    assert state(3) == live

    # prune everything at/below the anchor: as-of reads ABOVE it live on
    vacuum_changes(spark, tgt, before_seq=2)
    assert state(2) == full_s2
    assert state(3) == live
    with pytest.raises(ValueError, match="vacuumed"):
        table_at(spark, tgt, 1)             # below the anchor: refuse

    # anchors are invisible to feed consumers and table scans
    assert read_changes(spark, tgt, since_seq=2).count() == 1
    assert spark.read.parquet(tgt).count() == 5


def test_vacuum_anchors_keeps_newest(spark, tmp_path):
    """An anchor is a full table copy (the Delta-checkpoint cost
    model), so anchors need their own vacuum: keep the newest K, and
    time travel above the surviving anchors keeps working."""
    from cdc_data_pipeline_spark.operators.incremental import (
        _list_anchor_seqs, create_anchor, table_at, vacuum_anchors,
        vacuum_changes)

    tgt = str(tmp_path / "tbl")
    for i in range(4):                                  # seqs 0..3
        upsert_bucketed(spark, tgt,
                        _mk(spark, [(1, f"v{i}", 10 + i, False),
                                    (i + 2, f"n{i}", 10 + i, False)]),
                        ["k"], "ts", n_buckets=4, delete_col="is_del",
                        emit_changes=True)
        create_anchor(spark, tgt)
    assert _list_anchor_seqs(spark, tgt) == [0, 1, 2, 3]
    assert vacuum_anchors(spark, tgt, keep=2) == 2
    assert _list_anchor_seqs(spark, tgt) == [2, 3]
    vacuum_changes(spark, tgt, before_seq=2)
    live = {(r["k"], r["v"]) for r in spark.read.parquet(tgt)
            .select("k", "v").collect()}
    got3 = {(r["k"], r["v"]) for r in table_at(spark, tgt, 3)
            .select("k", "v").collect()}
    got2 = {(r["k"], r["v"]) for r in table_at(spark, tgt, 2)
            .select("k", "v").collect()}
    assert got3 == live
    assert got2 == live - {(1, "v3"), (5, "n3")} | {(1, "v2")}
    with pytest.raises(ValueError, match="vacuumed"):
        table_at(spark, tgt, 1)        # its anchor and commits are gone


def test_bootstrap_replica_from_anchor_after_vacuum(spark, tmp_path):
    """apply_changes over a VACUUMED feed silently builds a partial
    replica (the trap); bootstrap_replica seeds from the newest anchor
    and applies the surviving tail — the fresh replica equals the
    source, and the returned watermark drives the normal incremental
    cadence afterwards. With neither an anchor nor a complete feed it
    refuses loudly."""
    from cdc_data_pipeline_spark.operators.incremental import (
        apply_changes, bootstrap_replica, create_anchor, read_changes,
        vacuum_changes)

    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    upsert_bucketed(spark, src,                                   # seq 0
                    _mk(spark, [(i, f"v{i}", 10, False)
                                for i in range(8)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, src,                                   # seq 1
                    _mk(spark, [(1, "x1", 20, False),
                                (3, None, 20, True)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    create_anchor(spark, src)                                     # @1
    upsert_bucketed(spark, src,                                   # seq 2
                    _mk(spark, [(9, "v9", 30, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    vacuum_changes(spark, src, before_seq=1)     # commits 0,1 pruned

    def rows(p):
        return {(r["k"], r["v"]) for r in
                spark.read.parquet(p).select("k", "v").collect()}

    wm = bootstrap_replica(spark, src, rep, n_buckets=4)
    assert wm == 2
    assert rows(rep) == rows(src)                # complete, not partial

    # normal incremental cadence continues from the watermark
    upsert_bucketed(spark, src, _mk(spark, [(2, "x2", 40, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    apply_changes(spark, read_changes(spark, src, since_seq=wm), rep,
                  ["k"])
    assert rows(rep) == rows(src)

    # no anchor + FORCED destructive vacuum: refuse rather than
    # converge wrong (the default would have cut an anchor first)
    src2 = str(tmp_path / "src2")
    upsert_bucketed(spark, src2, _mk(spark, [(1, "a", 10, False),
                                             (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, src2, _mk(spark, [(1, "a2", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    vacuum_changes(spark, src2, before_seq=0, anchor_first=False,
                   force=True)
    with pytest.raises(ValueError, match="anchor"):
        bootstrap_replica(spark, src2, str(tmp_path / "rep2"))


def test_stale_pointer_with_different_next_batch_no_duplicate_seq(
        spark, tmp_path):
    """Review-r8: crash between the commit rename and the pointer
    publish, then a DIFFERENT next batch (a batch-mode caller that
    moved on, outside the foreachBatch redelivery contract). Blindly
    trusting the stale pointer would mint a duplicate sequence and
    brick every feed read; the seq-prefixed glob probe detects the
    collision and recovers the true tail instead."""
    import json

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(2, "b", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    ptr = tmp_path / "tbl" / "_changes" / "_latest"
    commit0 = next(p.name for p in ptr.parent.iterdir()
                   if p.name.startswith("commit-0000000000-"))
    ptr.write_text(json.dumps(                      # rewind to seq 0
        {"seq": 0, "digest": commit0.split("-", 2)[2]}))

    upsert_bucketed(spark, tgt, _mk(spark, [(3, "c", 30, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    # no duplicate seq: the feed reads cleanly and is complete
    assert _feed(spark, tgt) == [(0, "insert", 1, "a", 10),
                                 (1, "insert", 2, "b", 20),
                                 (2, "insert", 3, "c", 30)]
    assert json.loads(ptr.read_text())["seq"] == 2


def test_creation_feed_survives_static_overwrite_sessions(spark, tmp_path):
    """Review-r8: the first write of a new table must not rely on the
    session's partitionOverwriteMode — under the Spark default
    ('static') a mode('overwrite') on the target would truncate the
    whole directory, deleting the feed commit and pointer published
    moments before. Both creation paths stage per-bucket moves
    instead."""
    from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        tgt = str(tmp_path / "tbl")
        upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                        ["k"], "ts", n_buckets=4, delete_col="is_del",
                        emit_changes=True)
        assert _feed(spark, tgt) == [(0, "insert", 1, "a", 10)]
        assert (tmp_path / "tbl" / "_changes" / "_latest").exists()

        snap = str(tmp_path / "snap")
        scd2_bucketed(spark, snap,
                      spark.createDataFrame([(1, "x")], "k long, v string"),
                      ["k"], ["v"], "2024-01-01 00:00:00", n_buckets=4,
                      emit_changes=True)
        got = read_changes(spark, snap)
        assert got is not None and got.count() == 1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_table_at_negative_seq_raises_cleanly(spark, tmp_path):
    from cdc_data_pipeline_spark.operators.incremental import table_at

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    with pytest.raises(ValueError, match=">= 0"):
        table_at(spark, tgt, -1)


def test_stream_ivm_heals_crashed_mart_swap(spark, tmp_path):
    """Review-r8: a crash between the mart swap's two renames strands
    the mart (and its watermark). The next fold must restore it before
    reading — otherwise it sees 'no mart', resets every accumulated
    sum to the new batch's deltas, and stamps a watermark that blocks
    repair forever."""
    import shutil

    from cdc_data_pipeline_spark.operators.incremental import (
        read_mart_seq)
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_ivm_to_parquet)

    tbl = str(tmp_path / "tbl")
    mart = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    schema = "k long, grp string, amt double, ts long, is_del boolean"
    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(1, "a", 10.0, 10, False), (2, "b", 5.0, 10, False)], schema),
        ["k"], "ts", n_buckets=4, delete_col="is_del",
        emit_changes=True, update_preimages=True)
    q = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q.awaitTermination(180)

    # strand the mart the way a crashed _replace_dir would
    shutil.move(mart, str(tmp_path / ".mart.__old__"))

    upsert_bucketed(spark, tbl, spark.createDataFrame(
        [(3, "a", 7.0, 20, False)], schema),
        ["k"], "ts", delete_col="is_del", emit_changes=True,
        update_preimages=True)
    q2 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q2.awaitTermination(180)
    got = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
           for r in spark.read.parquet(mart).collect()}
    assert got == {("a", 17.0, 2), ("b", 5.0, 1)}   # not reset
    assert read_mart_seq(spark, mart) == 1


def test_table_at_never_opens_commits_outside_range(spark, tmp_path):
    """Structural pin for the bounded as-of read: commits BELOW the
    covering anchor and ABOVE the requested seq are pruned on the
    directory list, never opened. Proven by corrupting both — if
    table_at touched either, the parquet read would fail."""
    from cdc_data_pipeline_spark.operators.incremental import (
        create_anchor, table_at)

    tgt = str(tmp_path / "tbl")
    upsert_bucketed(spark, tgt,                                  # seq 0
                    _mk(spark, [(1, "a", 10, False), (2, "b", 10, False)]),
                    ["k"], "ts", n_buckets=4, delete_col="is_del",
                    emit_changes=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "a2", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    create_anchor(spark, tgt)                                    # @1
    upsert_bucketed(spark, tgt, _mk(spark, [(3, "c", 30, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(4, "d", 40, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)

    feed_dir = tmp_path / "tbl" / "_changes"
    for seqname in ("commit-0000000000-", "commit-0000000003-"):
        cdir = next(p for p in feed_dir.iterdir()
                    if p.name.startswith(seqname))
        for f in cdir.iterdir():
            if f.name.endswith(".parquet"):
                f.write_bytes(b"not parquet at all")

    got = {(r["k"], r["v"]) for r in table_at(spark, tgt, 2)
           .select("k", "v").collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}
