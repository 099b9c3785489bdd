"""Bucketed-table layout metadata + maintenance (rebucket / compact /
stats).

The bucket count is a TABLE property: before the persisted layout, a
caller passing a different ``n_buckets`` than the table was created
with stamped batches into the wrong buckets — the anti-join then missed
the old row versions living elsewhere and the table silently
accumulated duplicate keys. These tests pin that the layout is loudly
enforced, that growing it (``rebucket``) is a planned atomic rewrite,
and that ``compact_table`` unifies post-evolution physical schemas.
"""

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import (
    TABLE_META, compact_table, rebucket, table_stats, upsert_bucketed)


def _rows(spark, path):
    return {r["k"]: (r["v"], r["ts"])
            for r in spark.read.option("mergeSchema", "true")
            .parquet(path).select("k", "v", "ts").collect()}


def test_layout_metadata_enforced(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(20)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    assert (tmp_path / "tbl" / TABLE_META).exists()

    batch = spark.createDataFrame([(3, "v3b", 20)],
                                  "k long, v string, ts long")
    # the pre-metadata hazard, now a loud error: wrong bucket count
    with pytest.raises(ValueError, match="n_buckets=8 conflicts"):
        upsert_bucketed(spark, tgt, batch, ["k"], "ts", n_buckets=8)
    # wrong key / tracking layout is equally fatal
    with pytest.raises(ValueError, match="layout mismatch"):
        upsert_bucketed(spark, tgt, batch, ["k"], "v", n_buckets=4)

    # None follows the table; matching explicit value also fine
    upsert_bucketed(spark, tgt, batch, ["k"], "ts")
    upsert_bucketed(
        spark, tgt,
        spark.createDataFrame([(5, "v5b", 20)], "k long, v string, ts long"),
        ["k"], "ts", n_buckets=4)
    got = _rows(spark, tgt)
    assert len(got) == 20                       # no duplicate keys
    assert got[3] == ("v3b", 20) and got[5] == ("v5b", 20)


def test_legacy_table_backfills_metadata(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(10)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    (tmp_path / "tbl" / TABLE_META).unlink()    # simulate pre-metadata

    batch = spark.createDataFrame([(1, "v1b", 20)],
                                  "k long, v string, ts long")
    upsert_bucketed(spark, tgt, batch, ["k"], "ts", n_buckets=4)
    assert (tmp_path / "tbl" / TABLE_META).exists()
    # backfilled layout is now enforced
    with pytest.raises(ValueError, match="conflicts"):
        upsert_bucketed(spark, tgt, batch, ["k"], "ts", n_buckets=16)
    assert len(_rows(spark, tgt)) == 10


def test_rebucket_grows_layout(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(50)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=2)

    rebucket(spark, tgt, 8)
    dirs = {p.name for p in (tmp_path / "tbl").iterdir()
            if p.name.startswith("__kb=")}
    assert len(dirs) > 2 and len(dirs) <= 8     # data actually re-spread
    assert _rows(spark, tgt) == {i: (f"v{i}", 10) for i in range(50)}
    st = table_stats(spark, tgt)
    assert st["meta"]["n_buckets"] == 8

    # post-rebucket upserts follow the NEW layout and still dedup keys
    with pytest.raises(ValueError, match="conflicts"):
        upsert_bucketed(
            spark, tgt,
            spark.createDataFrame([(7, "x", 20)],
                                  "k long, v string, ts long"),
            ["k"], "ts", n_buckets=2)
    upsert_bucketed(
        spark, tgt,
        spark.createDataFrame([(7, "v7b", 20)],
                              "k long, v string, ts long"),
        ["k"], "ts")
    got = _rows(spark, tgt)
    assert len(got) == 50 and got[7] == ("v7b", 20)


def test_compact_unifies_schema_and_files(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(40)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    widened = spark.createDataFrame(
        [(1, "v1b", 20, "n1")], "k long, v string, ts long, note string")
    upsert_bucketed(spark, tgt, widened, ["k"], "ts", evolve_schema=True)

    st = table_stats(spark, tgt)
    assert st["schema_drift"] and st["distinct_schemas"] == 2
    assert st["n_rows"] == 40

    compact_table(spark, tgt)
    st2 = table_stats(spark, tgt)
    assert not st2["schema_drift"] and st2["distinct_schemas"] == 1
    assert st2["max_files_per_bucket"] == 1
    assert st2["n_rows"] == 40 and st2["n_buckets_observed"] == 4
    # plain read (no mergeSchema) now sees the evolved column everywhere
    plain = spark.read.parquet(tgt)
    assert "note" in plain.columns
    got = {r["k"]: r["note"] for r in plain.collect()}
    assert got[1] == "n1" and got[2] is None

    # files_per_bucket>1 splits an oversized bucket's rewrite
    compact_table(spark, tgt, files_per_bucket=2)
    st3 = table_stats(spark, tgt)
    assert st3["n_rows"] == 40
    assert st3["max_files_per_bucket"] <= 2


def test_scd2_bucketed_layout_enforced(spark, tmp_path):
    from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed

    tgt = str(tmp_path / "snap")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, attr string")
    scd2_bucketed(spark, tgt, b1, ["k"], ["attr"], "2024-01-01 00:00:00",
                  n_buckets=4)
    assert (tmp_path / "snap" / TABLE_META).exists()

    b2 = spark.createDataFrame([(1, "a2")], "k long, attr string")
    with pytest.raises(ValueError, match="conflicts"):
        scd2_bucketed(spark, tgt, b2, ["k"], ["attr"],
                      "2024-01-02 00:00:00", n_buckets=8)
    scd2_bucketed(spark, tgt, b2, ["k"], ["attr"], "2024-01-02 00:00:00")
    snap = spark.read.parquet(tgt)
    assert snap.filter(F.col("k") == 1).count() == 2      # two versions
    assert snap.filter(F.col("dbt_valid_to").isNull()).count() == 2


def test_locked_table_rewrites_serialize(spark, tmp_path):
    """Two concurrent compact_table calls under ``lock=True``
    SERIALIZE (both complete, data intact) — the table analogue of the
    index-family lock test. The marker lives in a SIBLING root because
    the rewrite swaps the table directory wholesale; it is gone after
    both release."""
    import threading

    from cdc_data_pipeline_spark.operators import lsm
    from cdc_data_pipeline_spark.sources import fsutil
    from cdc_data_pipeline_spark.sources.fsutil import path_join

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(30)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)

    errors = []
    barrier = threading.Barrier(2)

    def run():
        barrier.wait()
        try:
            compact_table(spark, tgt, lock=True, lock_timeout=600)
        except Exception as ex:  # noqa: BLE001 - assert below
            errors.append(ex)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert errors == []
    assert not fsutil.exists(
        spark, path_join(tgt + ".__maint__", lsm.MAINT_LOCK))
    assert _rows(spark, tgt) == {i: (f"v{i}", 10) for i in range(30)}


def test_compact_sort_by_row_group_stats(spark, tmp_path):
    """``sort_by`` clusters rows inside each bucket so parquet row
    groups carry TIGHT min/max stats on the sort column — the
    data-skipping property: verified physically (every file sorted by
    ts, so multi-row-group files have non-overlapping ranges) and
    logically (a time-range filter still returns exactly the right
    rows)."""
    import pyarrow.parquet as pq

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", (i * 7919) % 1000) for i in range(2000)],
        "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    compact_table(spark, tgt, sort_by=["ts"])

    files = list((tmp_path / "tbl").glob("__kb=*/*.parquet"))
    assert files
    for f in files:
        ts = pq.read_table(str(f), columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts)        # row groups get tight min/max

    got = {r["k"] for r in spark.read.parquet(tgt)
           .filter(F.col("ts") < 100).collect()}
    want = {i for i in range(2000) if (i * 7919) % 1000 < 100}
    assert got == want


def test_table_and_feed_roundtrip_under_scheme(spark, tmp_path):
    """The whole bucketed-table lifecycle — create, mixed-op merge
    with feed, read_changes, rebucket (feed carried across the swap),
    compact with sort_by, stats — under bare, ``file://`` and (when
    compiled) ``mockfs://`` roots: every new fsutil call the table
    family added must resolve through the Hadoop FileSystem, not
    assume a local path."""
    import pytest as _pytest

    from tests.conftest import MOCKFS_CLASSPATH
    from cdc_data_pipeline_spark.operators.incremental import (
        read_changes)

    schemes = ["", "file://"]
    if MOCKFS_CLASSPATH is not None:
        schemes.append("mockfs://")
    for scheme in schemes:
        tgt = scheme + str(tmp_path / f"tbl_{scheme.rstrip(':/') or 'bare'}")
        base = spark.createDataFrame(
            [(i, f"v{i}", 10, False) for i in range(12)],
            "k long, v string, ts long, is_del boolean")
        upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=2,
                        delete_col="is_del", emit_changes=True)
        batch = spark.createDataFrame(
            [(1, "x", 20, False), (2, None, 20, True)],
            "k long, v string, ts long, is_del boolean")
        upsert_bucketed(spark, tgt, batch, ["k"], "ts",
                        delete_col="is_del", emit_changes=True)
        rebucket(spark, tgt, 4)
        compact_table(spark, tgt, sort_by=["ts"])
        got = {r["k"]: r["v"]
               for r in spark.read.parquet(tgt).select("k", "v").collect()}
        assert got == {**{i: f"v{i}" for i in range(12) if i != 2},
                       1: "x"}, scheme
        feed = read_changes(spark, tgt, since_seq=0)
        ops = sorted((r["_op"], r["k"]) for r in feed.collect())
        assert ops == [("delete", 2), ("update", 1)], scheme
        st = table_stats(spark, tgt)
        assert st["n_rows"] == 11 and st["meta"]["n_buckets"] == 4, scheme


def test_rebucket_multiple_is_shuffle_free_split(spark, tmp_path):
    """Growing to a MULTIPLE of the current bucket count is a map-only
    SPLIT — pmod(h, m*n) ≡ pmod(h, n) (mod n), so each parent bucket's
    rows land in exactly its m children with no exchange. Pinned: the
    strategy reports 'split', every child's rows actually belong there
    (a later upsert with the new layout replaces, never duplicates),
    sort_by survives splitting, and a non-multiple falls back to
    'shuffle'."""
    import pyarrow.parquet as pq

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", (i * 31) % 50) for i in range(200)],
        "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)

    assert rebucket(spark, tgt, 8, sort_by=["ts"]) == "split"
    assert table_stats(spark, tgt)["meta"]["n_buckets"] == 8
    assert {r["k"] for r in spark.read.parquet(tgt).collect()} \
        == set(range(200))
    # sort_by survived the map-only split
    for f in (tmp_path / "tbl").glob("__kb=*/*.parquet"):
        ts = pq.read_table(str(f), columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts)
    # rows really live in their new-layout bucket: an upsert under the
    # new layout must REPLACE (prune to the right bucket), not add
    upsert_bucketed(spark, tgt,
                    spark.createDataFrame([(7, "x", 99)],
                                          "k long, v string, ts long"),
                    ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert len(got) == 200 and got[7] == "x"

    assert rebucket(spark, tgt, 12, sort_by=["ts"]) == "shuffle"  # 12 % 8 != 0
    assert {r["k"] for r in spark.read.parquet(tgt).collect()} \
        == set(range(200))


def test_recover_table_heals_crashed_rewrite(spark, tmp_path):
    """ADVICE-r7 low: _rewrite_table's swap is two renames; a crash
    between them leaves NO live table and the previous state stranded
    in .__old__. recover_table (also run at the top of every rewrite)
    must restore it — including the change feed when the crash hit
    after the feed had already moved into the .__rewrite__ staging
    dir — instead of a rerun failing at the initial read."""
    import shutil

    from cdc_data_pipeline_spark.operators.incremental import (
        read_changes, recover_table)

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(12)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=2,
                    emit_changes=True)
    want = _rows(spark, tgt)

    # crash window A: table renamed aside, feed still inside it
    shutil.move(tgt, tgt + ".__old__")
    assert recover_table(spark, tgt) == [tgt]
    assert _rows(spark, tgt) == want
    assert read_changes(spark, tgt).count() == 12

    # crash window B: feed had already moved into the staging dir
    shutil.move(tgt, tgt + ".__old__")
    (tmp_path / "tbl.__rewrite__").mkdir()
    shutil.move(tgt + ".__old__/_changes", str(tmp_path / "tbl.__rewrite__" / "_changes"))
    assert recover_table(spark, tgt) == [tgt]
    assert _rows(spark, tgt) == want
    assert read_changes(spark, tgt).count() == 12     # feed pulled back

    # and a rerun of the rewrite heals the remnant by itself
    shutil.move(tgt, tgt + ".__old__")
    rebucket(spark, tgt, 4)
    assert _rows(spark, tgt) == want
    assert read_changes(spark, tgt).count() == 12

    # crash window C: one BUCKET stranded mid _replace_dir swap (the
    # strand name is dot-prefixed so Spark scans never discover it)
    shutil.move(tgt + "/__kb=1", tgt + "/.__kb=1.__old__")
    assert recover_table(spark, tgt) == [tgt + "/__kb=1"]
    assert _rows(spark, tgt) == want
    # idempotent when healthy
    assert recover_table(spark, tgt) == []


def test_maintenance_lock_probe_fault_times_out(spark, tmp_path,
                                                monkeypatch):
    """ADVICE-r7 low: a persistent getFileStatus fault (permissions,
    transient FS error) while the lock is held must end in
    MaintenanceLockHeld at the acquire deadline — not a busy-spin that
    never raises."""
    import time

    from cdc_data_pipeline_spark.operators import lsm
    from cdc_data_pipeline_spark.sources import fsutil

    root = str(tmp_path / "idx")
    holder = lsm.maintenance_lock(spark, root, timeout_sec=5)
    holder.__enter__()
    try:
        real = fsutil._fs

        class BrokenFS:
            def __init__(self, fs):
                self._fs = fs

            def getFileStatus(self, p):
                raise RuntimeError("synthetic persistent probe fault")

            def __getattr__(self, name):
                return getattr(self._fs, name)

        def patched(sp, path):
            fs, p = real(sp, path)
            return BrokenFS(fs), p

        monkeypatch.setattr(fsutil, "_fs", patched)
        t0 = time.monotonic()
        with pytest.raises(lsm.MaintenanceLockHeld,
                           match="status unavailable"):
            with lsm.maintenance_lock(spark, root, timeout_sec=0.8,
                                      poll_sec=0.05):
                pass
        elapsed = time.monotonic() - t0
        assert 0.7 <= elapsed < 10          # deadline honored, paced
        monkeypatch.undo()
    finally:
        holder.__exit__(None, None, None)


def test_locked_upserts_serialize(spark, tmp_path):
    """VERDICT-r7 #5: two concurrent upsert_bucketed(emit_changes)
    writers racing one table from OUTSIDE a stream serialize under
    ``lock=True`` — both merges land, the feed gets two commits with
    DISTINCT sequence numbers (the duplicate-seq race the detect-only
    contract would have surfaced at read), and the lock marker is gone
    after both release."""
    import threading

    from cdc_data_pipeline_spark.operators import lsm
    from cdc_data_pipeline_spark.operators.incremental import (
        read_changes)
    from cdc_data_pipeline_spark.sources import fsutil
    from cdc_data_pipeline_spark.sources.fsutil import path_join

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(16)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4,
                    emit_changes=True)

    errors = []
    barrier = threading.Barrier(2)

    def run(lo):
        batch = spark.createDataFrame(
            [(k, f"n{k}", 20) for k in range(lo, lo + 4)],
            "k long, v string, ts long")
        barrier.wait()
        try:
            upsert_bucketed(spark, tgt, batch, ["k"], "ts",
                            emit_changes=True, lock=True,
                            lock_timeout=600)
        except Exception as ex:  # noqa: BLE001 - assert below
            errors.append(ex)

    threads = [threading.Thread(target=run, args=(lo,)) for lo in (0, 8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert errors == []
    feed = read_changes(spark, tgt, since_seq=0)     # raises on dup seq
    assert {r["_seq"] for r in feed.collect()} == {1, 2}
    got = _rows(spark, tgt)
    want = {i: (f"n{i}" if i in (*range(0, 4), *range(8, 12)) else f"v{i}",
                20 if i in (*range(0, 4), *range(8, 12)) else 10)
            for i in range(16)}
    assert got == want
    assert not fsutil.exists(
        spark, path_join(tgt + ".__maint__", lsm.MAINT_LOCK))


def test_merge_heals_stranded_bucket_no_row_loss(spark, tmp_path):
    """Review-r8: a crash between _replace_dir's two renames strands
    one BUCKET (dst missing, hidden .__kb=N.__old__ present). The next
    merge must heal it BEFORE reading — otherwise the stranded rows
    are invisible to the anti-join and permanently lost when the swap
    then discards the strand."""
    import shutil

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(40)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4,
                    emit_changes=True)
    want = _rows(spark, tgt)
    # strand a non-empty bucket the way a crashed swap would
    victim = next(p for p in (tmp_path / "tbl").iterdir()
                  if p.name.startswith("__kb="))
    shutil.move(str(victim), str(victim.parent / f".{victim.name}.__old__"))
    # a merge touching EVERY bucket (worst case: the strand is in the
    # affected set and would be destroyed unhealed)
    batch = spark.createDataFrame(
        [(i, f"n{i}", 20) for i in range(40)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, batch, ["k"], "ts", emit_changes=True)
    got = _rows(spark, tgt)
    assert got == {i: (f"n{i}", 20) for i in range(40)}
    assert len(got) == len(want)                 # nothing lost


def test_completed_swap_leftover_is_invisible_and_swept(spark, tmp_path):
    """A crash AFTER a bucket swap completed (strand sibling never
    deleted) must not pollute scans — the dot-prefixed strand name is
    invisible to Spark's file index — and recover_table sweeps it so a
    later legitimate bucket drain can never mistake the stale copy for
    a crashed swap and resurrect deleted rows."""
    import shutil

    from cdc_data_pipeline_spark.operators.incremental import (
        recover_table)

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(20)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    bucket = next(p for p in (tmp_path / "tbl").iterdir()
                  if p.name.startswith("__kb="))
    shutil.copytree(str(bucket),
                    str(bucket.parent / f".{bucket.name}.__old__"))
    # invisible: no duplicate rows, no string-typed partition column
    assert spark.read.parquet(tgt).count() == 20
    # swept (dst exists -> garbage), nothing "restored"
    assert recover_table(spark, tgt) == []
    assert not (bucket.parent / f".{bucket.name}.__old__").exists()


def test_recover_table_legacy_strand_and_rewrite_leftover_gc(spark,
                                                             tmp_path):
    """Review-r8 follow-ups: (a) a legacy VISIBLE '__kb=N.__old__'
    strand (pre dot-prefix naming) parses as a partition and corrupts
    scans — recover_table heals it when its bucket is missing and
    sweeps it when the bucket is live; (b) completed-rewrite leftovers
    (<table>.__old__ / <table>.__rewrite__ beside a LIVE table) are
    whole-table-sized garbage that recover_table now collects."""
    import shutil

    from cdc_data_pipeline_spark.operators.incremental import (
        recover_table)

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10) for i in range(20)], "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)
    want = _rows(spark, tgt)

    bucket = next(p for p in (tmp_path / "tbl").iterdir()
                  if p.name.startswith("__kb="))
    # legacy strand with the bucket MISSING: heal
    shutil.move(str(bucket), str(bucket) + ".__old__")
    assert recover_table(spark, tgt) == [str(bucket)]
    assert _rows(spark, tgt) == want
    # legacy strand with the bucket LIVE: sweep (it would otherwise
    # feed duplicate rows and flip __kb inference to string)
    shutil.copytree(str(bucket), str(bucket) + ".__old__")
    assert recover_table(spark, tgt) == []
    assert not (tmp_path / "tbl" / (bucket.name + ".__old__")).exists()
    assert _rows(spark, tgt) == want

    # completed-rewrite leftovers beside a live table: collected
    shutil.copytree(tgt, tgt + ".__old__")
    shutil.copytree(tgt, tgt + ".__rewrite__")
    assert recover_table(spark, tgt) == []
    assert not (tmp_path / "tbl.__old__").exists()
    assert not (tmp_path / "tbl.__rewrite__").exists()


def test_rollup_and_compact_heal_crashed_swaps(spark, tmp_path):
    """Review-r8: the OTHER two _replace_dir callers get the same
    healing — a rollup time-partition stranded mid-swap folds back in
    instead of being destroyed, and compact_parquet self-heals instead
    of failing at the initial read."""
    import shutil

    from cdc_data_pipeline_spark.operators.maintenance import (
        compact_parquet)
    from cdc_data_pipeline_spark.operators.rollup import (
        incremental_rollup)

    # rollup: two time buckets, strand one, fold a new batch in
    roll = str(tmp_path / "roll")
    b1 = spark.createDataFrame(
        [("2024-01-01 00:05:00", 1.0), ("2024-01-01 01:05:00", 2.0)],
        "ts string, amt double").selectExpr("CAST(ts AS timestamp) ts",
                                            "amt")
    specs = [("sum", "amt", "amt_sum"), ("count", None, "n")]
    incremental_rollup(spark, roll, b1, "ts", "1 hour", [], specs)
    victim = next(p for p in (tmp_path / "roll").iterdir()
                  if p.name.startswith("__pb="))
    shutil.move(str(victim), str(victim.parent / f".{victim.name}.__old__"))
    b2 = spark.createDataFrame(
        [("2024-01-01 00:10:00", 10.0), ("2024-01-01 01:10:00", 10.0)],
        "ts string, amt double").selectExpr("CAST(ts AS timestamp) ts",
                                            "amt")
    incremental_rollup(spark, roll, b2, "ts", "1 hour", [], specs)
    got = {round(r["amt_sum"], 1) for r in
           spark.read.parquet(roll).collect()}
    assert got == {11.0, 12.0}                   # nothing lost

    # compact_parquet: strand the whole table mid-swap, rerun heals
    flat = str(tmp_path / "flat")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(flat)
    shutil.move(flat, str(tmp_path / ".flat.__old__"))
    compact_parquet(spark, flat, target_bytes=1 << 20)
    assert spark.read.parquet(flat).count() == 100
