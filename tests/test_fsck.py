"""fsck_table: the READ-ONLY invariant audit over the bucketed CDC
table protocol — the diagnostic counterpart of recover_table /
reconcile_changes. Every check is provoked with a forged on-disk
state, asserted to be reported (not healed — fsck never mutates), and
then the matching repair tool is run and fsck must come back clean.
"""

import json
import shutil
import subprocess
import sys

from cdc_data_pipeline_spark.operators.incremental import (
    create_anchor,
    delete_bucketed,
    fsck_table,
    recover_table,
    reconcile_changes,
    upsert_bucketed,
    vacuum_changes,
)


def _mk(spark, rows, schema="k long, v string, ts long, is_del boolean"):
    return spark.createDataFrame(rows, schema)


def _seed(spark, tgt, n=8, n_buckets=2):
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(i, f"v{i}", 10, False) for i in range(n)]),
                    ["k"], "ts", n_buckets=n_buckets, delete_col="is_del",
                    emit_changes=True)


def _checks(report, severity=None):
    return {f["check"] for f in report["findings"]
            if severity is None or f["severity"] == severity}


def _mtime_tree(root):
    import os

    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


class TestCleanTable:
    def test_clean_lifecycle_is_ok(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        upsert_bucketed(spark, tgt, _mk(spark, [(1, "x", 20, False),
                                                (3, None, 21, True)]),
                        ["k"], "ts", delete_col="is_del",
                        emit_changes=True)
        rep = fsck_table(spark, tgt)
        assert rep["ok"] and rep["errors"] == 0 and rep["warnings"] == 0
        deep = fsck_table(spark, tgt, deep=True)
        assert deep["ok"], deep["findings"]

    def test_fsck_is_read_only(self, spark, tmp_path):
        """fsck against a DIRTY state must not heal, delete, or touch
        anything — byte-for-byte mtime map unchanged."""
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        (tmp_path / "tbl.__staging__-cafe").mkdir()
        (tmp_path / "tbl.__staging__-cafe" / "junk").write_text("x")
        before = _mtime_tree(str(tmp_path))
        rep = fsck_table(spark, tgt, deep=True)
        assert not rep["ok"] or rep["warnings"] > 0
        assert _mtime_tree(str(tmp_path)) == before
        assert (tmp_path / "tbl.__staging__-cafe").exists()

    def test_missing_table(self, spark, tmp_path):
        rep = fsck_table(spark, str(tmp_path / "nope"))
        assert not rep["ok"] and _checks(rep) == {"table_missing"}

    def test_feedless_table_is_ok(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        upsert_bucketed(spark, tgt,
                        _mk(spark, [(1, "a", 1, False)]),
                        ["k"], "ts", n_buckets=2, delete_col="is_del")
        rep = fsck_table(spark, tgt)
        assert rep["ok"] and _checks(rep, "info") == {"no_feed"}


class TestDebrisReporting:
    def test_crash_debris_reported_then_healed(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        # forge: merge staging leak + bucket strand + rewrite staging
        (tmp_path / "tbl.__staging__-dead").mkdir()
        (tmp_path / "tbl.__rewrite__").mkdir()
        bucket = next(p for p in (tmp_path / "tbl").iterdir()
                      if p.name.startswith("__kb="))
        shutil.copytree(bucket, tmp_path / "tbl" / f".{bucket.name}.__old__")
        rep = fsck_table(spark, tgt)
        assert {"merge_staging_leak", "rewrite_staging",
                "bucket_strand"} <= _checks(rep, "warn")
        assert rep["ok"]                     # warnings only, healable
        recover_table(spark, tgt)
        rep2 = fsck_table(spark, tgt)
        assert rep2["ok"] and rep2["warnings"] == 0

    def test_lock_marker_is_info(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        lockdir = tmp_path / "tbl.__maint__" / "_MAINT_LOCK"
        lockdir.mkdir(parents=True)
        assert "write_lock" in _checks(fsck_table(spark, tgt), "info")


class TestFeedInvariants:
    def test_duplicate_seq_reported_then_reconciled(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        changes = tmp_path / "tbl" / "_changes"
        commit = next(p for p in changes.iterdir()
                      if p.name.startswith("commit-"))
        seq = commit.name.split("-", 2)[1]
        shutil.copytree(commit, changes / f"commit-{seq}-feedface")
        rep = fsck_table(spark, tgt)
        assert not rep["ok"]
        assert "duplicate_seq" in _checks(rep, "error")
        reconcile_changes(spark, tgt)
        rep2 = fsck_table(spark, tgt)
        assert rep2["ok"]
        assert "conflict_quarantine" in _checks(rep2, "info")

    def test_interior_gap_is_error(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        for ts in (20, 30):
            upsert_bucketed(spark, tgt,
                            _mk(spark, [(1, f"x{ts}", ts, False)]),
                            ["k"], "ts", delete_col="is_del",
                            emit_changes=True)
        changes = tmp_path / "tbl" / "_changes"
        victim = next(p for p in changes.iterdir()
                      if p.name.startswith("commit-0000000001-"))
        shutil.rmtree(victim)
        rep = fsck_table(spark, tgt)
        assert not rep["ok"]
        assert "seq_gap" in _checks(rep, "error")

    def test_vacuum_coverage(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        upsert_bucketed(spark, tgt, _mk(spark, [(1, "x", 20, False)]),
                        ["k"], "ts", delete_col="is_del",
                        emit_changes=True)
        # default vacuum auto-anchors: fsck stays clean
        vacuum_changes(spark, tgt, before_seq=0)
        rep = fsck_table(spark, tgt)
        assert rep["ok"] and rep["warnings"] == 0
        # forge the uncovered case: drop the anchor after a vacuum
        for p in (tmp_path / "tbl" / "_changes").iterdir():
            if p.name.startswith("anchor-"):
                shutil.rmtree(p)
        rep2 = fsck_table(spark, tgt)
        assert "vacuum_uncovered" in _checks(rep2, "warn")

    def test_latest_ptr_states(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        upsert_bucketed(spark, tgt, _mk(spark, [(2, "y", 20, False)]),
                        ["k"], "ts", delete_col="is_del",
                        emit_changes=True)
        ptr = tmp_path / "tbl" / "_changes" / "_latest"
        good = json.loads(ptr.read_text())
        # stale (behind): healable warn
        ptr.write_text(json.dumps({"seq": 0, "digest": "whatever"}))
        assert "latest_ptr_stale" in _checks(fsck_table(spark, tgt), "warn")
        # ahead: error
        ptr.write_text(json.dumps({"seq": 9, "digest": "whatever"}))
        assert "latest_ptr_ahead" in _checks(fsck_table(spark, tgt),
                                             "error")
        # digest mismatch at the right seq: error
        ptr.write_text(json.dumps({"seq": good["seq"],
                                   "digest": "tampered"}))
        assert "latest_ptr_digest" in _checks(fsck_table(spark, tgt),
                                              "error")
        # missing: legacy info
        ptr.unlink()
        assert "latest_ptr" in _checks(fsck_table(spark, tgt), "info")
        # restore
        ptr.write_text(json.dumps(good))
        assert fsck_table(spark, tgt)["ok"]

    def test_corrupt_latest_ptr_is_finding_not_crash(self, spark,
                                                     tmp_path):
        """ADVICE r9: a torn/unparseable _latest (bad JSON, missing
        keys, non-int seq) must become an error-severity
        'latest_ptr_corrupt' finding — the auditor documented as
        'only REPORTS' must never raise out of it."""
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        ptr = tmp_path / "tbl" / "_changes" / "_latest"
        good = ptr.read_text()
        for payload in ('{"seq": 1, "digest"',         # torn JSON
                        '{"digest": "x"}',             # missing seq
                        '{"seq": 1}',                  # missing digest
                        '{"seq": "abc", "digest": "x"}',  # non-int seq
                        ""):                           # zero-length
            ptr.write_text(payload)
            rep = fsck_table(spark, tgt)
            assert "latest_ptr_corrupt" in _checks(rep, "error"), \
                (payload, rep["findings"])
            assert not rep["ok"]
        ptr.write_text(good)
        assert fsck_table(spark, tgt)["ok"]

    def test_malformed_anchor_name_is_finding_not_crash(self, spark,
                                                        tmp_path):
        """ADVICE r9: an anchor dir with a non-numeric seq suffix must
        be reported as an 'anchor_name' error like malformed commit
        names are, not crash the auditor with ValueError."""
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        create_anchor(spark, tgt)
        bad = tmp_path / "tbl" / "_changes" / "anchor-not_a_number"
        bad.mkdir()
        rep = fsck_table(spark, tgt)
        assert "anchor_name" in _checks(rep, "error"), rep["findings"]
        shutil.rmtree(bad)
        assert fsck_table(spark, tgt)["ok"]


class TestDeepChecks:
    def test_misbucketed_rows_detected(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt, n=8, n_buckets=2)
        # forge: copy bucket 0's files into bucket 1 — those rows'
        # keys hash to 0, so they are misbucketed under 1 (and the
        # table now has duplicate keys the merges would never collapse)
        b0 = tmp_path / "tbl" / "__kb=0"
        b1 = tmp_path / "tbl" / "__kb=1"
        for f in b0.glob("*.parquet"):
            shutil.copy(f, b1 / ("forged-" + f.name))
        rep = fsck_table(spark, tgt, deep=True)
        assert not rep["ok"]
        assert "misbucketed_rows" in _checks(rep, "error")
        # shallow fsck does NOT scan data: same state passes
        assert "misbucketed_rows" not in _checks(fsck_table(spark, tgt))

    def test_replay_divergence_detected(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        delete_bucketed(spark, tgt,
                        spark.createDataFrame([(5,)], "k long"),
                        emit_changes=True)
        assert fsck_table(spark, tgt, deep=True)["ok"]
        # forge an out-of-band edit: drop the newest commit's rows by
        # replacing the commit dir with the previous one's content
        changes = tmp_path / "tbl" / "_changes"
        commits = sorted(p for p in changes.iterdir()
                         if p.name.startswith("commit-"))
        assert len(commits) == 2
        # gut the delete commit: feed now replays to the pre-delete
        # state while the table has the delete applied
        shutil.rmtree(commits[1])
        shutil.copytree(commits[0], commits[1])
        rep = fsck_table(spark, tgt, deep=True)
        assert not rep["ok"]
        assert "replay_divergence" in _checks(rep, "error")


class TestCli:
    def test_table_fsck_verb(self, spark, tmp_path):
        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        env_ok = subprocess.run(
            [sys.executable, "-m", "cdc_data_pipeline_spark",
             "table-fsck", "--path", tgt],
            capture_output=True, text=True, cwd="/root/repo")
        assert env_ok.returncode == 0, env_ok.stderr[-2000:]
        out = json.loads(env_ok.stdout.strip().splitlines()[-1])
        assert out["ok"] and out["path"] == tgt

        # brick the feed: duplicate seq -> exit 1
        changes = tmp_path / "tbl" / "_changes"
        commit = next(p for p in changes.iterdir()
                      if p.name.startswith("commit-"))
        seq = commit.name.split("-", 2)[1]
        shutil.copytree(commit, changes / f"commit-{seq}-feedface")
        env_bad = subprocess.run(
            [sys.executable, "-m", "cdc_data_pipeline_spark",
             "table-fsck", "--path", tgt],
            capture_output=True, text=True, cwd="/root/repo")
        assert env_bad.returncode == 1
        out = json.loads(env_bad.stdout.strip().splitlines()[-1])
        assert not out["ok"]
        assert any(f["check"] == "duplicate_seq" for f in out["findings"])


class TestLookupBucketed:
    def test_lookup_returns_exact_rows_and_prunes_partitions(
            self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.incremental import (
            lookup_bucketed)

        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt, n=64, n_buckets=8)
        probe = spark.createDataFrame([(3,), (17,), (42,)], "k long")
        got = lookup_bucketed(spark, tgt, probe)
        assert {(r["k"], r["v"]) for r in got.collect()} \
            == {(3, "v3"), (17, "v17"), (42, "v42")}
        assert "__kb" not in got.columns
        # plan pin: the bucket filter must land in PartitionFilters —
        # non-matching bucket directories are never opened
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        seg = plan.split("PartitionFilters")[1][:200]
        assert "__kb" in seg and "IN" in seg.upper()

    def test_lookup_misses_and_dupes(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.incremental import (
            lookup_bucketed)

        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt, n=8)
        probe = spark.createDataFrame([(1,), (1,), (999,)], "k long")
        got = lookup_bucketed(spark, tgt, probe).collect()
        assert [(r["k"], r["v"]) for r in got] == [(1, "v1")]

    def test_lookup_heals_stranded_bucket_first(self, spark, tmp_path):
        """A lookup against a table with a crash-stranded bucket must
        heal it, not silently miss that bucket's keys."""
        from cdc_data_pipeline_spark.operators.incremental import (
            bucket_of, lookup_bucketed)

        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt, n=16, n_buckets=4)
        # which bucket holds k=5 under the table's layout?
        bid = spark.createDataFrame([(5,)], "k long").select(
            bucket_of(["k"], 4).alias("b")).collect()[0]["b"]
        live = tmp_path / "tbl" / f"__kb={bid}"
        strand = tmp_path / "tbl" / f".__kb={bid}.__old__"
        live.rename(strand)                    # forge the crash window
        probe = spark.createDataFrame([(5,)], "k long")
        got = lookup_bucketed(spark, tgt, probe).collect()
        assert [(r["k"], r["v"]) for r in got] == [(5, "v5")]
        assert live.exists() and not strand.exists()

    def test_lookup_rejects_wrong_probe_columns(self, spark, tmp_path):
        import pytest as _pytest

        from cdc_data_pipeline_spark.operators.incremental import (
            lookup_bucketed)

        tgt = str(tmp_path / "tbl")
        _seed(spark, tgt)
        with _pytest.raises(ValueError, match="exactly the table's keys"):
            lookup_bucketed(spark, tgt,
                            spark.createDataFrame([(1, "a")],
                                                  "k long, v string"))


class TestScd2Fsck:
    def test_deep_fsck_on_scd2_table(self, spark, tmp_path):
        """The SCD2 family shares the table protocol but its feed is
        keyed by dbt_scd_id (version transitions, not business keys):
        deep fsck's replay equivalence must hold across open + close
        version history, not just latest state."""
        from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed

        tgt = str(tmp_path / "dim")
        scd2_bucketed(spark, tgt,
                      spark.createDataFrame([(1, "a"), (2, "b")],
                                            "k long, v string"),
                      ["k"], ["v"], "2024-01-01 00:00:00",
                      n_buckets=2, emit_changes=True)
        scd2_bucketed(spark, tgt,
                      spark.createDataFrame([(1, "a2"), (3, "c")],
                                            "k long, v string"),
                      ["k"], ["v"], "2024-01-02 00:00:00",
                      emit_changes=True)
        rep = fsck_table(spark, tgt, deep=True)
        assert rep["ok"], rep["findings"]
        # forge an out-of-band row edit: rewrite one bucket's files
        # with a value the feed never recorded; deep fsck must catch it
        from pyspark.sql import functions as F

        bucket = next(p for p in (tmp_path / "dim").iterdir()
                      if p.name.startswith("__kb="))
        tampered = spark.read.parquet(str(bucket)) \
            .withColumn("v", F.lit("tampered"))
        staging = tmp_path / "tampered"
        tampered.write.mode("overwrite").parquet(str(staging))
        for old in list(bucket.glob("*.parquet")) \
                + list(bucket.glob(".*.crc")):
            old.unlink()
        for i, f in enumerate(sorted(staging.glob("*.parquet"))):
            shutil.copy(f, bucket / f"tampered-{i}.parquet")
        shutil.rmtree(staging)
        rep2 = fsck_table(spark, tgt, deep=True)
        assert not rep2["ok"]
        assert "replay_divergence" in _checks(rep2, "error")


class TestIndexFsck:
    """fsck_index: same provoke -> report -> repair -> clean discipline
    over the LSM index protocol (one family suffices — all four ride
    lsm.py's pointer/manifest/marker machinery)."""

    def _build(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators import dedup_index as di

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i} " * 3) for i in range(40)],
            "doc_id long, text string")
        path = str(tmp_path / "lsh")
        di.build_lsh_index(spark, docs, path, n_prefixes=8)
        return path, docs

    def test_clean_index_then_lifecycle(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators import dedup_index as di
        from cdc_data_pipeline_spark.operators.lsm import fsck_index

        path, docs = self._build(spark, tmp_path)
        rep = fsck_index(spark, path)
        assert rep["ok"] and rep["errors"] == 0, rep["findings"]
        assert rep["kind"] == "lsh" and rep["n_deltas"] == 0
        # append a delta, fsck counts it committed
        more = spark.createDataFrame(
            [(100 + i, f"epsilon zeta {i} " * 4) for i in range(5)],
            "doc_id long, text string")
        di.append_lsh_index(spark, path, more)
        rep2 = fsck_index(spark, path)
        assert rep2["ok"] and rep2["n_deltas"] == 1

    def test_dangling_pointer_is_error(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.lsm import fsck_index

        path, _ = self._build(spark, tmp_path)
        (tmp_path / "lsh" / "BASE").write_text("base-0000000042-dead")
        rep = fsck_index(spark, path)
        assert not rep["ok"]
        assert any(f["check"] == "pointer_dangling"
                   for f in rep["findings"])

    def test_uncommitted_delta_is_warn(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.lsm import fsck_index

        path, _ = self._build(spark, tmp_path)
        (tmp_path / "lsh" / "delta" / "deadbeef").mkdir(parents=True)
        rep = fsck_index(spark, path)
        assert rep["ok"]                 # debris, not corruption
        assert any(f["check"] == "delta_uncommitted"
                   for f in rep["findings"])
        assert rep["n_uncommitted_deltas"] == 1

    def test_corrupt_manifest_is_error(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.lsm import fsck_index

        path, _ = self._build(spark, tmp_path)
        gen = (tmp_path / "lsh" / "BASE").read_text().strip()
        (tmp_path / "lsh" / gen / "compacted.json").write_text("{nope")
        rep = fsck_index(spark, path)
        assert not rep["ok"]
        assert any(f["check"] == "manifest_corrupt"
                   for f in rep["findings"])

    def test_orphan_generation_swept_after_compact(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators import dedup_index as di
        from cdc_data_pipeline_spark.operators.lsm import (
            compact_index, fsck_index)

        path, _ = self._build(spark, tmp_path)
        # forge a crashed maintainer's staged generation above the
        # published ordinal
        (tmp_path / "lsh" / "base-0000000099-feed").mkdir()
        rep = fsck_index(spark, path)
        assert rep["ok"]
        assert any(f["check"] == "generation_orphan"
                   for f in rep["findings"])
        # a delta so the compaction has something to fold
        more = spark.createDataFrame([(200, "eta theta " * 5)],
                                     "doc_id long, text string")
        di.append_lsh_index(spark, path, more)
        compact_index(spark, path)
        compact_index(spark, path)   # second publish completes the GC
        rep2 = fsck_index(spark, path)
        assert rep2["ok"]
        assert not any(f["check"] == "generation_orphan"
                       for f in rep2["findings"])

    def test_not_an_index(self, spark, tmp_path):
        from cdc_data_pipeline_spark.operators.lsm import fsck_index

        (tmp_path / "junk").mkdir()
        rep = fsck_index(spark, str(tmp_path / "junk"))
        assert not rep["ok"]
        rep2 = fsck_index(spark, str(tmp_path / "absent"))
        assert not rep2["ok"]

    def test_index_fsck_cli(self, spark, tmp_path):
        path, _ = self._build(spark, tmp_path)
        ok = subprocess.run(
            [sys.executable, "-m", "cdc_data_pipeline_spark",
             "index-fsck", "--path", path],
            capture_output=True, text=True, cwd="/root/repo")
        assert ok.returncode == 0, ok.stderr[-2000:]
        out = json.loads(ok.stdout.strip().splitlines()[-1])
        assert out["ok"] and out["kind"] == "lsh"
        (tmp_path / "lsh" / "BASE").write_text("base-0000000042-dead")
        bad = subprocess.run(
            [sys.executable, "-m", "cdc_data_pipeline_spark",
             "index-fsck", "--path", path],
            capture_output=True, text=True, cwd="/root/repo")
        assert bad.returncode == 1


class TestScd2DeepFsck:
    def test_duplicate_open_versions_detected(self, spark, tmp_path):
        """Deep fsck flags the multiple-open-versions corruption the
        r10 on_duplicate_keys guard prevents (legacy/allow writers)."""
        from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed

        tgt = str(tmp_path / "snap")
        dirty = spark.createDataFrame(
            [(1, "a"), (1, "a2"), (2, "b")], "k long, v string")
        scd2_bucketed(spark, tgt, dirty, ["k"], ["v"],
                      "2024-01-01 00:00:00", n_buckets=2,
                      on_duplicate_keys="allow")
        rep = fsck_table(spark, tgt, deep=True)
        assert "scd2_duplicate_open" in _checks(rep, "error"), \
            rep["findings"]
        # a clean snapshot passes the same check
        clean = str(tmp_path / "clean")
        scd2_bucketed(spark, clean,
                      spark.createDataFrame([(1, "a"), (2, "b")],
                                            "k long, v string"),
                      ["k"], ["v"], "2024-01-01 00:00:00", n_buckets=2)
        assert fsck_table(spark, clean, deep=True)["ok"]
