"""Versioned-table publish protocol: atomicity, time travel, rollback,
vacuum safety."""

from __future__ import annotations

import os

import pytest

from conftest import MOCKFS_PARAM
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.sources.versioned import (
    current_version,
    list_versions,
    publish_pointer,
    publish_version,
    read_versioned,
    vacuum_versions,
)


def _df(spark, n, tag):
    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def test_publish_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert publish_version(_df(spark, 3, "a"), t) == 1
    assert publish_version(_df(spark, 5, "b"), t) == 2
    assert current_version(t) == 2
    assert read_versioned(spark, t).count() == 5
    assert read_versioned(spark, t, version=1).count() == 3
    assert [r["tag"] for r in read_versioned(spark, t, 1).limit(1).collect()] == ["a"]


def test_rollback_via_pointer(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "a"), t)
    publish_version(_df(spark, 5, "b"), t)
    publish_pointer(t, 1)  # instant rollback, no data rewrite
    assert read_versioned(spark, t).count() == 3
    assert list_versions(t) == [1, 2]


def test_reader_never_sees_partial_publish(spark, tmp_path):
    """A version dir that exists but is not yet pointed at is invisible
    to default reads (the crash-mid-publish state)."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "a"), t)
    # simulate an in-flight publish: dir written, pointer NOT moved
    _df(spark, 9, "partial").write.parquet(os.path.join(t, "v=2"))
    assert current_version(t) == 1
    assert read_versioned(spark, t).count() == 3


def test_vacuum_keeps_published_and_newer(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        publish_version(_df(spark, i + 1, f"t{i}"), t)
    publish_pointer(t, 2)  # rolled back; v3/v4 newer than pointer
    removed = vacuum_versions(t, keep_last=1)
    # v1 dropped; v2 (published), v3, v4 (newer than pointer) kept
    assert removed == [1]
    assert list_versions(t) == [2, 3, 4]
    assert read_versioned(spark, t).count() == 2


def test_pointer_update_is_atomic_file_replace(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 2, "a"), t)
    # no temp pointer litter after publish
    assert not [f for f in os.listdir(t) if f.startswith("._LATEST")]


def test_registry_materialize_publishes_versions(spark, tmp_path):
    """dbt-build equivalent: every model lands as an atomic table
    version; re-running publishes the next version, previous stays
    readable (rollback-able)."""
    from cdc_data_pipeline_spark.plans.registry import ModelRegistry, materialize

    reg = ModelRegistry()
    reg.add_source("src", _df(spark, 10, "s"))

    @reg.model("stg", deps=("src",))
    def stg(src):
        return src.filter(F.col("id") % 2 == 0)

    @reg.model("mart", deps=("stg",))
    def mart(stg):
        return stg.agg(F.count(F.lit(1)).alias("n"))

    base = str(tmp_path / "wh")
    v1 = materialize(reg, spark, base, sources=("src",))
    assert v1 == {"stg": 1, "mart": 1}
    assert read_versioned(spark, f"{base}/mart").first()["n"] == 5

    v2 = materialize(reg, spark, base, sources=("src",))
    assert v2 == {"stg": 2, "mart": 2}
    assert read_versioned(spark, f"{base}/mart", version=1).first()["n"] == 5

    # run-level manifest: one audit row per (run, model) publish, with
    # footer-derived row counts and a shared run_id per materialize call
    from cdc_data_pipeline_spark.sources.versioned import read_runs

    runs = read_runs(spark, base)
    recs = [r.asDict() for r in runs.collect()]
    assert len(recs) == 4  # 2 materialize calls x 2 models
    by_mv = {(r["model"], r["version"]): r for r in recs}
    assert by_mv[("stg", 1)]["rows"] == 5 and by_mv[("mart", 1)]["rows"] == 1
    assert by_mv[("stg", 2)]["rows"] == 5
    assert all(r["duration_sec"] >= 0 for r in recs)
    assert len({r["run_id"] for r in recs}) == 2
    assert by_mv[("stg", 1)]["run_id"] == by_mv[("mart", 1)]["run_id"]


def test_stream_aggregate_publishes_versions(spark, tmp_path):
    """Each micro-batch of a complete-mode aggregate lands as its own
    atomic version; the last one is the final aggregate state."""
    from cdc_data_pipeline_spark.streaming.cdc import stream_aggregate_to_versioned

    src = tmp_path / "vs_src"
    src.mkdir()
    schema = "k long, v double"
    spark.createDataFrame([(1, 1.0), (2, 2.0)], schema).coalesce(1) \
        .write.parquet(str(src / "b1"))
    spark.createDataFrame([(1, 10.0)], schema).coalesce(1) \
        .write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    agg = stream.groupBy("k").agg(F.sum("v").alias("total"))
    t = str(tmp_path / "vs_tbl")
    q = stream_aggregate_to_versioned(agg, t, str(tmp_path / "vs_ckpt"))
    q.awaitTermination(120)

    assert len(list_versions(t)) >= 1
    final = {r["k"]: r["total"] for r in read_versioned(spark, t).collect()}
    assert final == {1: 11.0, 2: 2.0}


def test_cli_build_materializes_star_schema(tmp_path):
    import json
    import subprocess
    import sys

    base = str(tmp_path / "wh")
    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "build",
         "--sf-dir", "/root/testdata/sf0.001", "--base-path", base,
         "--select", "+fact_savings_transaction"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    published = json.loads(out.stdout.strip().splitlines()[-1])
    assert published.get("fact_savings_transaction") == 1
    assert os.path.isdir(f"{base}/fact_savings_transaction/v=1")


def test_concurrent_publish_collision_is_safe(spark, tmp_path):
    """Racing publishers cannot corrupt: a competitor's already-written
    directory is skipped (next version = max+1 at publish time), and a
    true same-version collision fails on mode=error BEFORE the pointer
    moves."""
    import pytest

    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 2, "a"), t)
    # competitor wrote v=2 but has not repointed yet: our publish skips
    # to v=3 and both directories stay intact
    _df(spark, 3, "other").write.parquet(os.path.join(t, "v=2"))
    assert publish_version(_df(spark, 4, "b"), t) == 3
    assert current_version(t) == 3 and read_versioned(spark, t).count() == 4
    assert read_versioned(spark, t, version=2).count() == 3
    # the true same-instant collision: writing an existing version dir
    # raises (mode=error) and the pointer is untouched
    with pytest.raises(Exception):
        _df(spark, 9, "loser").write.mode("error").parquet(os.path.join(t, "v=3"))
    assert current_version(t) == 3 and read_versioned(spark, t).count() == 4


def test_materialize_checks_gate_the_publish(spark, tmp_path):
    """dbt-build semantics with a stronger guarantee: a failing quality
    check means that model's version is NEVER published — downstream
    readers keep the last good version."""
    import pytest

    from cdc_data_pipeline_spark.operators.quality import (
        DataQualityError, expect_not_null, expect_unique)
    from cdc_data_pipeline_spark.plans.registry import ModelRegistry, materialize

    def build_reg(rows):
        reg = ModelRegistry()
        reg.add_source("src", spark.createDataFrame(rows, "k long, v string"))

        @reg.model("stg", deps=("src",))
        def stg(src):
            return src

        return reg

    base = str(tmp_path / "wh")
    ok = build_reg([(1, "a"), (2, "b")])
    checks = {"stg": [lambda df: expect_unique(df, ["k"]),
                      lambda df: expect_not_null(df, ["v"])]}
    assert materialize(ok, spark, base, sources=("src",), checks=checks) == {"stg": 1}

    bad = build_reg([(1, "a"), (1, "b")])       # duplicate key
    with pytest.raises(DataQualityError):
        materialize(bad, spark, base, sources=("src",), checks=checks)
    # v2 was never published: readers still see the good v1
    assert read_versioned(spark, f"{base}/stg").count() == 2
    assert list_versions(f"{base}/stg") == [1]


@pytest.mark.parametrize("scheme", ["file://", MOCKFS_PARAM])
def test_versioned_table_under_uri_fs_root(spark, tmp_path, scheme):
    """r3 verdict item #5 completion (r7: + mockfs://, a REMOTE-
    resolving scheme): the versioned-table layer must run the full
    publish / time-travel / rollback / vacuum / run-audit cycle
    against a scheme-qualified root, routing every metadata op through
    the Hadoop FileSystem API instead of os.path. Under mockfs:// the
    pointer publish takes the stream-write branch and the row count
    takes the Spark fallback — the object-store shapes."""
    from cdc_data_pipeline_spark.sources.versioned import (
        append_run_record, published_row_count, read_runs)

    t = scheme + str(tmp_path / "uri_wh" / "tbl")
    assert publish_version(_df(spark, 3, "a"), t) == 1
    assert publish_version(_df(spark, 5, "b"), t) == 2
    assert publish_version(_df(spark, 7, "c"), t) == 3
    assert current_version(t) == 3
    assert read_versioned(spark, t).count() == 7
    assert read_versioned(spark, t, version=1).count() == 3
    # rollback
    publish_pointer(t, 2)
    assert current_version(t) == 2
    assert read_versioned(spark, t).count() == 5
    # vacuum never drops the published version or newer ones
    removed = vacuum_versions(t, keep_last=1)
    assert removed == [1]
    assert list_versions(t) == [2, 3]
    assert read_versioned(spark, t).count() == 5
    # footer-only row count under file://; Spark-count fallback
    # under the remote-resolving mockfs://
    assert published_row_count(t, 2) == 5
    # run-audit record lands and reads back under the URI root
    base = scheme + str(tmp_path / "uri_wh")
    append_run_record(base, {"run_id": "r1", "model": "tbl",
                             "version": 2, "rows": 5})
    runs = read_runs(spark, base)
    assert runs.count() == 1
    assert runs.first()["model"] == "tbl"


def test_versioned_roundtrip_under_file_scheme(spark, tmp_path):
    """The full publish/read/time-travel/rollback/vacuum cycle under
    an explicit ``file://`` root: every metadata op resolves through
    the Hadoop FileSystem instead of ``os``, and the pointer publish
    still takes the atomic os.replace path (fsutil.publish_text
    detects the local FS behind the scheme)."""
    bare = str(tmp_path / "tbl")
    t = "file://" + bare
    assert publish_version(_df(spark, 3, "a"), t) == 1
    assert publish_version(_df(spark, 5, "b"), t) == 2
    assert current_version(t) == 2
    assert read_versioned(spark, t).count() == 5
    assert read_versioned(spark, t, version=1).count() == 3
    publish_pointer(t, 1)
    assert read_versioned(spark, t).count() == 3
    # scheme and bare views agree: same files on disk
    assert current_version(bare) == 1
    assert list_versions(t) == [1, 2] == list_versions(bare)
    publish_pointer(t, 2)
    assert vacuum_versions(t, keep_last=1) == [1]
    assert list_versions(bare) == [2]
    assert read_versioned(spark, t).count() == 5
    # no pointer-staging litter from the atomic publishes
    assert not [f for f in os.listdir(bare)
                if f.startswith((".ptr_", "._LATEST"))]


# ------------------------------------------------------ fsck_versioned

def _mtimes(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def _checks(rep, severity=None):
    return {f["check"] for f in rep["findings"]
            if severity is None or f["severity"] == severity}


class TestFsckVersioned:
    """The versioned-table auditor: every forged on-disk state becomes
    a finding (never an exception), fsck never mutates, and the
    matching repair brings it back to ok — the same cross-check
    discipline test_fsck.py applies to fsck_table/fsck_index."""

    def test_clean_lifecycle_is_ok(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import (
            append_run_record, fsck_versioned)

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        publish_version(_df(spark, 5, "b"), t)
        publish_pointer(t, 1)                       # rollback is legal
        rep = fsck_versioned(spark, t, deep=True)
        # v2 above the pointer is a WARN (dead fork), not an error
        assert rep["ok"], rep["findings"]
        assert "unpublished_versions" in _checks(rep, "warn")
        publish_pointer(t, 2)
        rep = fsck_versioned(spark, t, deep=True)
        assert rep["ok"] and rep["warnings"] == 0, rep["findings"]
        append_run_record(str(tmp_path), {
            "run_id": "r1", "model": "tbl", "version": 2, "rows": 5,
            "duration_sec": 0.1, "published_at": None})
        assert fsck_versioned(spark, t, deep=True)["ok"]

    def test_missing_and_empty(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        rep = fsck_versioned(spark, str(tmp_path / "nope"))
        assert not rep["ok"] and _checks(rep) == {"table_missing"}
        (tmp_path / "empty").mkdir()
        rep = fsck_versioned(spark, str(tmp_path / "empty"))
        assert rep["ok"] and "empty" in _checks(rep, "info")

    def test_corrupt_pointer_is_finding_not_crash(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        ptr = tmp_path / "tbl" / "_LATEST"
        for payload in ("not-an-int", "", "1.5"):
            ptr.write_text(payload)
            rep = fsck_versioned(spark, t)
            assert "pointer_corrupt" in _checks(rep, "error"), \
                (payload, rep["findings"])
        ptr.write_text("1")
        assert fsck_versioned(spark, t)["ok"]

    def test_dangling_pointer_and_no_pointer(self, spark, tmp_path):
        import shutil

        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        publish_version(_df(spark, 5, "b"), t)
        shutil.rmtree(os.path.join(t, "v=2"))       # out-of-band delete
        rep = fsck_versioned(spark, t)
        assert "pointer_dangling" in _checks(rep, "error")
        publish_pointer(t, 1)                        # the repair
        assert fsck_versioned(spark, t, deep=True)["ok"]
        os.remove(os.path.join(t, "_LATEST"))
        rep = fsck_versioned(spark, t)
        assert "no_pointer" in _checks(rep, "error")

    def test_crash_debris_is_warn_and_reclaimable(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        # forged crashed publish: a partial (no _SUCCESS) dir above
        # the pointer, plus a stale pointer tmp file
        os.makedirs(os.path.join(t, "v=2"))
        with open(os.path.join(t, "v=2", "part-0.parquet"), "wb") as fh:
            fh.write(b"\x00torn")
        with open(os.path.join(t, "._LATEST.tmp"), "w") as fh:
            fh.write("2")
        rep = fsck_versioned(spark, t, deep=True)
        assert rep["ok"], rep["findings"]            # warnings only
        assert {"unpublished_versions", "pointer_staging",
                "orphan_incomplete"} <= _checks(rep, "warn")
        # the reader is untouched by the debris
        assert read_versioned(spark, t).count() == 3
        # reclaim: single-writer sweep, then clean
        vacuum_versions(t, keep_last=2, sweep_unpublished=True)
        rep = fsck_versioned(spark, t, deep=True)
        assert rep["ok"] and rep["warnings"] == 0, rep["findings"]

    def test_sweep_reclaims_torn_dirs_with_no_pointer(self, spark,
                                                      tmp_path):
        """ADVICE r11: a table whose publisher crashed before its FIRST
        pointer publish has torn dirs but no pointer — the single-writer
        sweep must still reclaim them (nothing is published, so every
        incomplete dir is debris by the caller's declaration); the
        default mode must keep treating them as not-ours."""
        import os

        from cdc_data_pipeline_spark.sources.versioned import (
            list_versions, vacuum_versions)

        t = str(tmp_path / "tbl")
        os.makedirs(os.path.join(t, "v=1"))
        with open(os.path.join(t, "v=1", "part-0.parquet"), "wb") as fh:
            fh.write(b"\x00torn")        # no _SUCCESS, no _LATEST
        vacuum_versions(t, keep_last=2)                  # default: safe
        assert list_versions(t) == [1]
        vacuum_versions(t, keep_last=2, sweep_unpublished=True)
        assert list_versions(t) == []

    def test_published_partial_is_error(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        os.remove(os.path.join(t, "v=1", "_SUCCESS"))  # forge torn publish
        rep = fsck_versioned(spark, t, deep=True)
        assert "version_unreadable" in _checks(rep, "error")

    def test_fsck_is_read_only(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        os.makedirs(os.path.join(t, "v=2"))          # debris
        (tmp_path / "tbl" / "junk.txt").write_text("x")
        before = _mtimes(str(tmp_path))
        rep = fsck_versioned(spark, t, deep=True)
        assert "foreign_entry" in _checks(rep, "warn")
        assert _mtimes(str(tmp_path)) == before
        assert os.path.isdir(os.path.join(t, "v=2"))

    def test_publish_reclaims_incomplete_orphan(self, spark, tmp_path):
        """Heal-on-publish is OPT-IN (ADVICE r10: a torn dir and a
        live competitor's half-written dir are indistinguishable, so
        only a declared single writer may sweep): the DEFAULT publish
        mints PAST a torn (no _SUCCESS) dir, deleting nothing;
        ``heal_crashed=True`` sweeps it and REUSES its id; a complete
        unpointed dir (racing competitor / rolled-back fork) is
        skipped in both modes, never deleted."""
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        os.makedirs(os.path.join(t, "v=2"))          # torn write
        # default: race-safe — the torn dir is not ours to delete;
        # the new publish skips past it
        assert publish_version(_df(spark, 5, "b"), t) == 3
        assert read_versioned(spark, t).count() == 5
        assert os.path.isdir(os.path.join(t, "v=2"))  # untouched
        # the stranded torn dir (now below the pointer) is a WARN,
        # never an error — it was never pointer-visible — and the
        # declared single-writer vacuum reclaims it
        rep = fsck_versioned(spark, t, deep=True)
        assert rep["ok"], rep["findings"]
        assert "incomplete_version" in _checks(rep, "warn")
        vacuum_versions(t, keep_last=3, sweep_unpublished=True)
        assert list_versions(t) == [1, 3]
        assert fsck_versioned(spark, t, deep=True)["warnings"] == 0
        # heal_crashed: the declared single writer reclaims its own
        # crashed id
        os.makedirs(os.path.join(t, "v=4"))          # torn write
        assert publish_version(_df(spark, 6, "h"), t,
                               heal_crashed=True) == 4
        assert read_versioned(spark, t).count() == 6
        # complete fork above the pointer survives in both modes
        publish_pointer(t, 1)
        assert publish_version(_df(spark, 7, "c"), t,
                               heal_crashed=True) == 5
        assert list_versions(t) == [1, 3, 4, 5]
        assert read_versioned(spark, t, version=4).count() == 6

    def test_default_vacuum_is_safe_beside_live_publisher(
            self, spark, tmp_path):
        """Default vacuum must not sweep a concurrent publisher's
        in-flight state: neither a half-written version dir nor the
        pointer tmp file mid-os.replace (ADVICE r10). The declared
        single-writer sweep reclaims both."""
        t = str(tmp_path / "tbl")
        for i in range(4):
            publish_version(_df(spark, i + 2, f"t{i}"), t)
        os.makedirs(os.path.join(t, "v=9"))           # in-flight dir
        with open(os.path.join(t, "._LATEST.tmp"), "w") as fh:
            fh.write("9")                             # mid-replace tmp
        removed = vacuum_versions(t, keep_last=2)
        assert removed == [1, 2, 3]
        assert os.path.isdir(os.path.join(t, "v=9"))
        assert os.path.exists(os.path.join(t, "._LATEST.tmp"))
        vacuum_versions(t, keep_last=2, sweep_unpublished=True)
        assert not os.path.isdir(os.path.join(t, "v=9"))
        assert not os.path.exists(os.path.join(t, "._LATEST.tmp"))
        assert current_version(t) == 4

    def test_pointer_to_uncommitted_dir_is_error(self, spark, tmp_path):
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        t = str(tmp_path / "tbl")
        publish_version(_df(spark, 3, "a"), t)
        os.remove(os.path.join(t, "v=1", "_SUCCESS"))
        rep = fsck_versioned(spark, t)     # structural, no deep scan
        assert "pointer_uncommitted" in _checks(rep, "error")
