"""Round-9 recovery-surface fixes: feed marooning, staging leaks,
anchor re-cut, legacy mart strands, safe-by-default vacuum, and the
writer-race reconciliation path (ADVICE r8 + VERDICT r8 #4/#5).
"""

import shutil

import pytest

from cdc_data_pipeline_spark.operators.incremental import (
    _list_anchor_seqs, create_anchor, read_changes, reconcile_changes,
    recover_swap, recover_table, table_at, upsert_bucketed,
    vacuum_changes)


def _mk(spark, rows, schema="k long, v string, ts long, is_del boolean"):
    return spark.createDataFrame(rows, schema)


def _rows(spark, path):
    return {(r["k"], r["v"]) for r in
            spark.read.parquet(path).select("k", "v").collect()}


def _seed(spark, tgt, n=8):
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(i, f"v{i}", 10, False) for i in range(n)]),
                    ["k"], "ts", n_buckets=2, delete_col="is_del",
                    emit_changes=True)


def test_recover_table_pulls_marooned_feed_from_rewrite_dir(spark,
                                                            tmp_path):
    """ADVICE-r9 medium: a crash inside _recover_rewrite between
    rename(old -> table) and its feed pull leaves the table LIVE with
    its feed (commits, _latest, anchors) marooned in
    <table>.__rewrite__/_changes. recover_table's completed-rewrite
    sweep must pull the feed back before deleting the staging dir —
    deleting it wholesale would restart the feed at seq 0."""
    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt)
    create_anchor(spark, tgt)
    want = _rows(spark, tgt)

    # forge the crash window: table live, feed marooned in .__rewrite__
    (tmp_path / "tbl.__rewrite__").mkdir()
    shutil.move(tgt + "/_changes", str(tmp_path / "tbl.__rewrite__"
                                       / "_changes"))
    assert recover_table(spark, tgt) == [tgt + "/_changes"]
    assert _rows(spark, tgt) == want
    assert read_changes(spark, tgt).count() == 8      # feed intact
    assert _list_anchor_seqs(spark, tgt) == [0]       # anchors too
    # the staging dir itself was swept
    assert not (tmp_path / "tbl.__rewrite__").exists()

    # the next merge continues the SAME feed, not a new one at seq 0
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert read_changes(spark, tgt, since_seq=0).count() == 1

    # when the table has its OWN feed, a leftover staging feed is
    # completed-rewrite garbage and must NOT clobber it
    (tmp_path / "tbl.__rewrite__" / "_changes").mkdir(parents=True)
    (tmp_path / "tbl.__rewrite__" / "_changes" / "junk").write_text("x")
    assert recover_table(spark, tgt) == []
    assert read_changes(spark, tgt, since_seq=0).count() == 1
    assert not (tmp_path / "tbl.__rewrite__").exists()


def test_recover_table_sweeps_crashed_merge_staging(spark, tmp_path):
    """ADVICE-r9 low: a crash mid-staging-write leaks the
    nonce-suffixed <table>.__staging__-<hex> sibling forever (it is
    never reused — the nonce exists so racing writers cannot collide).
    recover_table collects it, like create_anchor's staging sweep."""
    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt)
    want = _rows(spark, tgt)

    leak1 = tmp_path / "tbl.__staging__-deadbeef0001"
    leak2 = tmp_path / "tbl.__staging__-deadbeef0002"
    for d in (leak1, leak2):
        (d / "__kb=0").mkdir(parents=True)
        (d / "__kb=0" / "part-junk.parquet").write_bytes(b"\x00")
    assert recover_table(spark, tgt) == []
    assert not leak1.exists() and not leak2.exists()
    assert _rows(spark, tgt) == want

    # every merge runs the sweep implicitly
    (leak1 / "__kb=0").mkdir(parents=True)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert not leak1.exists()


def test_create_anchor_force_recuts_suspect_anchor(spark, tmp_path):
    """ADVICE-r9 low: an anchor cut in the crash window between feed
    commit and bucket swap labels PRE-merge state with the POST-merge
    seq, and the idempotent early-return pins the mislabel forever.
    force=True re-cuts it from the table's current state."""
    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt, n=4)
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x1", 20, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert create_anchor(spark, tgt) == 1

    # corrupt the anchor the way the mislabel hazard would: its
    # content is stale relative to the table at seq 1
    anchor_dir = tmp_path / "tbl" / "_changes" / "anchor-0000000001"
    shutil.rmtree(str(anchor_dir))
    seq0_commit = (tmp_path / "tbl" / "_changes" /
                   ("commit-0000000000-"
                    + _first_commit_suffix(tmp_path / "tbl")))
    shutil.copytree(str(seq0_commit), str(anchor_dir))

    # idempotent path pins the wrong snapshot ...
    assert create_anchor(spark, tgt) == 1
    bad = {(r["k"], r["v"]) for r in
           spark.read.parquet(str(anchor_dir)).select("k", "v").collect()}
    assert (1, "x1") not in bad
    # ... force re-cuts it from the live table
    assert create_anchor(spark, tgt, force=True) == 1
    good = {(r["k"], r["v"]) for r in
            spark.read.parquet(str(anchor_dir)).select("k", "v")
            .collect()}
    assert good == _rows(spark, tgt)
    assert table_at(spark, tgt, 1).count() == spark.read.parquet(tgt).count()


def _first_commit_suffix(tbl_path) -> str:
    for p in (tbl_path / "_changes").iterdir():
        if p.name.startswith("commit-0000000000-"):
            return p.name[len("commit-0000000000-"):]
    raise AssertionError("no seq-0 commit")


def test_recover_swap_heals_legacy_visible_mart_strand(spark, tmp_path):
    """ADVICE-r9 low: a mart stranded by a PRE-upgrade crash carries
    the old VISIBLE <mart>.__old__ strand name; recover_swap must heal
    it (and sweep it as garbage when the mart is live), so the IVM
    fold never reads a stranded mart as 'no mart, watermark -1' and
    silently resets every accumulated group sum."""
    mart = str(tmp_path / "mart")
    df = spark.createDataFrame([("a", 30.0, 2)],
                               "grp string, delta_amt double, "
                               "delta_count long")
    from cdc_data_pipeline_spark.operators.incremental import (
        read_mart_seq, write_mart_merged)

    write_mart_merged(df, mart, applied_seq=3)

    # pre-upgrade crash window: visible strand, nothing live
    shutil.move(mart, mart + ".__old__")
    assert recover_swap(spark, mart) is True
    assert read_mart_seq(spark, mart) == 3
    assert spark.read.parquet(mart).count() == 1

    # completed-swap leftover under the legacy name: swept, not healed
    shutil.copytree(mart, mart + ".__old__")
    assert recover_swap(spark, mart) is False
    assert not (tmp_path / "mart.__old__").exists()
    assert read_mart_seq(spark, mart) == 3


def test_vacuum_auto_anchors_by_default(spark, tmp_path):
    """VERDICT-r8 #5: vacuum_changes below the oldest anchor used to
    silently forfeit time travel and replica bootstrap. The safe path
    is now the default: when the prune is not covered by an anchor,
    one is cut at the newest seq first — vacuum-then-table_at
    succeeds; the destructive prune needs force=True."""
    from cdc_data_pipeline_spark.operators.incremental import (
        bootstrap_replica)

    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt, n=6)                                        # seq 0
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x1", 20, False),
                                            (2, None, 20, True)]),
                    ["k"], "ts", delete_col="is_del",
                    emit_changes=True)                            # seq 1
    upsert_bucketed(spark, tgt, _mk(spark, [(9, "v9", 30, False)]),
                    ["k"], "ts", delete_col="is_del",
                    emit_changes=True)                            # seq 2
    assert _list_anchor_seqs(spark, tgt) == []

    assert vacuum_changes(spark, tgt, before_seq=1) == 2
    assert _list_anchor_seqs(spark, tgt) == [2]    # cut automatically
    # time travel at/above the anchor survives the prune
    assert {(r["k"], r["v"]) for r in table_at(spark, tgt, 2)
            .select("k", "v").collect()} == _rows(spark, tgt)
    # replica bootstrap survives too
    rep = str(tmp_path / "rep")
    assert bootstrap_replica(spark, tgt, rep, n_buckets=2) == 2
    assert _rows(spark, rep) == _rows(spark, tgt)

    # already-covered prunes cut no second anchor
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x2", 40, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    assert vacuum_changes(spark, tgt, before_seq=2) == 1
    assert _list_anchor_seqs(spark, tgt) == [2]


def test_reconcile_changes_repairs_writer_race(spark, tmp_path):
    """VERDICT-r8 #4: duplicate sequence numbers brick every feed read
    until manual surgery. reconcile_changes keeps the first-landed
    commit per seq, quarantines the losers under _changes/_conflict,
    repairs _latest — after which the feed reads green and a replica
    converges on the surviving history."""
    import json
    import os

    from cdc_data_pipeline_spark.operators.incremental import (
        apply_changes)

    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt, n=4)                                        # seq 0
    upsert_bucketed(spark, tgt, _mk(spark, [(1, "x1", 20, False)]),
                    ["k"], "ts", delete_col="is_del",
                    emit_changes=True)                            # seq 1
    # forge the race: the losing writer's commit lands at the same seq
    # with a different digest, LATER mtime
    winner = None
    for p in (tmp_path / "tbl" / "_changes").iterdir():
        if p.name.startswith("commit-0000000001-"):
            winner = p
    loser = winner.parent / "commit-0000000001-feedbeef-1"
    shutil.copytree(str(winner), str(loser))
    now = winner.stat().st_mtime
    os.utime(str(loser), (now + 100, now + 100))

    with pytest.raises(RuntimeError, match="duplicate change-feed"):
        read_changes(spark, tgt)

    out = reconcile_changes(spark, tgt)
    assert out == {"quarantined": ["commit-0000000001-feedbeef-1"],
                   "latest_seq": 1, "generation": 1}
    # feed reads green; the winner survived, the loser is quarantined
    # (kept for audit), and _latest points at the true tail
    feed = read_changes(spark, tgt)
    assert feed.filter("_seq = 1").count() == 1
    assert (tmp_path / "tbl" / "_changes" / "_conflict"
            / "commit-0000000001-feedbeef-1").exists()
    ptr = json.loads((tmp_path / "tbl" / "_changes" / "_latest")
                     .read_text())
    assert ptr["seq"] == 1

    # the next merge mints seq 2, not another duplicate
    upsert_bucketed(spark, tgt, _mk(spark, [(2, "y", 30, False)]),
                    ["k"], "ts", delete_col="is_del", emit_changes=True)
    # a replica built from the reconciled feed converges
    rep = str(tmp_path / "rep")
    apply_changes(spark, read_changes(spark, tgt), rep, ["k"],
                  n_buckets=2)
    assert _rows(spark, rep) == _rows(spark, tgt)
    # idempotent when healthy
    assert reconcile_changes(spark, tgt)["quarantined"] == []


def test_reconcile_changes_survives_crash_at_every_rename(
        spark, tmp_path, monkeypatch):
    """The repair tool itself must be crash-safe: kill
    reconcile_changes at each of its FS renames (quarantine moves),
    re-run it, and the feed must still end green with the same
    surviving commit — a half-finished reconciliation must never need
    a second, different repair procedure."""
    import shutil as sh

    from cdc_data_pipeline_spark.sources import fsutil

    def build(root):
        tgt = str(root / "tbl")
        _seed(spark, tgt, n=4)                                    # seq 0
        upsert_bucketed(spark, tgt, _mk(spark, [(1, "x1", 20, False)]),
                        ["k"], "ts", delete_col="is_del",
                        emit_changes=True)                        # seq 1
        changes = root / "tbl" / "_changes"
        for p in changes.iterdir():
            if p.name.startswith("commit-0000000001-"):
                # two losers -> two quarantine renames to kill at
                sh.copytree(str(p), str(changes
                                        / "commit-0000000001-zzz1-1"))
                sh.copytree(str(p), str(changes
                                        / "commit-0000000001-zzz2-1"))
        return tgt

    class Boom(Exception):
        pass

    state = {"n": 0, "fail_at": None}
    real_rename = fsutil.rename

    def rename(s, src, dst):
        state["n"] += 1
        if state["fail_at"] is not None and state["n"] == state["fail_at"]:
            raise Boom()
        real_rename(s, src, dst)

    monkeypatch.setattr(fsutil, "rename", rename)

    # golden: count reconcile's OWN renames (build's don't count)
    tgt = build(tmp_path / "g")
    state["n"] = 0
    gold = reconcile_changes(spark, tgt)
    n_renames = state["n"]
    assert n_renames >= 2 and len(gold["quarantined"]) == 2

    for k in range(1, n_renames + 1):
        root = tmp_path / f"k{k}"
        root.mkdir()
        state["n"], state["fail_at"] = 0, None
        tgt = build(root)
        state["n"], state["fail_at"] = 0, k
        with pytest.raises(Boom):
            reconcile_changes(spark, tgt)
        state["fail_at"] = None
        out = reconcile_changes(spark, tgt)             # replay repairs
        feed = read_changes(spark, tgt)
        assert feed.filter("_seq = 1").count() == 1, f"K={k}"
        # across crash + replay, both losers ended quarantined
        qdir = root / "tbl" / "_changes" / "_conflict"
        assert sorted(p.name for p in qdir.iterdir()) == [
            "commit-0000000001-zzz1-1", "commit-0000000001-zzz2-1"], \
            f"K={k}: {out}"


def test_streaming_sink_bounds_feed_with_auto_anchor(spark, tmp_path):
    """maybe_vacuum_changes via the streaming sink's
    vacuum_keep_commits: a long-running stream's feed stays bounded
    (newest N commits + bounded anchors) while table_at(newest) and a
    from-scratch bootstrap_replica keep working — the 24/7 ops story
    (merge O(1) replay + bounded listing + auto-anchor) in one knob."""
    from cdc_data_pipeline_spark.operators.incremental import (
        _list_change_commits, bootstrap_replica)
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_parquet)

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    # 6 single-row files -> 6 micro-batches with maxFilesPerTrigger=1
    for i in range(6):
        spark.createDataFrame([(i % 3, f"v{i}", i)],
                              "k long, v string, ts long") \
            .coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("k long, v string, ts long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_upsert_to_parquet(
        stream, tbl, ["k"], "ts", str(tmp_path / "ck"), n_buckets=2,
        emit_changes=True, vacuum_keep_commits=2)
    q.awaitTermination(180)

    commits = _list_change_commits(spark, tbl)
    assert len(commits) == 2                      # bounded, newest kept
    anchors = _list_anchor_seqs(spark, tbl)
    assert 1 <= len(anchors) <= 2                 # anchors bounded too
    newest = int(commits[-1].split("-", 2)[1])
    # time travel at the newest seq survives every auto-vacuum
    live = {(r["k"], r["v"]) for r in spark.read.parquet(tbl)
            .select("k", "v").collect()}
    got = {(r["k"], r["v"]) for r in table_at(spark, tbl, newest)
           .select("k", "v").collect()}
    assert got == live == {(0, "v3"), (1, "v4"), (2, "v5")}
    # a NEW replica bootstraps from the anchor + surviving tail
    rep = str(tmp_path / "rep")
    bootstrap_replica(spark, tbl, rep, n_buckets=2)
    assert {(r["k"], r["v"]) for r in spark.read.parquet(rep)
            .select("k", "v").collect()} == live
