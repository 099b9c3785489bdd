"""RACING writers against one bucketed CDC table — real threads, not
forged states (VERDICT r9 #4) — plus the reconcile re-convergence
guard (VERDICT r9 #7).

The LSM index families have had true racing-compaction tests since
round 7 (`test_lsm_concurrency.py`); the table family's write lock was
only ever tested serialized, and the duplicate-seq writer race was
forged by hand (`test_feed_recovery.py`). Here two concurrent
``upsert_bucketed`` calls race for real:

- WITH the lock: they must serialize — both batches land, the feed is
  dense and duplicate-free, deep fsck green.
- WITHOUT the lock: a barrier inside ``fsutil.rename`` releases both
  writers' feed-commit renames together (the exact interleaving the
  unlocked protocol documents as unsafe), deterministically minting a
  duplicate sequence. Then the full operator runbook must restore
  everything: ``fsck_table`` detects, ``reconcile_changes`` restores
  feed readability and BUMPS THE FEED GENERATION, a consumer that
  ingested the quarantined commit is REFUSED
  (``StaleFeedConsumerError``) instead of silently compounding
  unvouched state, and ``create_anchor`` + ``bootstrap_replica``
  re-converges it — after which deep fsck is green again and
  incremental ``apply_changes`` resumes.
"""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import (
    StaleFeedConsumerError,
    apply_changes,
    bootstrap_replica,
    bucket_of,
    check_feed_vouched,
    create_anchor,
    fsck_table,
    read_changes,
    read_feed_generation,
    read_replica_generation,
    reconcile_changes,
    upsert_bucketed,
)
from cdc_data_pipeline_spark.sources import fsutil

SCHEMA = "k long, v string, ts long"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, tgt):
    upsert_bucketed(spark, tgt,
                    _mk(spark, [(i, f"v{i}", 10) for i in range(10)]),
                    ["k"], "ts", n_buckets=2, emit_changes=True)


def _bucket_disjoint_keys(spark, lo=100, hi=160, per_bucket=5):
    """Two key sets that hash into DIFFERENT buckets of a 2-bucket
    layout, so racing writers collide only on the feed commit, the
    window under test — not on a bucket swap."""
    probe = spark.range(lo, hi).select(
        F.col("id").alias("k"), bucket_of(["k"], 2).alias("kb"))
    rows = probe.collect()
    b0 = [r["k"] for r in rows if r["kb"] == 0][:per_bucket]
    b1 = [r["k"] for r in rows if r["kb"] == 1][:per_bucket]
    assert len(b0) == per_bucket and len(b1) == per_bucket
    return b0, b1


def _run_racers(spark, tgt, keys_a, keys_b, lock):
    """Two threads upserting concurrently; returns their exceptions."""
    errs: dict[str, BaseException | None] = {"a": None, "b": None}
    start = threading.Barrier(2, timeout=120)

    def writer(name, keys, tag):
        def run():
            try:
                start.wait()
                upsert_bucketed(
                    spark, tgt,
                    _mk(spark, [(k, f"{tag}{k}", 20) for k in keys]),
                    ["k"], "ts", emit_changes=True, lock=lock,
                    lock_timeout=120.0)
            except BaseException as exc:
                errs[name] = exc
        return threading.Thread(target=run, name=f"racer-{name}")

    ta = writer("a", keys_a, "A")
    tb = writer("b", keys_b, "B")
    ta.start(); tb.start()
    ta.join(300); tb.join(300)
    assert not ta.is_alive() and not tb.is_alive(), "racer deadlocked"
    return errs


def _commit_seqs(spark, tgt):
    root = fsutil.path_join(tgt, "_changes")
    return sorted(int(n.split("-", 2)[1])
                  for n in fsutil.list_names(spark, root)
                  if n.startswith("commit-"))


def test_locked_racing_writers_serialize(spark, tmp_path):
    """lock=True is hard exclusion: both concurrent writers land,
    sequentially — dense duplicate-free feed, both batches in the
    table, deep fsck green."""
    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt)
    ka, kb = _bucket_disjoint_keys(spark)
    errs = _run_racers(spark, tgt, ka, kb, lock=True)
    assert errs["a"] is None and errs["b"] is None, errs
    assert _commit_seqs(spark, tgt) == [0, 1, 2]
    table_keys = {r["k"] for r in
                  spark.read.parquet(tgt).select("k").collect()}
    assert set(ka) <= table_keys and set(kb) <= table_keys
    feed = read_changes(spark, tgt)
    assert feed.filter(F.col("_op") == "insert").count() == 10 + len(ka + kb)
    rep = fsck_table(spark, tgt, deep=True)
    assert rep["ok"], rep["findings"]


def test_unlocked_race_reconcile_and_reconverge(spark, tmp_path,
                                                monkeypatch):
    """The unlocked duplicate-seq race, raced for real, then the full
    recovery runbook end-to-end."""
    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    # a replica synced through the pre-race feed
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2, source_path=tgt)
    assert read_replica_generation(spark, rep_path) == 0

    # --- the race: release both feed-commit renames together
    commit_gate = threading.Barrier(2, timeout=120)
    real_rename = fsutil.rename

    def racy_rename(s, src, dst):
        if "/_changes/commit-" in dst.replace("\\", "/"):
            try:
                commit_gate.wait()
            except threading.BrokenBarrierError:
                pass
        real_rename(s, src, dst)

    monkeypatch.setattr(fsutil, "rename", racy_rename)
    ka, kb = _bucket_disjoint_keys(spark)
    errs = _run_racers(spark, tgt, ka, kb, lock=False)
    monkeypatch.undo()
    assert errs["a"] is None and errs["b"] is None, errs

    # duplicate seq minted; both merges DID land in the table
    seqs = _commit_seqs(spark, tgt)
    assert seqs == [0, 1, 1], seqs
    table_keys = {r["k"] for r in
                  spark.read.parquet(tgt).select("k").collect()}
    assert set(ka) <= table_keys and set(kb) <= table_keys
    # feed reads are bricked until reconciled
    with pytest.raises(Exception):
        read_changes(spark, tgt)
    rep = fsck_table(spark, tgt)
    assert "duplicate_seq" in {f["check"] for f in rep["findings"]
                               if f["severity"] == "error"}

    # simulate the streaming consumer that ingested BOTH racers'
    # commits before anyone reconciled (the file-source glob has no
    # duplicate check): apply each dup commit dir directly
    root = fsutil.path_join(tgt, "_changes")
    for name in fsutil.list_names(spark, root):
        if name.startswith("commit-0000000001-"):
            slice_df = spark.read.parquet(fsutil.path_join(root, name))
            apply_changes(spark, slice_df, rep_path, ["k"],
                          source_path=tgt)
    assert read_replica_generation(spark, rep_path) == 0

    # --- reconcile: readability back, generation bumped
    out = reconcile_changes(spark, tgt)
    assert len(out["quarantined"]) == 1 and out["latest_seq"] == 1
    assert out["generation"] == 1
    assert read_feed_generation(spark, tgt)["gen"] == 1
    assert read_changes(spark, tgt).count() > 0        # readable again
    assert fsck_table(spark, tgt)["ok"]                # structural ok

    # --- the stale consumer is REFUSED, not silently served
    with pytest.raises(StaleFeedConsumerError):
        apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                      source_path=tgt)
    with pytest.raises(StaleFeedConsumerError):
        check_feed_vouched(spark, tgt, consumer_gen=0, consumer_seq=1)
    # a LAGGING consumer (below every quarantined seq) stays vouched
    check_feed_vouched(spark, tgt, consumer_gen=0, consumer_seq=0)

    # --- re-convergence: anchor from the TABLE (the source of truth —
    # it holds both racers' merges), bootstrap the replica from it
    create_anchor(spark, tgt)
    bootstrap_replica(spark, tgt, rep_path, n_buckets=2)
    assert read_replica_generation(spark, rep_path) == 1
    tbl = sorted((r["k"], r["v"]) for r in
                 spark.read.parquet(tgt).select("k", "v").collect())
    rep_rows = sorted((r["k"], r["v"]) for r in
                      spark.read.parquet(rep_path).select("k", "v")
                      .collect())
    assert rep_rows == tbl

    # anchored at the newest seq, the deep replay equivalence holds
    # again and incremental consumption resumes
    deep = fsck_table(spark, tgt, deep=True)
    assert deep["ok"], deep["findings"]
    upsert_bucketed(spark, tgt, _mk(spark, [(500, "post", 30)]),
                    ["k"], "ts", emit_changes=True)
    apply_changes(spark, read_changes(spark, tgt, since_seq=1),
                  rep_path, ["k"], source_path=tgt)
    assert {r["k"] for r in spark.read.parquet(rep_path)
            .select("k").collect()} == \
        {r["k"] for r in spark.read.parquet(tgt).select("k").collect()}


def test_unlocked_race_without_gate_is_either_clean_or_recoverable(
        spark, tmp_path):
    """The UNSTEERED race (no barrier): whatever interleaving the
    scheduler picks, the end state is either a clean dense feed (the
    writers happened to serialize) or a detected duplicate that
    reconcile_changes repairs — never a silent third state."""
    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt)
    ka, kb = _bucket_disjoint_keys(spark)
    errs = _run_racers(spark, tgt, ka, kb, lock=False)
    assert errs["a"] is None and errs["b"] is None, errs
    seqs = _commit_seqs(spark, tgt)
    if len(set(seqs)) == len(seqs):
        assert seqs in ([0, 1, 2],), seqs          # serialized cleanly
    else:
        reconcile_changes(spark, tgt)
    assert fsck_table(spark, tgt)["ok"]
    assert read_changes(spark, tgt).count() > 0


def test_reconcile_crash_windows_converge(spark, tmp_path, monkeypatch):
    """reconcile_changes killed at each of its own FS mutations, then
    re-run: the generation marker is published BEFORE the quarantine
    renames precisely so that NO crash ordering can leave consumers
    unwarned — a crash after the marker leaves the feed visibly
    bricked until the re-run; a crash inside the renames re-runs to
    the same quarantine; and the marker can only over-count
    generations (conservative), never under-count."""
    import json

    tgt = str(tmp_path / "tbl")
    _seed(spark, tgt)
    upsert_bucketed(spark, tgt, _mk(spark, [(50, "x", 20)]), ["k"],
                    "ts", emit_changes=True)
    # forge the duplicate (the RACED variant is pinned above; here the
    # subject is reconcile's own crash windows, so the input state is
    # fixed deterministically)
    root = fsutil.path_join(tgt, "_changes")
    keeper = [n for n in fsutil.list_names(spark, root)
              if n.startswith("commit-0000000001-")][0]
    loser = "commit-0000000001-deadbeef"
    spark.read.parquet(fsutil.path_join(root, keeper)) \
        .write.parquet(fsutil.path_join(root, loser))

    # crash at each mutation inside reconcile: K=1 is the generation
    # publish, K=2 the loser rename
    for k in (1, 2):
        calls = {"n": 0}
        real_rename, real_pub = fsutil.rename, fsutil.publish_text

        def boom():
            calls["n"] += 1
            if calls["n"] == k:
                raise RuntimeError("injected reconcile crash")

        def rn(s, a, b):
            boom(); real_rename(s, a, b)

        def pt(s, p, t):
            boom(); real_pub(s, p, t)

        monkeypatch.setattr(fsutil, "rename", rn)
        monkeypatch.setattr(fsutil, "publish_text", pt)
        with pytest.raises(RuntimeError, match="injected"):
            reconcile_changes(spark, tgt)
        monkeypatch.undo()
        if k == 1:
            # marker never landed, feed still bricked — no consumer
            # could be misled into reading it
            with pytest.raises(Exception):
                read_changes(spark, tgt)
        # re-run converges
        out = reconcile_changes(spark, tgt)
        if out["quarantined"]:
            break

    # end state: readable, marker present, fsck ok; generation may be
    # >1 (a crashed attempt also bumped) but never 0
    marker = read_feed_generation(spark, tgt)
    assert marker["gen"] >= 1 and marker["min_quarantined_seq"] == 1
    assert read_changes(spark, tgt).count() > 0
    assert fsck_table(spark, tgt)["ok"]
    q = fsutil.list_names(spark, fsutil.path_join(root, "_conflict"))
    assert loser in q or keeper in q


def test_corrupt_generation_marker_fails_closed(spark, tmp_path):
    """ADVICE r10: the torn-marker fallback must refuse EVERY
    consumer, not just gen-0 ones — a marker that cannot be read
    vouches for nothing. ``reconcile_changes`` is the repair verb:
    it republishes a valid marker above the fail-closed sentinel
    with all history suspect, forcing one re-bootstrap per consumer,
    after which recorded generations are consistent again."""
    from cdc_data_pipeline_spark.operators.incremental import (
        FEED_GEN, GEN_UNREADABLE)

    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2, source_path=tgt)
    marker_path = fsutil.path_join(tgt, "_changes", FEED_GEN)
    # torn JSON, valid JSON missing 'gen' (the dead-KeyError case),
    # and a non-integer gen all read as the fail-closed sentinel
    for payload in ('{"gen": 2, "min_quarantined', "{}",
                    '{"min_quarantined_seq": 0}', '{"gen": "x"}',
                    '{"gen": null}'):
        fsutil.publish_text(spark, marker_path, payload)
        m = read_feed_generation(spark, tgt)
        assert m.get("corrupt") and m["gen"] == GEN_UNREADABLE, payload
        # refused whatever generation the consumer recorded, even a
        # high one with an empty watermark
        with pytest.raises(StaleFeedConsumerError):
            check_feed_vouched(spark, tgt, consumer_gen=7,
                               consumer_seq=-1)
        with pytest.raises(StaleFeedConsumerError):
            apply_changes(spark, read_changes(spark, tgt), rep_path,
                          ["k"], source_path=tgt)
    # a bootstrap must not record the sentinel (it would vouch every
    # future generation): refused until the marker is repaired
    create_anchor(spark, tgt)
    with pytest.raises(StaleFeedConsumerError):
        bootstrap_replica(spark, tgt, rep_path, n_buckets=2)
    # reconcile repairs the marker even with no duplicate seqs
    out = reconcile_changes(spark, tgt)
    assert out["quarantined"] == []
    m = read_feed_generation(spark, tgt)
    assert not m.get("corrupt")
    assert m["gen"] == GEN_UNREADABLE + 1
    assert m["min_quarantined_seq"] == -1
    # the documented runbook re-converges and vouches again
    bootstrap_replica(spark, tgt, rep_path, n_buckets=2)
    assert read_replica_generation(spark, rep_path) == GEN_UNREADABLE + 1
    upsert_bucketed(spark, tgt, _mk(spark, [(900, "post", 30)]),
                    ["k"], "ts", emit_changes=True)
    apply_changes(spark, read_changes(spark, tgt, since_seq=0),
                  rep_path, ["k"], source_path=tgt)
    assert {r["k"] for r in spark.read.parquet(rep_path)
            .select("k").collect()} == \
        {r["k"] for r in spark.read.parquet(tgt).select("k").collect()}


def _forge_duplicate_seq(spark, tgt):
    """Deterministic duplicate-seq state (the RACED variant is pinned
    above; these tests exercise consumer-side policy, so the input
    state is fixed)."""
    upsert_bucketed(spark, tgt, _mk(spark, [(50, "x", 20)]), ["k"],
                    "ts", emit_changes=True)
    root = fsutil.path_join(tgt, "_changes")
    keeper = [n for n in fsutil.list_names(spark, root)
              if n.startswith("commit-0000000001-")][0]
    loser = "commit-0000000001-deadbeef"
    spark.read.parquet(fsutil.path_join(root, keeper)) \
        .write.parquet(fsutil.path_join(root, loser))


def test_staleness_guard_is_fail_closed_by_default(spark, tmp_path):
    """VERDICT r10 #1: the r10 generation machinery protected only
    consumers that opted in via source_path. Now the LEGACY signature
    — apply_changes(spark, feed, replica, keys) — is refused after a
    reconcile too: read_changes stamps the source root on the feed's
    _seq column metadata, and the guard derives it from there."""
    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    # legacy-signature consumer: no source_path anywhere
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2)
    # the lineage-derived guard vouched and recorded generation 0
    assert read_replica_generation(spark, rep_path) == 0
    _forge_duplicate_seq(spark, tgt)
    # consumer ingests the soon-to-be-quarantined commit, still legacy
    root = fsutil.path_join(tgt, "_changes")
    for name in fsutil.list_names(spark, root):
        if name.startswith("commit-0000000001-"):
            slice_df = spark.read.parquet(fsutil.path_join(root, name)) \
                .withMetadata("_seq", {"cdc_source_root": tgt})
            apply_changes(spark, slice_df, rep_path, ["k"])
    reconcile_changes(spark, tgt)
    # the legacy signature is REFUSED — no silent path remains
    with pytest.raises(StaleFeedConsumerError):
        apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"])


def test_handbuilt_feed_requires_explicit_choice(spark, tmp_path):
    """A feed with no lineage (hand-built _seq) and no source_path
    cannot be silently applied: ValueError demands either the path or
    the explicit allow_unvouched opt-out."""
    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    feed = read_changes(spark, tgt)
    # rebuilding _seq drops the lineage metadata
    stripped = feed.withColumn("_seq", F.col("_seq") + 0)
    assert stripped.schema["_seq"].metadata == {}
    with pytest.raises(ValueError, match="allow_unvouched"):
        apply_changes(spark, stripped, rep_path, ["k"], n_buckets=2)
    assert not fsutil.exists(spark, rep_path)
    # both escape hatches work
    apply_changes(spark, stripped, rep_path, ["k"], n_buckets=2,
                  allow_unvouched=True)
    apply_changes(spark, stripped, rep_path, ["k"], source_path=tgt)
    assert spark.read.parquet(rep_path).count() == 10


def test_reconverge_auto_rebuilds_refused_consumer(spark, tmp_path):
    """VERDICT r10 #5: reconverge=True mechanizes the refusal runbook
    — a consumer holding quarantined rows is rebuilt in place
    (create_anchor + bootstrap_replica) instead of raising, ends
    vouched under the new generation, and resumes incremental
    consumption; deep fsck green end-to-end."""
    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2)
    _forge_duplicate_seq(spark, tgt)
    root = fsutil.path_join(tgt, "_changes")
    for name in fsutil.list_names(spark, root):
        if name.startswith("commit-0000000001-"):
            slice_df = spark.read.parquet(fsutil.path_join(root, name)) \
                .withMetadata("_seq", {"cdc_source_root": tgt})
            apply_changes(spark, slice_df, rep_path, ["k"])
    reconcile_changes(spark, tgt)
    assert read_feed_generation(spark, tgt)["gen"] == 1
    # refused without the flag...
    with pytest.raises(StaleFeedConsumerError):
        apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"])
    # ...auto-reconverged with it
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2, reconverge=True)
    assert read_replica_generation(spark, rep_path) == 1
    tbl = sorted((r["k"], r["v"]) for r in
                 spark.read.parquet(tgt).select("k", "v").collect())
    rep_rows = sorted((r["k"], r["v"]) for r in
                      spark.read.parquet(rep_path).select("k", "v")
                      .collect())
    assert rep_rows == tbl
    deep = fsck_table(spark, tgt, deep=True)
    assert deep["ok"], deep["findings"]
    # incremental consumption resumes through the legacy signature
    upsert_bucketed(spark, tgt, _mk(spark, [(700, "post", 40)]),
                    ["k"], "ts", emit_changes=True)
    apply_changes(spark, read_changes(spark, tgt, since_seq=1),
                  rep_path, ["k"])
    assert {r["k"] for r in spark.read.parquet(rep_path)
            .select("k").collect()} == \
        {r["k"] for r in spark.read.parquet(tgt).select("k").collect()}


def test_replica_sync_caches_watermark_o1(spark, tmp_path):
    """The guard's consumer watermark is cached in _feed_sync.json
    (O(1) metadata — at 100 TB the fail-closed default must not cost
    an O(replica) MAX scan per apply): guarded applies advance it
    from the feed's lineage (zero jobs), an UNGUARDED apply
    invalidates it (a stale-low cache would fail OPEN), and the scan
    fallback re-derives it so refusal still happens."""
    from cdc_data_pipeline_spark.operators.incremental import (
        read_replica_sync)

    tgt = str(tmp_path / "tbl")
    rep_path = str(tmp_path / "replica")
    _seed(spark, tgt)
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  n_buckets=2)
    assert read_replica_sync(spark, rep_path) == {"gen": 0, "seq": 0}
    upsert_bucketed(spark, tgt, _mk(spark, [(20, "x", 20)]), ["k"],
                    "ts", emit_changes=True)
    apply_changes(spark, read_changes(spark, tgt, since_seq=0),
                  rep_path, ["k"])
    assert read_replica_sync(spark, rep_path) == {"gen": 0, "seq": 1}
    # idempotent re-apply does not regress the watermark
    apply_changes(spark, read_changes(spark, tgt, since_seq=0),
                  rep_path, ["k"])
    assert read_replica_sync(spark, rep_path) == {"gen": 0, "seq": 1}
    # an unguarded apply invalidates the cache (keeps the generation)
    apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"],
                  allow_unvouched=True)
    assert read_replica_sync(spark, rep_path) == {"gen": 0, "seq": None}
    # scan fallback: the replica REALLY holds seq 1, so after a
    # reconcile quarantines seq 1 the consumer is still refused even
    # with no cache
    _forge_duplicate_seq(spark, tgt)     # dup at seq 1 (consumed above)
    reconcile_changes(spark, tgt)
    with pytest.raises(StaleFeedConsumerError):
        apply_changes(spark, read_changes(spark, tgt), rep_path, ["k"])
    # re-converge re-seeds both gen and the cached watermark
    create_anchor(spark, tgt)
    newest = bootstrap_replica(spark, tgt, rep_path, n_buckets=2)
    assert read_replica_sync(spark, rep_path) == {"gen": 1,
                                                  "seq": newest}


def test_stream_ivm_fold_refuses_then_reconverges(spark, tmp_path):
    """The streaming IVM fold after a reconcile: without reconverge
    the stream fails loudly (StaleFeedConsumerError — unvouched sums
    must not compound); with reconverge=True the mart is REBUILT from
    the table (one aggregate, stamped at the current seq under the
    new generation) and incremental folding resumes (VERDICT r10 #5,
    streaming side)."""
    from cdc_data_pipeline_spark.operators.incremental import (
        read_mart_generation, read_mart_seq)
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_ivm_to_parquet)

    tbl = str(tmp_path / "tbl")
    mart = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    schema = "k long, grp string, amt double, ts long, is_del boolean"

    def up(rows):
        upsert_bucketed(spark, tbl, spark.createDataFrame(rows, schema),
                        ["k"], "ts", n_buckets=4, delete_col="is_del",
                        emit_changes=True, update_preimages=True)

    up([(1, "a", 10.0, 10, False), (2, "b", 5.0, 10, False)])  # seq 0
    up([(3, "a", 7.0, 20, False)])                             # seq 1
    q = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"], ck)
    q.awaitTermination(180)
    assert read_mart_seq(spark, mart) == 1
    assert read_mart_generation(spark, mart) == 0

    # a writer race duplicates seq 1; reconcile quarantines the loser
    # and bumps the generation — this mart folded seq 1, so it is no
    # longer vouched
    root = fsutil.path_join(tbl, "_changes")
    keeper = [n for n in fsutil.list_names(spark, root)
              if n.startswith("commit-0000000001-")][0]
    spark.read.parquet(fsutil.path_join(root, keeper)) \
        .write.parquet(fsutil.path_join(root, "commit-0000000001-feed"))
    reconcile_changes(spark, tbl)
    assert read_feed_generation(spark, tbl)["gen"] == 1

    up([(4, "b", 3.0, 30, False)])                             # seq 2
    # without reconverge: the fold fails the stream loudly
    q2 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"],
                               str(tmp_path / "ck2"))
    with pytest.raises(Exception, match="vouch"):
        q2.awaitTermination(180)
        raise AssertionError("stream should have failed")
    # mart untouched by the refused fold
    assert read_mart_generation(spark, mart) == 0

    # with reconverge: rebuilt from the table, stamped at the current
    # seq under the new generation, equal to a full recompute
    q3 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"],
                               str(tmp_path / "ck3"), reconverge=True)
    q3.awaitTermination(180)
    assert read_mart_seq(spark, mart) == 2
    assert read_mart_generation(spark, mart) == 1
    got = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
           for r in spark.read.parquet(mart).collect()}
    assert got == {("a", 17.0, 2), ("b", 8.0, 2)}

    # incremental folding resumes — no rescan, the fold stays vouched
    up([(1, "a", 1.0, 40, False)])                             # seq 3
    q4 = stream_ivm_to_parquet(spark, tbl, mart, ["grp"], ["amt"],
                               str(tmp_path / "ck3"), reconverge=True)
    q4.awaitTermination(180)
    got = {(r["grp"], round(r["delta_amt"], 2), r["delta_count"])
           for r in spark.read.parquet(mart).collect()}
    assert got == {("a", 8.0, 2), ("b", 8.0, 2)}   # 10->1 via preimage
    assert read_mart_seq(spark, mart) == 3
