"""Round-7 LSM protocol hardening: collision-proof staged generation
names (ADVICE r6 medium #1), the opt-in maintenance lock (r6 verdict
task #2), structural kind detection for legacy pre-meta layouts
(ADVICE r6 low #3), and legacy-root stats resolution (low #4)."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import dedup as dd
from cdc_data_pipeline_spark.operators import dedup_index as di
from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators import text_index as ti
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join
from cdc_data_pipeline_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


# ------------------------------------------- collision-proof staging

def test_staged_generation_names_are_collision_proof(spark, tmp_path):
    """Two maintainers that race the SAME directory listing must stage
    under DIFFERENT names, so the loser can never delete or write into
    a directory the winner publishes (the pre-r7 clobber window: both
    computed base-<n> from the same listing, and the loser's staging
    delete destroyed the winner's already-published generation)."""
    path = str(tmp_path / "idx")
    fsutil.mkdirs(spark, path)
    n1 = lsm.next_gen_name(spark, path)
    n2 = lsm.next_gen_name(spark, path)  # same listing state as n1
    assert n1 != n2
    assert lsm._gen_ordinal(n1) == 0 == lsm._gen_ordinal(n2)
    # ordinals advance past anything staged-or-published, nonce or not
    fsutil.mkdirs(spark, path_join(path, n1))
    assert lsm._gen_ordinal(lsm.next_gen_name(spark, path)) == 1
    # pre-nonce names and the legacy "base" dir still parse
    fsutil.mkdirs(spark, path_join(path, "base-0000000099"))
    fsutil.mkdirs(spark, path_join(path, "base"))
    assert lsm._gen_ordinal(lsm.next_gen_name(spark, path)) == 100


# ------------------------------------------------ maintenance lock

def test_locked_compactions_serialize_instead_of_racing(
        spark, sf_dir, tmp_path):
    """Two concurrent compactions under ``lock=True`` SERIALIZE — both
    complete, neither raises ``ConcurrentPublishError`` — where the
    unlocked pair could only detect-and-fail
    (test_lsm_concurrency.py). Served answers are unchanged and the
    lock marker is gone afterwards."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs.filter(F.col("doc_id") % 2 == 0),
                        path)
    ti.append_to_text_index(spark, path,
                            docs.filter(F.col("doc_id") % 2 == 1))
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    before = {tuple(r) for r in
              ti.search_text_index(spark, path, queries, k=3).collect()}

    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def run():
        barrier.wait()
        try:
            lsm.compact_index(spark, path, lock=True,
                              lock_timeout_sec=600)
        except Exception as ex:  # noqa: BLE001 - assert below
            errors.append(ex)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert errors == []
    assert not fsutil.exists(spark, path_join(path, lsm.MAINT_LOCK))
    after = {tuple(r) for r in
             ti.search_text_index(spark, path, queries, k=3).collect()}
    assert after == before


def test_lock_timeout_raises_held(spark, tmp_path):
    path = str(tmp_path / "idx")
    with lsm.maintenance_lock(spark, path, timeout_sec=60):
        # stats expose the held lock's age — the scheduler signal
        age = lsm._lock_age_sec(spark, path)
        assert age is not None and 0 <= age < 60
        with pytest.raises(lsm.MaintenanceLockHeld):
            with lsm.maintenance_lock(spark, path, ttl_sec=3600,
                                      timeout_sec=0.4, poll_sec=0.1):
                pass
    # the failed acquire must not have released the holder's lock; the
    # holder's own exit does
    assert not fsutil.exists(spark, path_join(path, lsm.MAINT_LOCK))
    assert lsm._lock_age_sec(spark, path) is None


def test_stale_lock_takeover_and_safe_release(spark, tmp_path):
    """A crashed holder's marker is expired once older than the TTL;
    the expired holder's (late) release must NOT delete the taker's
    lock — release is token-guarded."""
    path = str(tmp_path / "idx")
    lock_file = os.path.join(path, lsm.MAINT_LOCK)
    holder = lsm.maintenance_lock(spark, path, timeout_sec=5)
    holder.__enter__()
    old = time.time() - 7200
    os.utime(lock_file, (old, old))

    with lsm.maintenance_lock(spark, path, ttl_sec=3600, timeout_sec=5):
        # takeover happened: a fresh marker with the taker's token
        assert fsutil.exists(spark, lock_file)
        holder.__exit__(None, None, None)  # zombie release: no-op
        assert fsutil.exists(spark, lock_file)
    assert not fsutil.exists(spark, lock_file)


# ------------------------------- legacy layout detection / resolution

def test_compact_index_detects_legacy_lsh_without_meta(
        spark, sf_dir, tmp_path):
    """The kind dispatcher must migrate exactly the legacy layouts the
    per-kind compactors document as their migration path: a pre-meta
    LSH index (root-level ``bands``, parquet ``meta``, no meta.json)
    dispatches structurally instead of raising 'no index metadata'."""
    docs = _docs(spark, sf_dir).limit(120)
    path = str(tmp_path / "legacy_lsh")
    banded = di._with_pfx(
        dd.banded_signatures(docs, "text", "doc_id", 8, 4, 3), 8)
    banded.write.mode("overwrite").partitionBy(di.PFX) \
        .parquet(f"{path}/bands")
    spark.createDataFrame(
        [(8, 4, 3, 8)],
        "num_hashes int, bands int, shingle_k int, n_prefixes int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    out = lsm.compact_index(spark, path)
    assert out["kind"] == "lsh"
    assert lsm.current_base_name(spark, path).startswith("base-")


def test_compact_index_detects_legacy_ann_without_meta(
        spark, sf_dir, tmp_path):
    """Same for the pre-meta ANN layout: root-level ``cells`` (no
    meta.json) detects as ivf and migrates through compaction."""
    import shutil

    from cdc_data_pipeline_spark.operators import index as ix

    e = read_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    donor = str(tmp_path / "donor")
    ix.build_ivf_index(spark, e, donor, n_cells=8, iters=1)
    _, droot, _ = ix._resolve(spark, donor)
    path = str(tmp_path / "legacy_ann")
    shutil.copytree(f"{droot}/cells", f"{path}/cells")
    shutil.copytree(f"{droot}/centroids", f"{path}/centroids")

    out = lsm.compact_index(spark, path)
    assert out["kind"] == "ivf"
    assert lsm.current_base_name(
        spark, path, legacy_probe=("cells",), legacy_name=".") \
        .startswith("base-")


def test_index_stats_legacy_text_resolves_base_root(spark, sf_dir,
                                                    tmp_path):
    """A legacy text index's unfolded-delta count must resolve the
    manifest against ``<path>/base`` (where its compacted.json lives),
    not the index root — the per-kind ``_resolve`` rule."""
    import shutil

    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, a, path)
    gen = ti._current_base_name(spark, path)
    shutil.move(f"{path}/{gen}", f"{path}/base")
    fsutil.delete(spark, f"{path}/{ti.BASE_PTR}")
    ti.append_to_text_index(spark, path, b)

    st = lsm.index_stats(spark, path)
    assert st["kind"] == "text"
    assert st["generation"] == "<legacy>"
    assert st["n_deltas"] == 1
    # the part that needs the per-kind root: a manifest under base/
    # excludes its folded names from the unfolded count
    dname = fsutil.list_names(spark, f"{path}/delta")[0]
    fsutil.write_text(spark, f"{path}/base/compacted.json",
                      json.dumps([dname]))
    assert lsm.index_stats(spark, path)["n_deltas"] == 0


# ---------------------------------------------- no-op delete hygiene

def test_noop_deletes_accumulate_no_deltas(spark, sf_dir, tmp_path):
    """A delete matching zero visible ids commits NOTHING on any of
    the three index families: replaying a no-op delete is itself a
    no-op, so the idempotency marker is unnecessary — and before r7
    each such delete added one delta dir until the next compact
    (unbounded read amplification for streams deleting maybe-absent
    ids). Matched deletes still commit, and answers are unchanged."""
    from cdc_data_pipeline_spark.operators import index as ix

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 4 == 0)
    ghost_ids = spark.range(3).select(
        (F.col("id") + 5_000_000_000).alias("doc_id"))

    tix = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, tix)
    lsh = str(tmp_path / "lsh")
    di.build_lsh_index(spark, docs, lsh, n_prefixes=8)
    emb = read_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").filter(F.col("vec_id") % 4 == 0)
    ivf = str(tmp_path / "ivf")
    ix.build_ivf_index(spark, emb, ivf, n_cells=4, iters=1)
    ghost_vecs = spark.range(3).select(
        (F.col("id") + 5_000_000_000).alias("vec_id"))

    for _ in range(3):  # repeated no-ops: still zero deltas
        assert ti.delete_from_text_index(
            spark, tix, ghost_ids)["deleted"] == 0
        assert di.delete_from_lsh_index(
            spark, lsh, ghost_ids)["deleted"] == 0
        assert ix.delete_from_ivf_index(
            spark, ivf, ghost_vecs)["deleted"] == 0
    for path in (tix, lsh, ivf):
        assert lsm.index_stats(spark, path)["n_deltas"] == 0, path

    # a MATCHED delete still commits one tombstone delta
    victim = docs.select("doc_id").limit(1)
    assert ti.delete_from_text_index(spark, tix, victim)["deleted"] == 1
    assert lsm.index_stats(spark, tix)["n_deltas"] == 1


def test_lock_remote_scheme_branch_under_mockfs(spark, tmp_path):
    """The lock's REMOTE branch (Hadoop create-no-overwrite, the
    HDFS-shaped path) under the mock remote scheme: acquire, observe
    contention (timeout raise), release, reacquire. Local paths take
    the O_EXCL branch, so only a non-file scheme executes this code."""
    from conftest import MOCKFS_CLASSPATH
    if MOCKFS_CLASSPATH is None:
        pytest.skip("javac/hadoop jars unavailable")
    path = "mockfs://" + str(tmp_path / "idx")
    with lsm.maintenance_lock(spark, path, timeout_sec=5):
        assert fsutil.exists(spark, path_join(path, lsm.MAINT_LOCK))
        with pytest.raises(lsm.MaintenanceLockHeld):
            with lsm.maintenance_lock(spark, path, ttl_sec=3600,
                                      timeout_sec=0.4, poll_sec=0.1):
                pass
    assert not fsutil.exists(spark, path_join(path, lsm.MAINT_LOCK))
    # reacquirable after release
    with lsm.maintenance_lock(spark, path, timeout_sec=5):
        pass


def test_stale_lock_acquirable_at_elapsed_deadline(spark, tmp_path):
    """Review-r8: expiring a stale marker must lead to an immediate
    acquire attempt — raising MaintenanceLockHeld for a lock this
    writer just freed (with a message claiming it is held) is a
    contradiction. A zero timeout with a stale marker still acquires."""
    import os
    import time

    root = str(tmp_path / "idx")
    holder = lsm.maintenance_lock(spark, root)
    holder.__enter__()
    marker = tmp_path / "idx" / lsm.MAINT_LOCK
    old = time.time() - 7200
    os.utime(marker, (old, old))                 # crashed 2h ago
    with lsm.maintenance_lock(spark, root, ttl_sec=3600.0,
                              timeout_sec=0.0):
        pass                                     # acquired immediately
    # the stale holder's release must not delete the new owner's marker
    holder.__exit__(None, None, None)
