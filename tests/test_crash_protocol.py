"""Randomized crash-point fault injection over the COMPOSED
swap/commit/pointer/anchor protocol (VERDICT r8 #1).

Round 8 proved each crash window individually (strand healing,
stale-pointer repair, _recover_rewrite, IVM sidecar) with hand-picked
kill-point tests — but the windows compose: a crash between the feed
commit and a bucket swap DURING a rewrite's rename, a crash in
create_anchor mid-publish inside an auto-anchoring vacuum, and so on.
This sweep makes the claim total: every protocol FS mutation
(``fsutil.rename``, ``fsutil.publish_text`` and ``fsutil.write_text``
— the commit points; deletes are idempotent garbage collection) is a
kill site, over BOTH persisted protocols: the bucketed-table
swap/commit/pointer/anchor machinery and the LSM index families'
generation/pointer/marker machinery (``lsm.py``, shared by the LSH,
text, IVF and IVF-PQ indexes — swept through the LSH family). For EVERY
K in 1..N the lifecycle is killed at its K-th mutation, then the
crashed step is REPLAYED (the foreachBatch redelivery contract — the
at-least-once caller re-runs the same batch) and the remaining steps
run to completion. The end state must be bit-identical to the
fault-free golden run: table content, the full change feed (content
AND commit names — a minted duplicate seq would differ), the SCD2
snapshot and its feed, the IVM mart and its watermark, anchors, time
travel at the newest seq, and a replica bootstrapped from scratch.

Mirrors the reference's only correctness ritual — the manual CDC
re-run check (reference README.md:69-88) — made mechanical and total.

Runtime discipline: the lifecycle's state after every fault-free step
is checkpointed (copytree of a few-KB directory), so fault K only
re-executes from the step containing mutation K — the sweep is
O(sum of suffixes), not O(N * lifecycle).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import (
    _list_anchor_seqs, _list_change_commits, agg_deltas_from_feed,
    bootstrap_replica, create_anchor, delete_bucketed,
    merge_agg_deltas, read_changes, read_mart_seq, rebucket,
    recover_swap, table_at, upsert_bucketed, vacuum_changes,
    write_mart_merged)
from cdc_data_pipeline_spark.operators.scd2 import scd2_bucketed
from cdc_data_pipeline_spark.sources import fsutil


class InjectedCrash(Exception):
    pass


class _Injector:
    """Counts protocol FS mutations; raises at the armed K-th one.
    Raising BEFORE the mutation executes simulates a crash in the
    window after mutation K-1 — K=1..N covers every inter-mutation
    window (the window after mutation N is normal completion)."""

    def __init__(self):
        self.n = 0
        self.fail_at = None

    def tick(self):
        self.n += 1
        if self.fail_at is not None and self.n == self.fail_at:
            raise InjectedCrash(f"injected crash at FS mutation "
                                f"#{self.n}")


@pytest.fixture
def injector(monkeypatch):
    inj = _Injector()
    real_rename = fsutil.rename
    real_publish = fsutil.publish_text
    real_write = fsutil.write_text

    def rename(spark, src, dst):
        inj.tick()
        real_rename(spark, src, dst)

    def publish_text(spark, path, text):
        inj.tick()
        real_publish(spark, path, text)

    def write_text(spark, path, text):
        # the LSM families' _COMMIT markers; publish_text on local
        # roots goes through os.replace, so no double count there
        inj.tick()
        real_write(spark, path, text)

    monkeypatch.setattr(fsutil, "rename", rename)
    monkeypatch.setattr(fsutil, "publish_text", publish_text)
    monkeypatch.setattr(fsutil, "write_text", write_text)
    return inj


FACT_SCHEMA = "k long, grp string, amt double, ts long, is_del boolean"
DIM_SCHEMA = "k long, v string"
DIM_SCHEMA_WIDE = "k long, v string, tier string"


def _steps(spark, root: str):
    """The mixed lifecycle: every persisted protocol family composed —
    upsert+feed (creation, mixed ops with deletes and preimages),
    snapshot anchor, SCD2+feed (creation, close/open transitions with
    schema drift), layout rewrite (feed moves through the swap), merge
    at the new layout, two IVM folds (mart creation and incremental,
    watermark sidecar), and an auto-anchoring vacuum. Each step is
    REPLAYABLE: re-running it after a crash anywhere inside it must
    converge (the property under test)."""
    tbl, dim, mart = f"{root}/tbl", f"{root}/dim", f"{root}/mart"

    def up(rows, nb=None):
        def run():
            upsert_bucketed(spark, tbl,
                            spark.createDataFrame(rows, FACT_SCHEMA),
                            ["k"], "ts", n_buckets=nb,
                            delete_col="is_del", emit_changes=True,
                            update_preimages=True)
        return run

    def scd(rows, ts, schema=DIM_SCHEMA, evolve=False):
        def run():
            scd2_bucketed(spark, dim,
                          spark.createDataFrame(rows, schema),
                          ["k"], ["v"], ts, n_buckets=2,
                          emit_changes=True, update_preimages=True,
                          evolve_schema=evolve)
        return run

    def ivm():
        # batch-mode twin of stream_ivm_to_parquet's fold_batch: heal,
        # watermark-filter, fold, swap mart+watermark atomically
        recover_swap(spark, mart)
        applied = read_mart_seq(spark, mart)
        feed = read_changes(spark, tbl, since_seq=applied)
        if feed is None:
            return
        new_max = feed.agg(F.max("_seq").alias("m")).first()["m"]
        deltas = agg_deltas_from_feed(feed, ["grp"], ["amt"])
        cur = None
        if fsutil.exists(spark, mart):
            try:
                cur = spark.read.parquet(mart)
            except Exception:
                cur = None
        merged = merge_agg_deltas(cur, deltas, ["grp"])
        write_mart_merged(merged, mart, max(applied, int(new_max)))

    b1 = [(i, "a" if i % 2 else "b", 10.0 * (i + 1), 10, False)
          for i in range(8)]
    b2 = [(1, "a", 100.0, 20, False),        # update (preimage emitted)
          (2, None, 0.0, 20, True),          # hard delete
          (9, "b", 9.0, 20, False)]          # insert
    b3 = [(3, "a", 33.0, 30, False), (4, None, 0.0, 30, True)]
    b4 = [(5, "b", 55.0, 40, False), (10, "a", 1.0, 40, False)]
    d1 = [(1, "alice"), (2, "bob"), (3, "carol")]
    d2 = [(1, "alice2", "gold"), (4, "dave", "free")]   # drifted batch

    return [
        ("up_create", up(b1, nb=2)),                        # tbl seq 0
        ("up_mixed", up(b2)),                               # tbl seq 1
        ("anchor", lambda: create_anchor(spark, tbl)),      # anchor @1
        ("scd_create", scd(d1, "2024-01-01 00:00:00")),     # dim seq 0
        ("scd_drift", scd(d2, "2024-01-02 00:00:00",
                          DIM_SCHEMA_WIDE, evolve=True)),   # dim seq 1
        ("rebucket", lambda: rebucket(spark, tbl, 4)),      # feed moves
        ("up_newlayout", up(b3)),                           # tbl seq 2
        ("ivm_create", ivm),                                # mart @2
        # delete_bucketed has its own commit+swap path        tbl seq 3
        ("del_keys", lambda: delete_bucketed(
            spark, tbl, spark.createDataFrame([(6,)], "k long"),
            emit_changes=True)),
        ("up_more", up(b4)),                                # tbl seq 4
        ("ivm_incr", ivm),                                  # mart @4
        # victims 0..2 outrun anchor@1 -> auto-anchor, then prune
        ("vacuum", lambda: vacuum_changes(spark, tbl, before_seq=2)),
    ]


def _state(spark, root: str) -> dict:
    """Everything the protocol promises, collected for equality."""
    tbl, dim, mart = f"{root}/tbl", f"{root}/dim", f"{root}/mart"

    def feed_rows(path):
        got = read_changes(spark, path)
        if got is None:
            return []
        return sorted(tuple(str(x) for x in r)
                      for r in got.select(*sorted(got.columns)).collect())

    table = sorted(tuple(r) for r in spark.read.parquet(tbl)
                   .select("k", "grp", "amt", "ts").collect())
    dim_rows = sorted(
        tuple(str(x) for x in r)
        for r in spark.read.option("mergeSchema", "true").parquet(dim)
        .select("dbt_scd_id", "k", "v", "tier", "dbt_valid_from",
                "dbt_valid_to").collect())
    mart_rows = sorted(tuple(r) for r in spark.read.parquet(mart)
                       .select("grp", "delta_amt", "delta_count")
                       .collect())
    asof = sorted(tuple(r) for r in table_at(spark, tbl, 4)
                  .select("k", "grp", "amt", "ts").collect())
    return {
        "table": table,
        "tbl_feed": feed_rows(tbl),
        "tbl_commits": _list_change_commits(spark, tbl),
        "tbl_anchors": _list_anchor_seqs(spark, tbl),
        "dim": dim_rows,
        "dim_feed": feed_rows(dim),
        "dim_commits": _list_change_commits(spark, dim),
        "mart": mart_rows,
        "mart_seq": read_mart_seq(spark, mart),
        "table_at_newest": asof,
    }


def _assert_converged(spark, root: str, golden: dict, label: str):
    got = _state(spark, root)
    for key in golden:
        assert got[key] == golden[key], f"{label}: {key} diverged"
    # a replica bootstrapped from scratch (anchor seed + surviving
    # tail) equals the table — the consumer-facing convergence claim
    rep = f"{root}/rep"
    bootstrap_replica(spark, f"{root}/tbl", rep, n_buckets=2)
    rep_rows = sorted(tuple(r) for r in spark.read.parquet(rep)
                      .select("k", "grp", "amt", "ts").collect())
    assert rep_rows == golden["table"], f"{label}: replica diverged"
    # the mart equals a recompute from the final table
    recomputed = sorted(
        tuple(r) for r in spark.read.parquet(f"{root}/tbl")
        .groupBy("grp").agg(F.sum("amt").alias("delta_amt"),
                            F.count(F.lit(1)).alias("delta_count"))
        .collect())
    assert recomputed == golden["mart"], f"{label}: mart != recompute"
    # the independent auditor agrees: after crash + recovery + replay,
    # a structural fsck of both tables reports NO errors (leftover
    # healable debris may warn; an error here means recovery left a
    # state the protocol itself calls corrupt)
    from cdc_data_pipeline_spark.operators.incremental import fsck_table

    for t in (f"{root}/tbl", f"{root}/dim"):
        rep_fsck = fsck_table(spark, t)
        assert rep_fsck["ok"], f"{label}: fsck {t}: {rep_fsck['findings']}"


def test_crash_sweep_every_protocol_mutation(spark, tmp_path, injector):
    """Kill the lifecycle at EVERY protocol FS mutation, replay the
    crashed step, finish the lifecycle — the end state equals the
    fault-free golden run, for all K."""
    golden_root = str(tmp_path / "golden")
    ckpt_dir = tmp_path / "ckpt"

    # golden run: no fault, count mutations, checkpoint after each step
    steps = _steps(spark, golden_root)
    boundaries = [0]           # mutation count after step i
    Path(golden_root).mkdir()
    shutil.copytree(golden_root, str(ckpt_dir / "s0"))
    for i, (_name, run) in enumerate(steps):
        run()
        boundaries.append(injector.n)
        shutil.copytree(golden_root, str(ckpt_dir / f"s{i + 1}"))
    n_mutations = injector.n
    golden = _state(spark, golden_root)
    _assert_converged(spark, golden_root, golden, "golden")
    assert n_mutations >= 30, "lifecycle unexpectedly thin"

    # which step owns mutation K: the first step whose boundary >= K
    def step_of(k: int) -> int:
        for i in range(len(steps)):
            if boundaries[i] < k <= boundaries[i + 1]:
                return i
        raise AssertionError(k)

    root = str(tmp_path / "run")
    failures = []
    for k in range(1, n_mutations + 1):
        s = step_of(k)
        shutil.rmtree(root, ignore_errors=True)
        shutil.copytree(str(ckpt_dir / f"s{s}"), root)
        run_steps = _steps(spark, root)
        injector.n = boundaries[s]
        injector.fail_at = k
        try:
            with pytest.raises(InjectedCrash):
                run_steps[s][1]()
        except BaseException as exc:   # wrong/no exception: record K
            failures.append((k, run_steps[s][0], f"arm: {exc}"))
            injector.fail_at = None
            continue
        injector.fail_at = None
        try:
            # REPLAY the crashed step, then run the rest to completion
            for _name, run in run_steps[s:]:
                run()
            _assert_converged(spark, root, golden,
                              f"K={k} (step {run_steps[s][0]})")
        except BaseException as exc:
            failures.append((k, run_steps[s][0], str(exc)[:200]))
    assert not failures, (
        f"{len(failures)}/{n_mutations} crash points failed to "
        f"converge: {failures[:5]}")


# ---------------------------------------------------------- LSM sweep

def _lsh_docs(spark, tag: str, ids):
    rows = [(i, f"{tag} the quick brown fox jumps over the lazy dog "
                f"document number {i} with shared trailing shingles "
                "for banding")
            for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lsh_steps(spark, idx: str):
    """Maintenance lifecycle over the persisted MinHash-LSH index —
    the shared ``lsm.py`` generation/pointer/marker protocol that all
    four persisted families (LSH, text, IVF, IVF-PQ) ride: full build
    (base generation + pointer publish), delta append (_COMMIT marker
    last), mutation upsert (root-addressed tombstones), delete,
    compaction (staged generation, pointer swap, GC), post-compact
    append. Each op is documented replay-safe (structural idempotency
    / orphan sweep) — this sweep proves the windows COMPOSE."""
    from cdc_data_pipeline_spark.operators import dedup_index as di
    from cdc_data_pipeline_spark.operators import lsm

    base = _lsh_docs(spark, "base", range(20))
    incoming = _lsh_docs(spark, "base", [100, 101])   # near-dups of base
    edited = _lsh_docs(spark, "edited", [3, 5])       # move bands
    dels = spark.createDataFrame([(7,), (101,)], "doc_id long")
    more = _lsh_docs(spark, "more", [200, 201])

    return [
        ("build", lambda: di.build_lsh_index(spark, base, idx)),
        ("append", lambda: di.append_lsh_index(spark, idx, incoming)),
        ("upsert", lambda: di.upsert_lsh_index(spark, idx, edited)),
        ("delete", lambda: di.delete_from_lsh_index(spark, idx, dels)),
        ("compact", lambda: lsm.compact_index(spark, idx)),
        ("append2", lambda: di.append_lsh_index(spark, idx, more)),
    ]


def _lsh_state(spark, idx: str) -> dict:
    """What the index PROMISES consumers (physical generation names
    carry random nonces, so layout is not compared): the visible doc
    set and the near-dup pairs a fixed probe batch finds."""
    from cdc_data_pipeline_spark.operators import dedup_index as di

    probes = _lsh_docs(spark, "base", [3, 7, 9, 200])
    pairs = sorted(tuple(r) for r in di.query_lsh_index(
        spark, idx, probes).select("id_new", "id_existing").collect())
    docs = sorted(r["doc_id"] for r in
                  di.read_index_docs(spark, idx).select("doc_id")
                  .collect())
    return {"pairs": pairs, "docs": docs}


def test_crash_sweep_lsm_index_protocol(spark, tmp_path, injector):
    """Kill the LSH-index maintenance lifecycle at every protocol FS
    mutation (pointer publishes, _COMMIT markers, renames), replay the
    crashed op, finish — the served state (visible docs + near-dup
    pairs for a fixed probe set) equals the fault-free golden run.
    One family suffices for the PROTOCOL: text/IVF/IVF-PQ share
    lsm.py's generation/pointer/marker machinery."""
    golden_idx = str(tmp_path / "golden_idx")
    ckpt = tmp_path / "ckpt"

    steps = _lsh_steps(spark, golden_idx)
    boundaries = [0]
    Path(golden_idx).mkdir()
    shutil.copytree(golden_idx, str(ckpt / "s0"))
    for i, (_name, run) in enumerate(steps):
        run()
        boundaries.append(injector.n)
        shutil.copytree(golden_idx, str(ckpt / f"s{i + 1}"))
    n_mutations = injector.n
    golden = _lsh_state(spark, golden_idx)
    assert golden["pairs"], "probe found no pairs — fixture too weak"
    assert 7 not in golden["docs"] and 101 not in golden["docs"]
    assert n_mutations >= 8, "index lifecycle unexpectedly thin"

    def step_of(k: int) -> int:
        for i in range(len(steps)):
            if boundaries[i] < k <= boundaries[i + 1]:
                return i
        raise AssertionError(k)

    idx = str(tmp_path / "run_idx")
    failures = []
    for k in range(1, n_mutations + 1):
        s = step_of(k)
        shutil.rmtree(idx, ignore_errors=True)
        shutil.copytree(str(ckpt / f"s{s}"), idx)
        run_steps = _lsh_steps(spark, idx)
        injector.n = boundaries[s]
        injector.fail_at = k
        try:
            with pytest.raises(InjectedCrash):
                run_steps[s][1]()
        except BaseException as exc:
            failures.append((k, run_steps[s][0], f"arm: {exc}"))
            injector.fail_at = None
            continue
        injector.fail_at = None
        try:
            for _name, run in run_steps[s:]:
                run()
            got = _lsh_state(spark, idx)
            assert got == golden, f"K={k} ({run_steps[s][0]})"
        except BaseException as exc:
            failures.append((k, run_steps[s][0], str(exc)[:200]))
    assert not failures, (
        f"{len(failures)}/{n_mutations} index crash points failed: "
        f"{failures[:5]}")
