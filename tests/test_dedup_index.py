"""Persisted MinHash-LSH dedup index on the shared LSM protocol:
equivalence with the one-shot path, directory-level pruning, and the
CDC surface (append / upsert / delete / compact) keeping candidate
pairs exactly equal to a fresh build over the net corpus."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from conftest import MOCKFS_PARAM

from cdc_data_pipeline_spark.operators import dedup as dd
from cdc_data_pipeline_spark.operators import dedup_index as di
from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def _pairs_set(df, a="id_a", b="id_b"):
    return {(min(r[0], r[1]), max(r[0], r[1])) for r in df.select(a, b).collect()}


def _query_pairs(spark, path, probe):
    return _pairs_set(di.query_lsh_index(spark, path, probe),
                      "id_existing", "id_new")


def _fresh_pairs(spark, net_docs, probe, tmp_path, tag, **kw):
    """Oracle: the same probe against an index freshly built over the
    net corpus."""
    p = str(tmp_path / f"oracle_{tag}")
    di.build_lsh_index(spark, net_docs, p, **kw)
    return _query_pairs(spark, p, probe)


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """index(batch1) queried with batch2, plus within-batch pairs,
    must equal one-shot LSH over the whole corpus."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    path = str(tmp_path / "lshidx")
    stats = di.build_lsh_index(spark, b1, path, n_prefixes=16)
    assert stats["n_docs"] == b1.count()

    cross = di.query_lsh_index(spark, path, b2)
    got = (_pairs_set(cross, "id_existing", "id_new")
           | _pairs_set(dd.lsh_candidate_pairs(b1))
           | _pairs_set(dd.lsh_candidate_pairs(b2)))
    want = _pairs_set(dd.lsh_candidate_pairs(docs))
    assert got == want
    assert want, "fixture corpus must contain near-dups for this test to bite"


def test_query_prunes_partitions(spark, sf_dir, tmp_path):
    """A small batch must read only its bucket-prefix directories: the
    scan's partition filter carries the IN-list, and the files the
    query touches are a strict subset of the index files."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lshidx2")
    di.build_lsh_index(spark, docs.filter(F.col("doc_id") % 3 != 0), path,
                       n_prefixes=32)
    small = docs.filter(F.col("doc_id") % 97 == 0)

    out = di.query_lsh_index(spark, path, small)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and di.PFX in plan

    _, base_root, _ = di._resolve(spark, path)
    bands = spark.read.parquet(f"{base_root}/bands")
    total_files = bands.select(F.input_file_name()).distinct().count()
    touched = (bands.filter(F.col(di.PFX).isin(
        [r[0] for r in di._with_pfx(
            dd.banded_signatures(small), 32).select(di.PFX)
            .distinct().collect()]))
        .select(F.input_file_name()).distinct().count())
    assert touched < total_files


def test_append_then_query_matches_rebuilt_index(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    inc_path = str(tmp_path / "inc")
    di.build_lsh_index(spark, b1, inc_path, n_prefixes=8)
    di.append_lsh_index(spark, inc_path, b2)

    full_path = str(tmp_path / "full")
    di.build_lsh_index(spark, docs, full_path, n_prefixes=8)

    got = _query_pairs(spark, inc_path, probe)
    want = _query_pairs(spark, full_path, probe)
    assert got == want


def test_append_is_idempotent_under_replay(spark, sf_dir, tmp_path):
    """An at-least-once redelivery of the same batch no-ops on the
    commit marker: one delta directory, no duplicate band rows, and
    query results unchanged."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "idem")
    di.build_lsh_index(spark, b1, path, n_prefixes=8)
    r1 = di.append_lsh_index(spark, path, b2)
    assert r1["appended"] == b2.count()
    before = _query_pairs(spark, path, probe)
    n_before = di.read_index_docs(spark, path).count()

    r2 = di.append_lsh_index(spark, path, b2)  # replay
    assert r2["appended"] == 0 and r2["batch"] == r1["batch"]
    assert _query_pairs(spark, path, probe) == before
    assert di.read_index_docs(spark, path).count() == n_before

    # already-visible ids inside a mixed batch are anti-joined away
    r3 = di.append_lsh_index(spark, path, docs)
    assert r3["appended"] == 0


def test_partial_write_replay_converges(spark, sf_dir, tmp_path):
    """A delta directory without its commit marker (writer crashed
    mid-write) is invisible; replaying the append overwrites the same
    directory and converges."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "crash")
    di.build_lsh_index(spark, b1, path, n_prefixes=8)
    base_pairs = _query_pairs(spark, path, probe)

    # simulate the crash: commit, then strip the marker
    r1 = di.append_lsh_index(spark, path, b2)
    fsutil.delete(spark, f"{path}/delta/{r1['batch']}/{di.COMMIT}")
    assert _query_pairs(spark, path, probe) == base_pairs  # invisible

    r2 = di.append_lsh_index(spark, path, b2)  # replay converges
    assert r2["batch"] == r1["batch"] and r2["appended"] == b2.count()
    assert _query_pairs(spark, path, probe) == \
        _fresh_pairs(spark, docs, probe, tmp_path, "crash", n_prefixes=8)


def test_upsert_replaces_signatures_exactly(spark, sf_dir, tmp_path):
    """A document whose text changed has its OLD signature rows
    tombstoned and its new rows live: post-upsert candidates equal a
    fresh build over the net corpus."""
    docs = _docs(spark, sf_dir)
    changed = docs.filter(F.col("doc_id") % 7 == 0) \
        .withColumn("text", F.concat(F.lit("totally rewritten xyzzy "),
                                     F.reverse("text")))
    net = docs.filter(F.col("doc_id") % 7 != 0).unionByName(changed)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "ups")
    di.build_lsh_index(spark, docs, path, n_prefixes=8)
    r = di.upsert_lsh_index(spark, path, changed)
    assert r["upserted"] == changed.count()
    assert r["replaced"] == changed.count()

    assert _query_pairs(spark, path, probe) == \
        _fresh_pairs(spark, net, probe, tmp_path, "ups", n_prefixes=8)
    # idempotent replay
    r2 = di.upsert_lsh_index(spark, path, changed)
    assert r2["upserted"] == 0 and r2["replaced"] == 0


def test_delete_then_reinsert(spark, sf_dir, tmp_path):
    """Deleted docs vanish from candidates with no data rewrite; a
    deleted id is legitimately re-insertable."""
    docs = _docs(spark, sf_dir)
    dead = docs.filter(F.col("doc_id") % 11 == 0)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "del")
    di.build_lsh_index(spark, docs, path, n_prefixes=8)
    r = di.delete_from_lsh_index(spark, path, dead.select("doc_id"))
    assert r["deleted"] == dead.count()

    live = {x[0] for x in di.read_index_docs(spark, path).collect()}
    assert not live & {x[0] for x in dead.select("doc_id").collect()}
    assert _query_pairs(spark, path, probe) == _fresh_pairs(
        spark, docs.filter(F.col("doc_id") % 11 != 0), probe,
        tmp_path, "del", n_prefixes=8)

    r2 = di.append_lsh_index(spark, path, dead)  # re-insert works
    assert r2["appended"] == dead.count()
    assert _query_pairs(spark, path, probe) == \
        _fresh_pairs(spark, docs, probe, tmp_path, "del2", n_prefixes=8)


def test_cdc_mixed_lifecycle_then_compact(spark, sf_dir, tmp_path):
    """Insert + upsert + delete deltas fold into one clean generation:
    results identical before/after, all deltas excluded, the grace
    generation GC'd by a second compaction."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    changed = docs.filter(F.col("doc_id") % 10 == 4) \
        .withColumn("text", F.concat(F.lit("fnord "), F.reverse("text")))
    dead = docs.filter(F.col("doc_id") % 10 == 6).select("doc_id")
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "mix")
    di.build_lsh_index(spark, b1, path, n_prefixes=8)
    di.append_lsh_index(spark, path, b2)
    di.upsert_lsh_index(spark, path, changed)
    di.delete_from_lsh_index(spark, path, dead)
    before = _query_pairs(spark, path, probe)
    n_live = di.read_index_docs(spark, path).count()

    gen0 = di._resolve(spark, path)[0]
    info = di.compact_lsh_index(spark, path)
    assert info["compacted_deltas"] == 3
    assert info["n_docs"] == n_live
    gen1, root1, pairs1 = di._resolve(spark, path)
    assert gen1 != gen0
    assert len(pairs1) == 1  # every delta folded
    assert _query_pairs(spark, path, probe) == before
    # the folded generation carries no tombstones at all
    assert not fsutil.exists(spark, f"{root1}/tombstones")

    assert fsutil.exists(spark, f"{path}/{gen0}")  # grace
    di.compact_lsh_index(spark, path)
    assert not fsutil.exists(spark, f"{path}/{gen0}")  # GC'd
    assert _query_pairs(spark, path, probe) == before


def test_query_snapshot_consistent_across_compaction(spark, sf_dir,
                                                     tmp_path):
    """A reader that resolved the pointer BEFORE a compaction still
    computes exact results afterward: its generation and admitted
    deltas survive one grace cycle."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "snap")
    di.build_lsh_index(spark, b1, path, n_prefixes=8)
    di.append_lsh_index(spark, path, b2)

    # resolve the snapshot, then compact underneath it
    name, base_root, pairs = di._resolve(spark, path)
    num_hashes, bands, shingle_k, n_prefixes = di._params(
        spark, path, base_root)
    di.compact_lsh_index(spark, path)

    qb = di._with_pfx(dd.banded_signatures(probe, "text", "doc_id",
                                           num_hashes, bands, shingle_k),
                      n_prefixes)
    prefixes = [r[0] for r in qb.select(di.PFX).distinct().collect()]
    idx = lsm.read_union_tagged(spark, pairs, "bands", di.PFX, prefixes)
    stale = lsm.visible(idx, lsm.kills(spark, pairs, "doc_id", di.PFX,
                                       prefixes), "doc_id")
    got = {(min(r[0], r[1]), max(r[0], r[1]))
           for r in stale.alias("i").join(
               qb.alias("q"),
               (F.col("i.band") == F.col("q.band"))
               & (F.col("i.bucket") == F.col("q.bucket"))
               & (F.col("i.doc_id") != F.col("q.doc_id")))
           .select(F.col("i.doc_id"), F.col("q.doc_id")).collect()}
    assert got == _query_pairs(spark, path, probe)


def test_legacy_layout_reads_mutates_and_migrates(spark, sf_dir, tmp_path):
    """A pre-pointer index (root-level bands + parquet meta) still
    queries, takes CDC mutations, and is migrated — then GC'd — by
    the first two compactions."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    # hand-build the legacy layout the old module produced
    path = str(tmp_path / "legacy")
    banded = di._with_pfx(dd.banded_signatures(b1, "text", "doc_id",
                                               8, 4, 3), 8)
    banded.write.mode("overwrite").partitionBy(di.PFX) \
        .parquet(f"{path}/bands")
    spark.createDataFrame(
        [(8, 4, 3, 8)],
        "num_hashes int, bands int, shingle_k int, n_prefixes int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    # reads and mutates in place
    assert _query_pairs(spark, path, probe) == _fresh_pairs(
        spark, b1, probe, tmp_path, "leg1", n_prefixes=8)
    di.append_lsh_index(spark, path, b2)
    dead = b1.limit(5).select("doc_id")
    di.delete_from_lsh_index(spark, path, dead)
    net = docs.join(dead, "doc_id", "left_anti")
    want = _fresh_pairs(spark, net, probe, tmp_path, "leg2", n_prefixes=8)
    assert _query_pairs(spark, path, probe) == want

    # first compact migrates to generation 0; legacy kept one grace
    di.compact_lsh_index(spark, path)
    assert fsutil.read_text(spark, f"{path}/{lsm.BASE_PTR}") is not None
    assert fsutil.exists(spark, f"{path}/bands")
    assert _query_pairs(spark, path, probe) == want
    # second compact GCs the legacy root tables
    di.compact_lsh_index(spark, path)
    assert not fsutil.exists(spark, f"{path}/bands")
    assert not fsutil.exists(spark, f"{path}/meta")
    assert _query_pairs(spark, path, probe) == want


def test_rebuild_changes_params_and_excludes_old_deltas(spark, sf_dir,
                                                        tmp_path):
    """A rebuild may change the banding parameters: the staged
    manifest excludes every old delta (rows signed under the old
    params never mix in), and params travel with the generation."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    path = str(tmp_path / "reb")
    di.build_lsh_index(spark, b1, path, num_hashes=8, bands=4,
                       n_prefixes=8)
    di.append_lsh_index(spark, path, b2)
    gen0 = di._resolve(spark, path)[0]

    di.build_lsh_index(spark, docs, path, num_hashes=12, bands=6,
                       n_prefixes=16)
    gen1, root1, pairs1 = di._resolve(spark, path)
    assert gen1 != gen0
    assert len(pairs1) == 1  # the old delta is excluded
    assert json.loads(fsutil.read_text(
        spark, f"{root1}/params.json"))["num_hashes"] == 12
    assert _query_pairs(spark, path, probe) == _fresh_pairs(
        spark, docs, probe, tmp_path, "reb", num_hashes=12, bands=6,
        n_prefixes=16)


@pytest.mark.parametrize("scheme", ["", "file://", MOCKFS_PARAM])
def test_lsh_roundtrip_under_scheme(spark, sf_dir, tmp_path, scheme):
    """The build/query/upsert/delete/compact cycle under a bare local
    path AND an explicit ``file://`` scheme root — every fsutil
    primitive (pointer publish included) must resolve both the same
    way through the Hadoop FileSystem."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    changed = docs.filter(F.col("doc_id") % 9 == 0) \
        .withColumn("text", F.concat(F.lit("rewritten qwerty "),
                                     F.reverse("text")))
    dead = docs.filter(F.col("doc_id") % 15 == 0).select("doc_id")
    probe = docs.limit(40)

    path = scheme + str(tmp_path / "schidx")
    di.build_lsh_index(spark, docs, path, n_prefixes=8)
    di.upsert_lsh_index(spark, path, changed)
    di.delete_from_lsh_index(spark, path, dead)
    net = (docs.filter(F.col("doc_id") % 9 != 0).unionByName(changed)
           .join(dead, "doc_id", "left_anti"))
    want = _fresh_pairs(spark, net, probe, tmp_path, f"sch{bool(scheme)}",
                        n_prefixes=8)
    assert _query_pairs(spark, path, probe) == want
    di.compact_lsh_index(spark, path)
    assert _query_pairs(spark, path, probe) == want


def test_streaming_cdc_upsert_delete_into_lsh_index(spark, sf_dir,
                                                    tmp_path):
    """The full CDC stream shape: micro-batches carrying updates AND
    deletes (boolean delete flag, the normalized Debezium ``op = d``)
    flow through ``stream_upsert_to_lsh_index``; after the stream
    drains, candidate pairs equal a fresh build over the net corpus."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_lsh_index)

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "lsh_cdc")
    di.build_lsh_index(spark, docs, path, n_prefixes=8)

    upd = docs.filter(F.col("doc_id") % 6 == 0) \
        .withColumn("text", F.concat(F.lit("rev2 qux "), F.col("text"))) \
        .withColumn("is_deleted", F.lit(False))
    dels = docs.filter(F.col("doc_id") % 6 == 2) \
        .withColumn("is_deleted", F.lit(True))
    changes = upd.unionByName(dels)
    src = str(tmp_path / "incoming")
    changes.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(changes.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = stream_upsert_to_lsh_index(stream, path, str(tmp_path / "ck"),
                                   delete_col="is_deleted")
    q.awaitTermination(120)

    net = (docs.filter(F.col("doc_id") % 6 == 4)
           .unionByName(upd.drop("is_deleted")))
    probe = net.filter(F.col("doc_id") % 13 == 0)
    assert _query_pairs(spark, path, probe) == _fresh_pairs(
        spark, net, probe, tmp_path, "stream", n_prefixes=8)


def test_index_stats_maintenance_signal(spark, sf_dir, tmp_path):
    """``lsm.index_stats`` tracks the compaction signal through the
    lifecycle: fresh build -> 0 deltas; mutations -> delta and
    tombstone counts rise; compact -> 0 deltas again (grace generation
    still on disk), second compact -> grace GC'd."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "statsidx")
    di.build_lsh_index(spark, docs.filter(F.col("doc_id") % 2 == 0),
                       path, n_prefixes=8)
    s0 = lsm.index_stats(spark, path)
    assert s0["kind"] == "lsh" and s0["n_deltas"] == 0 \
        and s0["generation"].startswith("base-")

    di.append_lsh_index(spark, path,
                        docs.filter(F.col("doc_id") % 2 == 1))
    di.delete_from_lsh_index(
        spark, path, docs.filter(F.col("doc_id") % 12 == 0)
        .select("doc_id"))
    s1 = lsm.index_stats(spark, path)
    assert s1["n_deltas"] == 2 and s1["n_tombstone_deltas"] == 1

    di.compact_lsh_index(spark, path)
    s2 = lsm.index_stats(spark, path)
    assert s2["n_deltas"] == 0 and s2["generation"] != s0["generation"]
    assert s2["n_generations"] == 2  # new + grace
    di.compact_lsh_index(spark, path)
    assert lsm.index_stats(spark, path)["n_generations"] == 2


def test_stream_compact_over_bounds_deltas(spark, sf_dir, tmp_path):
    """In-stream maintenance: with ``compact_over=1`` the sink folds
    whenever more than one delta is unfolded, so a multi-batch stream
    ends with bounded read amplification AND exact results."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_lsh_index)

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "lsh_autocompact")
    di.build_lsh_index(spark, docs, path, n_prefixes=8)

    upd = docs.filter(F.col("doc_id") % 4 == 0) \
        .withColumn("text", F.concat(F.lit("rev3 zork "), F.col("text")))
    src = str(tmp_path / "incoming")
    upd.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(upd.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_upsert_to_lsh_index(stream, path, str(tmp_path / "ck"),
                                   compact_over=1)
    q.awaitTermination(180)

    st = lsm.index_stats(spark, path)
    assert st["n_deltas"] <= 1, st
    assert st["generation"] != "base-0000000000"  # at least one fold

    net = docs.filter(F.col("doc_id") % 4 != 0).unionByName(
        upd.select("doc_id", "text"))
    probe = net.filter(F.col("doc_id") % 13 == 0)
    assert _query_pairs(spark, path, probe) == _fresh_pairs(
        spark, net, probe, tmp_path, "autoc", n_prefixes=8)
