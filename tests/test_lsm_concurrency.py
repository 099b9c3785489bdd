"""Lost-update detection in the shared LSM publish protocol: a
compaction records the pointer value it resolved and ``publish_base``
re-checks it immediately before publishing, so two racing maintainers
turn from a silent lost update into a raised
``ConcurrentPublishError`` — the loser's staged generation stays
unpublished and the next successful publish sweeps it as an orphan.

(Reference parity note: the reference serializes maintenance through
one dagster run queue — dagster_code/clickhouse_load_tool — so it
never faces this race; an engine whose maintenance is plain library
calls must detect it itself.)
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import dedup_index as di
from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators import text_index as ti
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join
from cdc_data_pipeline_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_publish_base_guard_direct(spark, tmp_path):
    """The guard itself: a stale expectation raises BEFORE the pointer
    moves; a correct expectation publishes."""
    path = str(tmp_path / "guard")
    fsutil.publish_text(spark, path_join(path, lsm.BASE_PTR),
                        "base-0000000001")
    with pytest.raises(lsm.ConcurrentPublishError):
        lsm.publish_base(spark, path, "base-0000000002",
                         {"base-0000000002"}, [], expect_ptr=None)
    assert fsutil.read_text(
        spark, path_join(path, lsm.BASE_PTR)) == "base-0000000001"
    lsm.publish_base(spark, path, "base-0000000002", {"base-0000000002"},
                     [], expect_ptr="base-0000000001")
    assert fsutil.read_text(
        spark, path_join(path, lsm.BASE_PTR)) == "base-0000000002"


def _race(monkeypatch, inner_compact):
    """Patch ``lsm.publish_base`` so the FIRST publish attempt is
    preempted by a full competing compaction (writer B) that wins the
    pointer; the original caller (writer A) then publishes against its
    stale snapshot and must raise."""
    orig = lsm.publish_base
    state = {"raced": False}

    def racy(spark, path, *a, **k):
        if not state["raced"]:
            state["raced"] = True
            inner_compact()  # writer B resolves, folds, and publishes
        return orig(spark, path, *a, **k)

    monkeypatch.setattr(lsm, "publish_base", racy)
    return state


def test_racing_lsh_compactions_detected(spark, sf_dir, tmp_path,
                                         monkeypatch):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lshidx")
    di.build_lsh_index(spark, docs.filter(F.col("doc_id") % 2 == 0), path,
                       n_prefixes=16)
    di.append_lsh_index(spark, path, docs.filter(F.col("doc_id") % 2 == 1))

    probe = docs.limit(40)
    before = {(r[0], r[1]) for r in
              di.query_lsh_index(spark, path, probe).collect()}

    state = _race(monkeypatch, lambda: di.compact_lsh_index(spark, path))
    with pytest.raises(lsm.ConcurrentPublishError):
        di.compact_lsh_index(spark, path)
    assert state["raced"]
    monkeypatch.undo()

    # writer B's generation serves; answers unchanged
    winner = lsm.current_base_name(spark, path)
    assert winner is not None and winner.startswith("base-")
    after = {(r[0], r[1]) for r in
             di.query_lsh_index(spark, path, probe).collect()}
    assert after == before

    # the loser's staged generation is an orphan on disk until the
    # next successful publish sweeps it
    orphans = [n for n in lsm.base_names(spark, path) if n != winner]
    assert orphans, "loser must have staged a generation"
    di.compact_lsh_index(spark, path)
    remaining = lsm.base_names(spark, path)
    for n in orphans:
        assert n not in remaining or n == winner
    assert {(r[0], r[1]) for r in
            di.query_lsh_index(spark, path, probe).collect()} == before


def test_racing_text_compaction_detected(spark, sf_dir, tmp_path,
                                         monkeypatch):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs.filter(F.col("doc_id") % 2 == 0), path)
    ti.append_to_text_index(spark, path,
                            docs.filter(F.col("doc_id") % 2 == 1))

    queries = docs.filter(F.col("doc_id") % 101 == 0)
    before = {tuple(r) for r in
              ti.search_text_index(spark, path, queries, k=3).collect()}

    _race(monkeypatch, lambda: ti.compact_text_index(spark, path))
    with pytest.raises(lsm.ConcurrentPublishError):
        ti.compact_text_index(spark, path)
    monkeypatch.undo()

    after = {tuple(r) for r in
             ti.search_text_index(spark, path, queries, k=3).collect()}
    assert after == before


def test_racing_ann_compaction_detected(spark, sf_dir, tmp_path,
                                        monkeypatch):
    from cdc_data_pipeline_spark.operators import index as ix
    from cdc_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivfx")
    ix.build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), path,
                       n_cells=8, iters=1)
    ix.append_to_ivf_index(spark, path,
                           emb.filter(F.col("vec_id") % 2 == 1))

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    before = {tuple(r) for r in
              ix.query_ivf_index(spark, path, queries, k=3).collect()}

    _race(monkeypatch, lambda: ix.compact_ann_index(spark, path))
    with pytest.raises(lsm.ConcurrentPublishError):
        ix.compact_ann_index(spark, path)
    monkeypatch.undo()

    after = {tuple(r) for r in
             ix.query_ivf_index(spark, path, queries, k=3).collect()}
    assert after == before
