"""Persisted inverted text index: exact parity with the in-flight
BM25, statistics exactness across appends, replay idempotency,
token-bucket partition pruning, and the generation/pointer protocol
(atomic publish, one-generation GC grace, orphan sweep, legacy-layout
fallback, manifest-collision salting).

Parity tests draw their queries FROM the corpus, so they compare
against the self-excluding ``bm25_topk`` with ``exclude_self=True``
(the more-like-this shape); the serving default ``exclude_self=False``
is pinned separately by ``test_self_hit_kept_by_default``.
"""

from __future__ import annotations

import pytest

from conftest import MOCKFS_PARAM
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import text_index as ti
from cdc_data_pipeline_spark.operators.terms import bm25_topk
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF0001


def _docs(spark):
    return read_table(spark, SF0001, "documents").select("doc_id", "text")


def _search(spark, path, queries, **kw):
    """Corpus-drawn-query search, sorted for comparison."""
    kw.setdefault("exclude_self", True)
    return sorted(map(tuple,
                      ti.search_text_index(spark, path, queries, k=5,
                                           **kw).collect()))


def _bm25(docs, queries):
    return sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))


def test_index_search_matches_inflight_bm25(spark, tmp_path):
    docs = _docs(spark)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    path = str(tmp_path / "tix")
    info = ti.build_text_index(spark, docs, path)
    assert info["n_docs"] == docs.count() and info["n_postings"] > 0
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_append_updates_stats_exactly_and_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    extra = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    queries = docs.filter(F.col("doc_id") % 101 == 0)

    r1 = ti.append_to_text_index(spark, path, extra)
    assert r1["appended"] == extra.count()
    # replayed batch appends nothing (at-least-once redelivery)
    r2 = ti.append_to_text_index(spark, path, extra)
    assert r2["appended"] == 0

    # post-append search == a fresh index over the full corpus: df,
    # n_docs and total_len must all reflect the appended batch exactly
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_search_prunes_token_buckets(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    # a SEEN single-term query: with the lazy (non-materialized) plan
    # the postings scan must carry the bucket IN-list as a PARTITION
    # filter (directory-level skip), not merely reference the column
    from cdc_data_pipeline_spark.functions.text import tokens as _toks
    seen_tok = (docs.select(F.explode(_toks("text")).alias("t"))
                .filter(F.length("t") > 2).limit(1).collect()[0]["t"])
    one = spark.createDataFrame([(999999, seen_tok)],
                                "doc_id long, text string")
    out = ti.search_text_index(spark, path, one, k=5,
                               materialize_candidates=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*tb[^\]]*IN?\b", plan) or \
        re.search(r"PartitionFilters: \[[^\]]*tb[^\]]*=", plan)
    assert m, f"no tb partition filter in scan:\n{plan[:2000]}"
    assert out.count() > 0  # the seen term matches its own documents

    # an UNSEEN term survives no candidate at all: the empty doc-bucket
    # IN-list constant-folds the whole plan away — zero rows, and no
    # parquet scan left in the executed plan
    unseen = spark.createDataFrame([(999999, "zzz_unique_term")],
                                   "doc_id long, text string")
    out2 = ti.search_text_index(spark, path, unseen, k=5)
    assert out2.count() == 0
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan2


def test_streaming_ingest_into_text_index(spark, tmp_path):
    """readStream parquet -> foreachBatch append: after the stream
    drains, search over the maintained index equals in-flight BM25
    over the full corpus (statistics exact across streamed batches)."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_append_to_text_index)

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "tix_stream")
    ti.build_text_index(spark, base, path)

    src = str(tmp_path / "incoming")
    new.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(new.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = stream_append_to_text_index(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(120)

    queries = docs.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_compact_folds_deltas_without_changing_results(spark, tmp_path):
    docs = _docs(spark)
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, parts[0], path)
    ti.append_to_text_index(spark, path, parts[1])
    ti.append_to_text_index(spark, path, parts[2])
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    before = _search(spark, path, queries)
    # 2 committed deltas admitted by the published generation before
    assert len(ti._committed_deltas(
        spark, path, ti._base_root(spark, path))) == 2
    info = ti.compact_text_index(spark, path)
    assert info["compacted_deltas"] == 2
    # after: the NEW generation's manifest admits no delta (the folded
    # directories may remain on disk for the grace cycle — they are
    # logically excluded either way)
    root = ti._base_root(spark, path)
    assert ti._committed_deltas(spark, path, root) == []
    assert spark.read.parquet(f"{root}/stats").count() == 1
    vocab = spark.read.parquet(f"{root}/vocab")
    assert vocab.groupBy("token").count().filter("count > 1").count() == 0
    assert info["n_docs"] == docs.count()
    assert _search(spark, path, queries) == before


def test_partial_write_replay_converges(spark, tmp_path):
    """The crash-between-writes shape: a delta directory written
    WITHOUT its commit marker (any partial prefix of the sub-table
    writes) must be invisible to search, and replaying the same batch
    must converge to exactly one committed copy."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    extra = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    queries = docs.filter(F.col("doc_id") % 101 == 0)

    # simulate the crash: perform the append, then delete the marker
    # (equivalent to dying after the table writes, before the commit)
    r = ti.append_to_text_index(spark, path, extra)
    marker = f"{path}/delta/{r['batch']}/{ti.COMMIT}"
    fsutil.delete(spark, marker)

    # uncommitted delta is invisible: search == base-only BM25
    assert _search(spark, path, queries) == _bm25(base, queries)

    # replay: overwrites the same directory, commits, nothing doubled
    r2 = ti.append_to_text_index(spark, path, extra)
    assert r2["batch"] == r["batch"] and r2["appended"] == extra.count()
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_batch_duplicates_and_empty_text_docs(spark, tmp_path):
    """Duplicate ids inside one batch collapse to one document, and
    token-less documents still count in n_docs (diluting avgdl) while
    replays add nothing."""
    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta")],
        "doc_id long, text string")
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    batch = spark.createDataFrame(
        [(3, "beta beta zeta"), (3, "beta beta zeta"), (4, "")],
        "doc_id long, text string")
    assert ti.append_to_text_index(spark, path, batch)["appended"] == 2
    assert ti.append_to_text_index(spark, path, batch)["appended"] == 0
    # full-corpus equivalence INCLUDING the empty doc's n_docs effect
    full = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"),
         (3, "beta beta zeta"), (4, "")],
        "doc_id long, text string")
    queries = full.filter(F.col("doc_id") == 1)
    assert _search(spark, path, queries) == _bm25(full, queries)


def test_crash_after_compact_swap_cannot_double_count(spark, tmp_path):
    """The compacted.json manifest excludes folded deltas logically:
    even if the GC loop never ran (crash after the pointer publish), a
    still-present folded delta directory must not be read again."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    extra = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    r = ti.append_to_text_index(spark, path, extra)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    want = _search(spark, path, queries)
    ti.compact_text_index(spark, path)
    # resurrect the folded delta as if GC had crashed before deleting
    # it (under grace it is in fact retained; rebuild it from a donor
    # to make the shape explicit and GC-independent)
    import shutil
    ddir = f"{path}/delta/{r['batch']}"
    fsutil.delete(spark, ddir)
    donor = str(tmp_path / "donor")
    ti.build_text_index(spark, extra, donor)
    shutil.copytree(ti._base_root(spark, donor), ddir)
    fsutil.delete(spark, f"{ddir}/compacted.json")
    fsutil.write_text(spark, f"{ddir}/{ti.COMMIT}", "1")
    assert _search(spark, path, queries) == want  # manifest hides it
    # the next compact garbage-collects it and changes nothing
    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, ddir)
    assert _search(spark, path, queries) == want


def test_null_text_batches_get_distinct_digests(spark, tmp_path):
    """Two different batches whose text is NULL must not collide on
    the content digest (the concat-based digest nulled the whole row
    hash; the structural hash keeps the id contribution)."""
    path = str(tmp_path / "tix")
    ti.build_text_index(
        spark, spark.createDataFrame([(1, "alpha beta")],
                                     "doc_id long, text string"), path)
    b1 = spark.createDataFrame([(10, None)], "doc_id long, text string")
    b2 = spark.createDataFrame([(20, None)], "doc_id long, text string")
    r1 = ti.append_to_text_index(spark, path, b1)
    r2 = ti.append_to_text_index(spark, path, b2)
    assert r1["batch"] != r2["batch"]
    assert r1["appended"] == 1 and r2["appended"] == 1


def test_empty_index_bootstraps_from_first_append(spark, tmp_path):
    """The streaming bootstrap shape: build over an empty corpus, then
    the first appended batch must index cleanly."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "tix")
    assert ti.build_text_index(spark, empty, path)["n_docs"] == 0
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta")],
        "doc_id long, text string")
    assert ti.append_to_text_index(spark, path, batch)["appended"] == 2
    queries = batch.filter(F.col("doc_id") == 1)
    assert _search(spark, path, queries) == _bm25(batch, queries)


def test_rebuild_fully_rewrites_and_bucket_layout_is_immutable(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    # rebuild over a 2-doc corpus: no stale postings may survive
    small = docs.filter(F.col("doc_id").isin([0, 101]))
    ti.build_text_index(spark, small, path)
    queries = small.filter(F.col("doc_id") == 0)
    got = _search(spark, path, queries)
    assert got == _bm25(small, queries) and len(got) <= 1
    with pytest.raises(ValueError, match="n_buckets"):
        ti.build_text_index(spark, small, path, n_buckets=32)


# ------------------------------------------- generation/pointer protocol


def test_self_hit_kept_by_default(spark, tmp_path):
    """Serving default ``exclude_self=False``: a query id that
    coincides with a corpus doc_id keeps its (legitimate) self-hit —
    the external-id-space contract, where the coincidence carries no
    more-like-this meaning."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "zeta eta")],
        "doc_id long, text string")
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    queries = spark.createDataFrame([(1, "alpha beta gamma")],
                                    "doc_id long, text string")
    rows = (ti.search_text_index(spark, path, queries, k=5)
            .orderBy("rank").collect())
    assert rows[0]["neighbor_id"] == 1 and rows[0]["rank"] == 1
    # and the more-like-this flag drops exactly that hit
    excl = _search(spark, path, queries)
    assert all(r[1] != 1 for r in excl)


def test_search_snapshot_consistent_across_compaction(spark, tmp_path):
    """A search plan that resolved the pointer BEFORE a compaction
    still collects exact results afterwards: the resolved generation
    and the deltas its manifest admits survive one full grace cycle."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    extra = docs.filter(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    ti.append_to_text_index(spark, path, extra)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    want = _search(spark, path, queries)
    pending = ti.search_text_index(spark, path, queries, k=5,
                                   exclude_self=True)
    ti.compact_text_index(spark, path)  # publishes a new generation
    assert sorted(map(tuple, pending.collect())) == want


def test_second_compaction_gcs_grace_generation(spark, tmp_path):
    """One-generation grace: the superseded generation (and the deltas
    it admitted) survive the compaction that superseded them and are
    garbage-collected only by the NEXT one."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    extra = docs.filter(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    gen0 = ti._current_base_name(spark, path)
    r = ti.append_to_text_index(spark, path, extra)
    ddir = f"{path}/delta/{r['batch']}"
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    want = _search(spark, path, queries)

    ti.compact_text_index(spark, path)
    gen1 = ti._current_base_name(spark, path)
    assert gen1 != gen0
    assert fsutil.exists(spark, f"{path}/{gen0}")  # grace-retained
    assert fsutil.exists(spark, ddir)

    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, f"{path}/{gen0}")
    assert not fsutil.exists(spark, ddir)
    assert _search(spark, path, queries) == want


def test_orphan_staged_generation_swept(spark, tmp_path):
    """A crash between staging a new generation and publishing the
    pointer leaves an orphan ``base-<gen>`` the pointer never names;
    the next successful publish sweeps it."""
    docs = _docs(spark).filter(F.col("doc_id") % 7 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    cur = ti._current_base_name(spark, path)
    orphan = f"{path}/base-0000000099"
    fsutil.mkdirs(spark, orphan)
    fsutil.write_text(spark, f"{orphan}/compacted.json", "[]")
    queries = docs.limit(2)
    want = _search(spark, path, queries)
    assert _search(spark, path, queries) == want  # orphan invisible
    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, orphan)
    assert ti._current_base_name(spark, path) not in (cur, "base-0000000099")
    assert _search(spark, path, queries) == want


def test_legacy_base_layout_reads_and_migrates(spark, tmp_path):
    """An index written by the pre-pointer protocol (un-generationed
    ``{path}/base``, no BASE file) reads correctly, accepts appends,
    and migrates to the pointer protocol on its first compaction."""
    import shutil

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, a, path)
    # retro-fit the legacy layout: move the published generation to
    # {path}/base and drop the pointer
    gen = ti._current_base_name(spark, path)
    shutil.move(f"{path}/{gen}", f"{path}/base")
    fsutil.delete(spark, f"{path}/{ti.BASE_PTR}")
    assert ti._current_base_name(spark, path) == "base"

    queries = docs.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(a, queries)
    ti.append_to_text_index(spark, path, b)
    assert _search(spark, path, queries) == _bm25(docs, queries)

    ti.compact_text_index(spark, path)  # migrates: publishes a pointer
    assert ti._current_base_name(spark, path).startswith("base-")
    assert fsutil.exists(spark, f"{path}/base")  # grace-retained
    assert _search(spark, path, queries) == _bm25(docs, queries)
    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, f"{path}/base")
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_reappend_after_rebuild_is_searchable(spark, tmp_path):
    """Manifest-collision salting: after a rebuild permanently
    excluded a folded delta BY NAME (grace keeps its directory and
    stale ``_COMMIT`` on disk), re-appending the same batch content
    must not be swallowed by the stale marker — the docs must index
    under a salted delta name."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, a, path)
    r1 = ti.append_to_text_index(spark, path, b)
    assert r1["appended"] == b.count()

    # rebuild over `a` only: b's delta is excluded by the new
    # generation's manifest but its directory (with _COMMIT) survives
    ti.build_text_index(spark, a, path)
    assert fsutil.exists(spark, f"{path}/delta/{r1['batch']}/{ti.COMMIT}")
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(a, queries)

    r2 = ti.append_to_text_index(spark, path, b)
    assert r2["appended"] == b.count()
    assert r2["batch"] != r1["batch"]  # salted past the excluded name
    assert _search(spark, path, queries) == _bm25(docs, queries)

    # compaction folds the salted delta and GCs the stale one; a
    # further replay converges to zero new docs
    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, f"{path}/delta/{r1['batch']}")
    assert ti.append_to_text_index(spark, path, b)["appended"] == 0
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_exclude_pairs_backfills_like_inflight(spark, tmp_path):
    """Hard-negative-mining parity: the persisted search with
    ``exclude_pairs`` must equal ``bm25_topk`` with the same pairs —
    excluded neighbors never consume a result slot."""
    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    base = ti.search_text_index(spark, path, queries, k=5,
                                exclude_self=True)
    pairs = spark.createDataFrame(
        [(r["query_id"], r["neighbor_id"])
         for r in base.filter(F.col("rank") == 1).collect()],
        "id_a long, id_b long")
    got = sorted(map(tuple, ti.search_text_index(
        spark, path, queries, k=5, exclude_self=True,
        exclude_pairs=pairs).collect()))
    want = sorted(map(tuple, bm25_topk(
        docs, queries, k=5, exclude_pairs=pairs).collect()))
    assert got == want
    banned = {(a, b) for a, b in pairs.collect()}
    assert all((q, n) not in banned for q, n, _, _ in got)


def test_streaming_cdc_upsert_delete_into_text_index(spark, tmp_path):
    """The full CDC stream shape: micro-batches carrying updates AND
    deletes (boolean delete flag, the normalized Debezium ``op = d``)
    flow through ``stream_upsert_to_text_index``; after the stream
    drains, search equals in-flight BM25 over the net corpus."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_text_index)

    docs = _docs(spark).filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "tix_cdc")
    ti.build_text_index(spark, docs, path)

    upd = docs.filter(F.col("doc_id") % 6 == 0) \
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2"))) \
        .withColumn("is_deleted", F.lit(False))
    dels = docs.filter(F.col("doc_id") % 6 == 2) \
        .withColumn("is_deleted", F.lit(True))
    changes = upd.unionByName(dels)
    src = str(tmp_path / "incoming")
    changes.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(changes.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = stream_upsert_to_text_index(stream, path, str(tmp_path / "ck"),
                                    delete_col="is_deleted")
    q.awaitTermination(120)

    net = (docs.filter(F.col("doc_id") % 6 == 4)
           .unionByName(upd.drop("is_deleted")))
    queries = net.filter(F.col("doc_id") % 50 == 0)
    assert _search(spark, path, queries) == _bm25(net, queries)


def test_stream_batch_mixed_ops_per_id_respects_order_col(spark,
                                                          tmp_path):
    """One micro-batch carrying SEVERAL ops for the same id (the
    routine Debezium shape): with ``order_col`` the sink collapses to
    each id's LATEST op before splitting deletes from upserts, so an
    upsert followed by a later delete ends with the id GONE (pre-r7
    the upsert re-inserted after the delete and the delete was
    silently lost), while a delete followed by a later upsert keeps
    the new version."""
    from cdc_data_pipeline_spark.streaming.cdc import (
        stream_upsert_to_text_index)

    docs = _docs(spark).filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    ids = sorted(r[0] for r in docs.select("doc_id").limit(2).collect())
    id_gone, id_kept = ids[0], ids[1]

    changes = spark.createDataFrame(
        [(id_gone, "doomed update qqq", False, 1),
         (id_gone, None, True, 2),           # later delete WINS
         (id_kept, None, True, 1),
         (id_kept, "resurrected zxqv text", False, 2)],  # later upsert WINS
        "doc_id long, text string, is_deleted boolean, ts long")
    src = str(tmp_path / "incoming")
    changes.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = stream_upsert_to_text_index(stream, path, str(tmp_path / "ck"),
                                    delete_col="is_deleted",
                                    order_col="ts")
    q.awaitTermination(120)

    net = (docs.filter(~F.col("doc_id").isin(id_gone, id_kept))
           .unionByName(spark.createDataFrame(
               [(id_kept, "resurrected zxqv text")],
               "doc_id long, text string")))
    queries = net.limit(5)
    assert _search(spark, path, queries) == _bm25(net, queries)


# ------------------------------------------------- CDC upsert / delete


def test_upsert_replaces_documents_exactly(spark, tmp_path):
    """Latest-wins upsert: after replacing every 5th document's text,
    search must equal in-flight BM25 over the NET corpus — postings,
    df, n_docs, and total_len all re-priced (the reference's
    delete+insert merge applied to the inverted index)."""
    docs = _docs(spark)
    stale = docs.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.lit("zzz stale zzz "), F.col("text")))
        .otherwise(F.col("text")))
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, stale, path)
    fresh = docs.filter(F.col("doc_id") % 5 == 0)
    r = ti.upsert_into_text_index(spark, path, fresh)
    assert r["upserted"] == fresh.count() == r["replaced"]
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(docs, queries)
    # replay: op-prefixed digest no-ops on the committed marker
    r2 = ti.upsert_into_text_index(spark, path, fresh)
    assert r2["upserted"] == 0 and r2["batch"] == r["batch"]
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_upsert_mixes_new_and_replaced(spark, tmp_path):
    docs = _docs(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, half, path)
    # batch = every 4th doc: half already present (replaced with the
    # SAME text), half brand new
    batch = docs.filter(F.col("doc_id") % 4 == 1).unionByName(
        docs.filter(F.col("doc_id") % 4 == 0))
    r = ti.upsert_into_text_index(spark, path, batch)
    assert r["upserted"] == batch.count()
    assert r["replaced"] == docs.filter(F.col("doc_id") % 4 == 0).count()
    net = half.unionByName(docs.filter(F.col("doc_id") % 4 == 1))
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(net, queries)


def test_second_upsert_of_same_id(spark, tmp_path):
    """Two successive updates of one document across two deltas: the
    root-addressed tombstones leave exactly one visible copy with no
    ordering metadata needed."""
    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")],
        "doc_id long, text string")
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    ti.upsert_into_text_index(spark, path, spark.createDataFrame(
        [(1, "alpha epsilon")], "doc_id long, text string"))
    ti.upsert_into_text_index(spark, path, spark.createDataFrame(
        [(1, "zeta eta theta")], "doc_id long, text string"))
    net = spark.createDataFrame(
        [(1, "zeta eta theta"), (2, "gamma delta")],
        "doc_id long, text string")
    queries = net
    assert _search(spark, path, queries) == _bm25(net, queries)
    # and compaction resolves all tombstones without changing results
    ti.compact_text_index(spark, path)
    assert _search(spark, path, queries) == _bm25(net, queries)
    root = ti._base_root(spark, path)
    assert not fsutil.exists(spark, f"{root}/tombstones")


def test_delete_reprices_statistics_and_allows_reinsert(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    gone = docs.filter(F.col("doc_id") % 3 == 0)
    r = ti.delete_from_text_index(spark, path, gone.select("doc_id"))
    assert r["deleted"] == gone.count()
    kept = docs.filter(F.col("doc_id") % 3 != 0)
    queries = kept.filter(F.col("doc_id") % 101 == 0)
    assert _search(spark, path, queries) == _bm25(kept, queries)
    # deleting the same ids again touches nothing (no visible copies)
    r2 = ti.delete_from_text_index(spark, path, gone.select("doc_id"))
    assert r2["deleted"] == 0
    # a deleted id is re-insertable through the plain append path
    assert ti.append_to_text_index(spark, path, gone)["appended"] == \
        gone.count()
    assert _search(spark, path, queries) == _bm25(docs, queries)


def test_cdc_mixed_stream_then_compact(spark, tmp_path):
    """Insert + upsert + delete deltas stacked, searched, compacted,
    searched again: results equal in-flight BM25 over the net corpus
    at every step (the full CDC lifecycle on the persisted index)."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 4 == 0)      # base
    b = docs.filter(F.col("doc_id") % 4 == 1)      # inserted
    c = docs.filter(F.col("doc_id") % 4 == 2)      # upserted (new)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, a, path)
    ti.append_to_text_index(spark, path, b)
    ti.upsert_into_text_index(spark, path, c)
    # replace half of b via upsert with changed text
    b_new = b.filter(F.col("doc_id") % 8 == 1) \
        .withColumn("text", F.concat(F.col("text"), F.lit(" updated")))
    ti.upsert_into_text_index(spark, path, b_new)
    # delete half of a
    a_gone = a.filter(F.col("doc_id") % 8 == 0)
    ti.delete_from_text_index(spark, path, a_gone.select("doc_id"))

    net = (a.join(a_gone.select("doc_id"), "doc_id", "left_anti")
           .unionByName(b.filter(F.col("doc_id") % 8 != 1))
           .unionByName(b_new).unionByName(c))
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    want = _bm25(net, queries)
    assert _search(spark, path, queries) == want
    info = ti.compact_text_index(spark, path)
    assert info["n_docs"] == net.count()
    assert _search(spark, path, queries) == want
    # second compact GCs grace dirs; still exact
    ti.compact_text_index(spark, path)
    assert _search(spark, path, queries) == want


@pytest.mark.parametrize("scheme", ["", "file://", MOCKFS_PARAM])
def test_index_roundtrip_under_scheme(spark, tmp_path, scheme):
    """The full build/search/append/compact/search cycle under a bare
    local path AND an explicit ``file://`` scheme root — every fsutil
    primitive (pointer publish included) must resolve both the same
    way through the Hadoop FileSystem."""
    docs = _docs(spark).filter(F.col("doc_id") % 7 == 0)
    half = docs.filter(F.col("doc_id") % 14 == 0)
    rest = docs.filter(F.col("doc_id") % 14 != 0)
    path = scheme + str(tmp_path / "tix")
    ti.build_text_index(spark, half, path)
    queries = docs.limit(3)
    assert _search(spark, path, queries) == _bm25(half, queries)
    ti.append_to_text_index(spark, path, rest)
    want = _bm25(docs, queries)
    assert _search(spark, path, queries) == want
    ti.compact_text_index(spark, path)
    assert _search(spark, path, queries) == want
