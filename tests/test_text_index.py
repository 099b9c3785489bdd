"""Persisted inverted text index: exact parity with the in-flight
BM25, statistics exactness across appends, replay idempotency, and
token-bucket partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import text_index as ti
from cdc_data_pipeline_spark.operators.terms import bm25_topk
from cdc_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF0001


def _docs(spark):
    return read_table(spark, SF0001, "documents").select("doc_id", "text")


def test_index_search_matches_inflight_bm25(spark, tmp_path):
    docs = _docs(spark)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    path = str(tmp_path / "tix")
    info = ti.build_text_index(spark, docs, path)
    assert info["n_docs"] == docs.count() and info["n_postings"] > 0
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert got == want


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
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert got == want


def test_search_prunes_token_buckets(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    # a single-term query touches exactly one token bucket
    one = spark.createDataFrame([(999999, "zzz_unique_term")],
                                "doc_id long, text string")
    out = ti.search_text_index(spark, path, one, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the postings scan must carry the bucket IN-list as a PARTITION
    # filter (directory-level skip), not merely reference the column
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*tb[^\]]*IN?\b", plan) or \
        re.search(r"PartitionFilters: \[[^\]]*tb[^\]]*=", plan)
    assert m, f"no tb partition filter in scan:\n{plan[:2000]}"
    assert out.count() == 0  # unseen term matches nothing


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
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert got == want


def test_compact_folds_deltas_without_changing_results(spark, tmp_path):
    docs = _docs(spark)
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, parts[0], path)
    ti.append_to_text_index(spark, path, parts[1])
    ti.append_to_text_index(spark, path, parts[2])
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    before = sorted(map(tuple,
                        ti.search_text_index(spark, path, queries, k=5).collect()))
    # 2 committed deltas + base before; one folded base after
    assert len(ti._committed_deltas(spark, path, f"{path}/base")) == 2
    info = ti.compact_text_index(spark, path)
    assert info["compacted_deltas"] == 2
    assert ti._committed_deltas(spark, path, f"{path}/base") == []
    assert spark.read.parquet(f"{path}/base/stats").count() == 1
    vocab = spark.read.parquet(f"{path}/base/vocab")
    assert vocab.groupBy("token").count().filter("count > 1").count() == 0
    assert info["n_docs"] == docs.count()
    after = sorted(map(tuple,
                       ti.search_text_index(spark, path, queries, k=5).collect()))
    assert before == after


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
    from cdc_data_pipeline_spark.sources import fsutil
    marker = f"{path}/delta/{r['batch']}/{ti.COMMIT}"
    fsutil.delete(spark, marker)

    # uncommitted delta is invisible: search == base-only BM25
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(base, queries, k=5).collect()))
    assert got == want

    # replay: overwrites the same directory, commits, nothing doubled
    r2 = ti.append_to_text_index(spark, path, extra)
    assert r2["batch"] == r["batch"] and r2["appended"] == extra.count()
    got2 = sorted(map(tuple,
                      ti.search_text_index(spark, path, queries, k=5).collect()))
    want2 = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert got2 == want2


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
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(full, queries, k=5).collect()))
    assert got == want


def test_crash_after_compact_swap_cannot_double_count(spark, tmp_path):
    """The compacted.json manifest excludes folded deltas logically:
    even if the GC loop never ran (crash after the base swap), a
    still-present folded delta directory must not be read again."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    extra = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, base, path)
    r = ti.append_to_text_index(spark, path, extra)
    queries = docs.filter(F.col("doc_id") % 101 == 0)
    want = sorted(map(tuple,
                      ti.search_text_index(spark, path, queries, k=5).collect()))
    ti.compact_text_index(spark, path)
    # resurrect the folded delta as if GC had crashed before deleting it
    import shutil
    ddir = f"{path}/delta/{r['batch']}"
    ti.build_text_index(spark, extra, str(tmp_path / "donor"))
    shutil.copytree(str(tmp_path / "donor" / "base"), ddir)
    from cdc_data_pipeline_spark.sources import fsutil
    fsutil.write_text(spark, f"{ddir}/{ti.COMMIT}", "1")
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    assert got == want  # manifest keeps the leftover invisible
    # the next compact garbage-collects it and changes nothing
    ti.compact_text_index(spark, path)
    assert not fsutil.exists(spark, ddir)
    again = sorted(map(tuple,
                       ti.search_text_index(spark, path, queries, k=5).collect()))
    assert again == want


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
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(batch, queries, k=5).collect()))
    assert got == want


def test_rebuild_fully_rewrites_and_bucket_layout_is_immutable(spark, tmp_path):
    import pytest as _pytest

    docs = _docs(spark)
    path = str(tmp_path / "tix")
    ti.build_text_index(spark, docs, path)
    # rebuild over a 2-doc corpus: no stale postings may survive
    small = docs.filter(F.col("doc_id").isin([0, 101]))
    ti.build_text_index(spark, small, path)
    queries = small.filter(F.col("doc_id") == 0)
    got = sorted(map(tuple,
                     ti.search_text_index(spark, path, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(small, queries, k=5).collect()))
    assert got == want and len(got) <= 1
    with _pytest.raises(ValueError, match="n_buckets"):
        ti.build_text_index(spark, small, path, n_buckets=32)
