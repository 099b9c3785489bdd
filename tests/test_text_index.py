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
    assert "tb IN (" in plan or "tb#" in plan  # partition filter present
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
    # 3 delta row-sets -> one row per key after compaction
    assert spark.read.parquet(f"{path}/stats").count() == 3
    info = ti.compact_text_index(spark, path)
    assert spark.read.parquet(f"{path}/stats").count() == 1
    vocab = spark.read.parquet(f"{path}/vocab")
    assert vocab.count() == info["vocab_rows"]
    assert vocab.groupBy("token").count().filter("count > 1").count() == 0
    after = sorted(map(tuple,
                       ti.search_text_index(spark, path, queries, k=5).collect()))
    assert before == after
