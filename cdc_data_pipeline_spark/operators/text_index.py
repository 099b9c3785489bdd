"""Persisted inverted text index: build once, BM25-search with
partition pruning, maintain incrementally — the lexical sibling of the
persisted ANN indexes (``operators/index.py``), completing the quartet
(MinHash-LSH, IVF, IVF-PQ, inverted text).

``terms.bm25_topk`` recomputes postings per query batch — right for
one-shot jobs, wrong for a serving corpus written once and queried
forever. This module materializes the index as TABLES:

    <path>/postings/tb=N/   (token, doc_id, tf), partitioned by the
                            token's hash bucket — a query touches only
                            its own terms' buckets (directory-level
                            skip, the disk analogue of posting lists)
    <path>/doclens/db=N/    (doc_id, dl), partitioned by the doc's
                            hash bucket (append-dedup reads only the
                            batch's own buckets)
    <path>/vocab/tb=N/      (token, df) PER-BATCH DELTA rows
    <path>/stats/           (n_docs, total_len) PER-BATCH DELTA rows

vocab and stats are append-only DELTAS (LSM-style): an append never
rewrites an existing file, and query time sums the deltas it needs —
the vocab slice for the probed buckets (query-vocabulary-sized) and
the stats rows (one per batch). Search therefore always scores
against EXACT current df / n_docs / total_len — incremental appends
shift idf and avgdl for every document, and this layout prices that
correctly instead of serving stale statistics.

Scale: the postings write is the only full-corpus shuffle; search
reads probed token buckets + the doc-length table (doc-keyed join,
high cardinality); scoring reuses ``terms.score_bm25_postings`` (the
hoisted-factor plan with the skew-safe group_topk rank).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens
from cdc_data_pipeline_spark.operators.terms import score_bm25_postings


def _tb(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(16)).cast("int")


def build_text_index(spark: SparkSession, corpus: DataFrame, path: str,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Tokenize, aggregate, and persist the four index tables.
    Returns {n_docs, n_postings}."""
    ex = corpus.select(F.col(id_col),
                       F.explode(tokens(text_col)).alias("token"))
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")) \
           .localCheckpoint(eager=True)  # one tokenize pass feeds all 4 tables
    (tf.withColumn("tb", _tb(F.col("token")))
       .write.mode("overwrite").partitionBy("tb")
       .parquet(os.path.join(path, "postings")))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    (dl.withColumn("db", _tb(F.col(id_col)))
       .write.mode("overwrite").partitionBy("db")
       .parquet(os.path.join(path, "doclens")))
    (tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
       .withColumn("tb", _tb(F.col("token")))
       .write.mode("overwrite").partitionBy("tb")
       .parquet(os.path.join(path, "vocab")))
    stats = (corpus.agg(F.count(F.lit(1)).alias("n_docs"))
             .crossJoin(dl.agg(F.coalesce(F.sum("dl"), F.lit(0))
                               .alias("total_len"))))
    stats.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "stats"))
    return {"n_docs": int(stats.collect()[0]["n_docs"]),
            "n_postings": tf.count()}


def search_text_index(spark: SparkSession, path: str, queries: DataFrame,
                      k: int = 5, k1: float = 1.2, b: float = 0.75,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k over the persisted index, touching only the query
    vocabulary's postings/vocab buckets. Output matches
    ``terms.bm25_topk`` exactly on the same corpus
    (query_id, neighbor_id, bm25, rank)."""
    qt = (queries.select(F.col(id_col).alias("query_id"),
                         F.explode(tokens(text_col)).alias("token"))
          .distinct().localCheckpoint(eager=True))
    # probed bucket set: <= |query vocabulary| ids, driver-side and
    # tiny — becomes a static IN-filter so the scans prune unprobed
    # tb= directories before any file is opened
    buckets = [r[0] for r in
               qt.select(_tb(F.col("token")).alias("tb")).distinct().collect()]
    postings = (spark.read.parquet(os.path.join(path, "postings"))
                .filter(F.col("tb").isin(buckets))
                .select(F.col(id_col), "token", "tf"))
    # vocab deltas -> exact current df for the probed vocabulary
    dfreq = (spark.read.parquet(os.path.join(path, "vocab"))
             .filter(F.col("tb").isin(buckets))
             .groupBy("token").agg(F.sum("df").alias("df")))
    dl = (spark.read.parquet(os.path.join(path, "doclens"))
          .select(F.col(id_col), "dl"))
    stats = (spark.read.parquet(os.path.join(path, "stats"))
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("total_len").alias("total_len")))
    return score_bm25_postings(postings, qt, dl, dfreq, stats, k=k,
                               k1=k1, b=b, id_col=id_col,
                               query_id_col="query_id")


def compact_text_index(spark: SparkSession, path: str) -> dict:
    """Offline maintenance: fold the accumulated vocab/stats DELTA
    rows into one row per key (the LSM compaction step — streamed
    ingest leaves one small delta file set per micro-batch, and the
    query-time delta sum grows with batch count). Search results are
    unchanged: summing deltas is associative, so pre-summing them is
    transparent. Postings/doclens are already one row per fact and are
    left untouched. Run between ingest windows — compaction rewrites
    the vocab/stats tables in place and is the one operation here
    that is NOT concurrent-safe with an in-flight append."""
    vocab = (spark.read.parquet(os.path.join(path, "vocab"))
             .groupBy("tb", "token").agg(F.sum("df").alias("df"))
             .localCheckpoint(eager=True))  # pin before the overwrite
    (vocab.select("token", "df", "tb")
     .write.mode("overwrite").partitionBy("tb")
     .parquet(os.path.join(path, "vocab")))
    stats = (spark.read.parquet(os.path.join(path, "stats"))
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("total_len").alias("total_len"))
             .localCheckpoint(eager=True))
    stats.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "stats"))
    return {"vocab_rows": vocab.count(),
            "n_docs": int(stats.collect()[0]["n_docs"] or 0)}


def append_to_text_index(spark: SparkSession, path: str, batch: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> dict:
    """CDC-shape maintenance: tokenize a NEW document batch and append
    its postings/doclens rows plus vocab/stats DELTA rows — no rewrite
    of any existing file. Unlike the ANN indexes (whose cells drift
    until rebuild), search statistics stay EXACT after appends because
    df/n_docs/total_len are summed from the deltas at query time.

    IDEMPOTENT: the batch anti-joins on id against the doc-length
    rows of its own doc-hash buckets, so a replayed batch (at-least-
    once foreachBatch redelivery) appends nothing the second time;
    the dedup scan reads only the touched db= partitions."""
    dbs = [r[0] for r in
           batch.select(_tb(F.col(id_col)).alias("db")).distinct().collect()]
    existing = (spark.read.parquet(os.path.join(path, "doclens"))
                .filter(F.col("db").isin(dbs)).select(id_col))
    fresh = (batch.select(id_col, text_col)
             .join(existing, id_col, "left_anti")
             .localCheckpoint(eager=True))
    n_docs = fresh.count()
    if not n_docs:
        return {"appended": 0}
    ex = fresh.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("token"))
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")) \
           .localCheckpoint(eager=True)
    (tf.withColumn("tb", _tb(F.col("token")))
       .write.mode("append").partitionBy("tb")
       .parquet(os.path.join(path, "postings")))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    (dl.withColumn("db", _tb(F.col(id_col)))
       .write.mode("append").partitionBy("db")
       .parquet(os.path.join(path, "doclens")))
    (tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
       .withColumn("tb", _tb(F.col("token")))
       .write.mode("append").partitionBy("tb")
       .parquet(os.path.join(path, "vocab")))
    (fresh.agg(F.count(F.lit(1)).alias("n_docs"))
     .crossJoin(dl.agg(F.coalesce(F.sum("dl"), F.lit(0))
                       .alias("total_len")))
     .coalesce(1).write.mode("append")
     .parquet(os.path.join(path, "stats")))
    return {"appended": n_docs}
