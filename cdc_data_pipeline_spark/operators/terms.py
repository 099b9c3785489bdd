"""Term-frequency analytics over a document corpus.

- ``top_tokens`` — exact corpus-wide heavy hitters (total count +
  document frequency). The profiling query every curation pipeline
  runs before choosing stopword caps (e.g. the ``max_df`` stop-shingle
  cap in ``operators/dedup.jaccard_candidate_pairs``).
- ``tfidf_top_terms`` — per-document top terms by TF-IDF, the
  classic keyword/topic signal.

Scale design (100 TB):

- ``top_tokens``: explode → groupBy(token) with map-side combine
  (count and distinct-doc count both reduce locally), then a global
  top-k via orderBy().limit(k) — Spark plans TakeOrdered: per-partition
  heaps merged on the driver, never a full sort.
- ``tfidf_top_terms``: one shuffle to (doc, term) counts, document
  length by a window over the doc key, document frequency by a
  map-side-combined groupBy(term). The IDF table is vocabulary-sized
  — Zipf-truncate it with ``min_df`` before the join so the hot join
  side stays small; the final per-doc top-N is a window over the doc
  key (high cardinality, no hot partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens


def _exploded(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))


def top_tokens(df: DataFrame, k: int = 32, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Exact top-k tokens by total count: ``token, n, df`` (ties
    broken by token text, so the cut is deterministic)."""
    ex = _exploded(df, text_col, id_col)
    counts = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(id_col).alias("df"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def tfidf_top_terms(df: DataFrame, top: int = 3, min_df: int = 1,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document top-``top`` terms by TF-IDF.

    ``tfidf = tf/doc_len * ln(n_docs/df)``, rounded to 6dp BEFORE
    ranking so the rank order (tfidf desc, token asc) is reproducible
    cross-engine. Terms with document frequency < ``min_df`` are
    dropped before the join (the Zipf tail is where the vocabulary
    bulk lives; production runs cut it).
    Returns ``id_col, token, tf, tfidf, rank``.
    """
    ex = _exploded(df, text_col, id_col)
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("doc_len", F.sum("tf").over(Window.partitionBy(id_col)))
    idf = (tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") >= min_df))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(idf, "token")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf", F.round(
                  F.col("tf") / F.col("doc_len")
                  * F.log(F.col("n_docs") / F.col("df")), 6)))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top)
            .select(id_col, "token", "tf", "tfidf", "rank"))
