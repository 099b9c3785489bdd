"""Contrastive training-pair mining for embedding-model training.

Retrieval/embedding models (bi-encoders) train on (anchor, partner,
label) pairs: positives are texts that genuinely overlap, negatives
are random non-overlapping texts. Mining those pairs from the corpus
itself is a standard curation job (weak supervision a la E5/GTE-style
"naturally occurring pairs"), and both halves already exist in this
engine as exact, scale-bucketed primitives:

- POSITIVES — near-duplicate pairs above a Jaccard threshold via the
  inverted-shingle index (``dedup.jaccard_pairs``: df-capped shingle
  space, no cross join, 6dp-rounded ratio).
- NEGATIVES — deterministic derangement pairing over the hash-shuffled
  order (``shuffle.deterministic_shuffle``): anchor at (shard, pos)
  pairs with the documents at (shard, (pos + j) mod shard_size) for
  j = 1..k_neg. A pure function of (key, seed) — re-runs, backfills
  and the SQL oracle produce the identical pair set — and uniform:
  hash order is independent of content, so partners are an unbiased
  draw. Accidental positives are anti-joined away.

Scale: positives are bounded by the df-capped inverted index;
negatives are one bounded-fanout explode (k_neg per doc) plus a
(shard, pos)-keyed join — high-cardinality key, no hot partition, no
global window (the shuffle's per-shard ranking is the documented
n_shards ~ rows/4M sizing). Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.dedup import jaccard_pairs
from cdc_data_pipeline_spark.operators.shuffle import deterministic_shuffle
from cdc_data_pipeline_spark.operators.terms import bm25_topk


def mine_contrastive_pairs(df: DataFrame, k_neg: int = 2,
                           pos_threshold: float = 0.5, shingle_k: int = 3,
                           max_df: int | None = None, n_shards: int = 16,
                           seed: int = 0, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Mine (id_a, id_b, label, score) training pairs from a corpus:
    label 1 = near-duplicate positives (score = 6dp Jaccard >=
    ``pos_threshold``), label 0 = deterministic hash-paired negatives
    (score NULL), ~``k_neg`` per document before dedup/anti-join.
    Pairs are canonically oriented (id_a < id_b) and each unordered
    pair appears once; a mined negative that is actually a positive is
    removed, not relabeled.
    """
    assert k_neg >= 1
    pos = (jaccard_pairs(df, text_col, id_col, shingle_k,
                         pos_threshold, max_df)
           .select("id_a", "id_b", F.lit(1).alias("label"),
                   F.col("jaccard").alias("score")))
    sh = deterministic_shuffle(df.select(id_col), id_col, n_shards, seed)
    sizes = sh.groupBy("shard_id").agg(F.count(F.lit(1)).alias("__n"))
    offs = F.explode(F.array(*[F.lit(j) for j in range(1, k_neg + 1)]))
    cand = (sh.join(F.broadcast(sizes), "shard_id")
            .withColumn("__j", offs)
            .withColumn("__ppos", (F.col("pos") + F.col("__j")) % F.col("__n"))
            # a wrap-around landing back on the anchor (shard smaller
            # than k_neg+1) yields no pair, not a self-pair
            .filter(F.col("__ppos") != F.col("pos")))
    partner = sh.select("shard_id", F.col("pos").alias("__ppos"),
                        F.col(id_col).alias("__pid"))
    neg_raw = (cand.join(partner, ["shard_id", "__ppos"])
               .select(F.least(F.col(id_col), F.col("__pid")).alias("id_a"),
                       F.greatest(F.col(id_col), F.col("__pid")).alias("id_b"))
               .distinct())
    neg = (neg_raw.join(pos.select("id_a", "id_b"), ["id_a", "id_b"],
                        "left_anti")
           .select("id_a", "id_b", F.lit(0).alias("label"),
                   F.lit(None).cast("double").alias("score")))
    return pos.unionByName(neg)


def mine_hard_negatives(df: DataFrame, queries: DataFrame, k_neg: int = 5,
                        pos_threshold: float = 0.5, shingle_k: int = 3,
                        max_df: int | None = None, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """HARD negatives for retrieval-model training (the DPR/E5/SBERT
    recipe): per query, the top-``k_neg`` BM25-scoring documents that
    are NOT near-duplicates of it — lexically confusable but
    semantically distinct, the negatives that actually teach a
    bi-encoder its decision boundary (random negatives are too easy;
    ``mine_contrastive_pairs`` supplies those).

    Known positives (shingle-Jaccard >= ``pos_threshold``, the same
    exact construction the positive miner uses) are excluded BEFORE
    the rank, so the top-k backfills past them instead of losing
    slots. Returns ``(query_id, neighbor_id, bm25, rank)`` — rank is
    the hardness order (1 = hardest).

    Scale: one postings build + the skew-safe BM25 rank
    (``terms.bm25_topk``); the exclusion set is the df-capped Jaccard
    pair list, anti-joined on the (query, neighbor) pair key.
    """
    pos = jaccard_pairs(df, text_col, id_col, shingle_k,
                        pos_threshold, max_df).select("id_a", "id_b")
    return bm25_topk(df, queries, k=k_neg, text_col=text_col,
                     id_col=id_col, exclude_pairs=pos)
