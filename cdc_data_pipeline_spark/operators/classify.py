"""In-engine multinomial Naive Bayes text classification.

The fastText-shaped workhorse of training-data curation — domain
classification, quality-vs-seed filtering (GPT-3 / CCNet style), and
source attribution — expressed as pure aggregations so training and
scoring are both Catalyst plans with an exact SQL oracle (no external
model artifact, no Python in the hot path).

Two-pass "train tiny, score huge" shape (same contract as
``operators/lm.py``):

1. **Train** — explode tokens, keep the top ``vocab`` tokens by global
   count (vocabulary-restricted NB: out-of-vocab tokens carry no
   class signal and capping the vocabulary is what keeps the model
   broadcastable at any corpus size), then count per (token, class).
   Model size is vocab x n_classes rows — kilobytes; every shuffle in
   training is bounded by the vocabulary, never the corpus.
2. **Score** — re-explode the corpus, broadcast-join the model on
   token, one groupBy(doc, class) sum, argmax class per doc. The
   corpus side never shuffles for the join; the only wide exchange
   carries one row per (doc, class).

Determinism (exact-oracle contract): every log-probability is rounded
to integer micro-units (1e-6) at the model, so per-document scores are
exact 64-bit integer sums — no float summation-order drift — and the
argmax compares integers, ties to the lexicographically smallest
class.

Laplace add-one smoothing over the restricted vocabulary:
``log p(t|c) = ln((count(t,c) + 1) / (total_c + V))`` with ``V`` the
realized vocabulary size and ``total_c`` the in-vocab token mass of
class ``c``; priors ``ln(docs_c / docs_total)``.

Reference parity: no counterpart (SURVEY §2.9 training-data surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from cdc_data_pipeline_spark.functions.text import tokens

_MICRO = 1e6


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))


def top_vocab(df: DataFrame, vocab: int, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-``vocab`` tokens by global count (ties to the smaller
    token). One map-side-combined count, then ``orderBy().limit()`` —
    Spark compiles that to TakeOrderedAndProject (per-partition
    partial top-k, merge on the driver), so even billions of distinct
    tokens never gather into one partition."""
    counts = _doc_tokens(df, text_col, id_col).groupBy("tok").count()
    return (counts.orderBy(F.col("count").desc(), F.col("tok").asc())
            .limit(vocab).select("tok"))


def train_nb(df: DataFrame, label_col: str, vocab: int = 256,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The smoothed model: one row per (vocab token x observed class)
    with ``lp`` = micro-unit ln p(t|c), plus the per-class prior
    replicated on each row (``prior`` = micro-unit ln p(c)).

    Dense vocab x classes construction (missing counts smooth to 1/
    (total_c+V)) so scoring needs no null handling.
    """
    toks = _doc_tokens(df, text_col, id_col)
    v = broadcast(top_vocab(df, vocab, text_col, id_col))
    labeled = toks.join(df.select(F.col(id_col), F.col(label_col).alias("__cls")),
                        id_col)
    in_vocab = labeled.join(v, "tok")
    tc = in_vocab.groupBy("tok", "__cls").agg(F.count(F.lit(1)).alias("__n"))
    totals = in_vocab.groupBy("__cls").agg(F.count(F.lit(1)).alias("__total"))
    n_vocab = v.count()
    priors = (df.groupBy(F.col(label_col).alias("__cls"))
              .agg(F.count(F.lit(1)).alias("__docs")))
    total_docs = df.count()
    dense = (v.crossJoin(broadcast(totals))
             .join(tc, ["tok", "__cls"], "left")
             .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
             .withColumn("lp", F.round(F.log(
                 (F.col("__n") + 1).cast("double") /
                 (F.col("__total") + F.lit(n_vocab)).cast("double")) * _MICRO,
                 0).cast("long")))
    pr = priors.withColumn("prior", F.round(F.log(
        F.col("__docs").cast("double") / F.lit(float(total_docs))) * _MICRO,
        0).cast("long"))
    return (dense.join(broadcast(pr.select("__cls", "prior")), "__cls")
            .select(F.col("tok"), F.col("__cls").alias("cls"), "lp", "prior"))


def nb_classify(df: DataFrame, label_col: str, vocab: int = 256,
                text_col: str = "text", id_col: str = "doc_id",
                model: DataFrame | None = None) -> DataFrame:
    """(id, pred, score): argmax-class prediction per document.

    ``score`` is the winning class's total log-likelihood (prior +
    in-vocab token terms) in micro-units, surfaced as a 6dp double.
    Documents with zero in-vocab tokens still score every class via
    the prior alone (left join + coalesce 0). Ties break to the
    smaller class name.
    """
    m = model if model is not None else train_nb(df, label_col, vocab,
                                                 text_col, id_col)
    toks = _doc_tokens(df, text_col, id_col)
    # one row per (doc, class): sum of token lps over in-vocab tokens
    tok_scores = (toks.join(broadcast(m), "tok")
                  .groupBy(id_col, "cls", "prior")
                  .agg(F.sum("lp").alias("__toklp")))
    per_class = (df.select(id_col)
                 .join(broadcast(m.select("cls", "prior").distinct()))
                 .join(tok_scores, [id_col, "cls", "prior"], "left")
                 .withColumn("__score",
                             F.col("prior") + F.coalesce(F.col("__toklp"),
                                                         F.lit(0))))
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(),
                                           F.col("cls").asc())
    return (per_class.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(id_col), F.col("cls").alias("pred"),
                    F.round(F.col("__score") / _MICRO, 6).alias("score")))
