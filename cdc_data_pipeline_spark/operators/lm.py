"""Character n-gram language-model quality scoring.

CCNet-style corpus curation scores every document by the perplexity of
a small language model — low-perplexity text is fluent, high-perplexity
text is boilerplate, markup or noise (Wenzek et al. 2019 use a KenLM
5-gram; the in-engine analogue is a char-bigram model with add-one
smoothing, which needs no external artifacts and has an exact SQL
oracle).

Two-pass shape, the canonical "train tiny model, score huge corpus"
plan:

1. **Train** — explode char bigrams, count. The model is O(charset²)
   rows (a few thousand for web text): map-side combine shrinks the
   shuffle to the vocabulary, never the corpus.
2. **Score** — re-explode the corpus and broadcast-join the model
   (the model table is kilobytes; the 100 TB side never shuffles),
   then one groupBy(doc) average.

Smoothing keeps unseen bigrams finite: p(c2|c1) = (c(c1c2)+1) /
(c(c1·)+V), V = distinct observed characters — all-integer inputs, so
the probabilities are exact rationals and the only float op is the
final log/avg (rounded before output, like every float aggregate in
this engine).

Reference parity: no counterpart (SURVEY §2.9 training-data surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def char_bigrams(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, bg) rows: every overlapping 2-char window of the text.
    Documents shorter than 2 chars produce no rows."""
    return (df.select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - 1, 1)), "
            f"i -> substring({text_col}, i, 2))")).alias("bg"))
        .filter(F.length("bg") == 2))


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The smoothed model: (bg, neg_log_p) for every OBSERVED bigram.

    p(c2|c1) = (c(c1c2) + 1) / (c(c1·) + V); unseen bigrams of a seen
    prefix score ln(c(c1·)+V) by construction (handled at score time
    via the prefix table if needed — the in-corpus scorer only meets
    observed bigrams).
    """
    bgs = char_bigrams(df, text_col, id_col)
    c2 = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (c2.groupBy(F.substring("bg", 1, 1).alias("c1"))
            .agg(F.sum("c2").alias("c1n")))
    v = bgs.select(F.countDistinct(F.substring("bg", 2, 1)).alias("v"))
    return (c2.join(c1, F.substring(c2["bg"], 1, 1) == c1["c1"])
              .crossJoin(broadcast(v))
              .select("bg",
                      (-F.log((F.col("c2") + 1).cast("double")
                              / (F.col("c1n") + F.col("v")).cast("double"))
                       ).alias("neg_log_p")))


def lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             model: DataFrame | None = None, decimals: int = 6) -> DataFrame:
    """Per-document mean negative log-likelihood under the (self- or
    externally-) trained bigram model: one row per input document,
    ``(id, n_bigrams, nll)``; documents with no bigrams score NULL.

    Lower nll = more typical of the training corpus. ``model`` defaults
    to a model trained on ``df`` itself (the self-scoring curation
    shape); pass a model trained elsewhere to score against a clean
    reference corpus instead.
    """
    m = model if model is not None else train_bigram_lm(df, text_col, id_col)
    bgs = char_bigrams(df, text_col, id_col)
    scored = (bgs.join(broadcast(m), "bg")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.round(F.avg("neg_log_p"), decimals).alias("nll")))
    return (df.select(id_col).join(scored, id_col, "left")
              .select(id_col,
                      F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                      F.col("nll")))
