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


# ------------------------------------------------- word n-gram backoff LM

def word_ngrams(df: DataFrame, n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, g) rows: every n-token window, space-joined. Whitespace
    tokenization (``functions.text.tokens`` — DuckDB-identical).
    Documents with fewer than n tokens produce no rows."""
    from cdc_data_pipeline_spark.functions.text import tokens

    t = tokens(text_col)
    # sequence(1, 0) would generate DESCENDING [1, 0]: short docs must
    # yield an empty gram array, not a slice(start=0) error
    grams = F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.array_join(F.slice(t, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    return (df.select(F.col(id_col), F.explode(grams).alias("g"))
            .filter(F.col("g") != ""))


def train_backoff_lm(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_count: int = 1
                     ) -> dict[str, DataFrame]:
    """Count tables for a word-trigram stupid-backoff model (Brants et
    al. 2007 "Large Language Models in Machine Translation" — THE
    web-scale LM recipe: no discounting to fit, just counts and a
    fixed backoff factor, which is why it shards to any corpus size).

    Returns {"uni", "bi", "tri", "total"}: n-gram -> count tables with
    counts below ``min_count`` pruned from bi/tri (the KenLM-style
    size lever: pruned orders fall back to lower ones), plus the
    corpus token total. Counting is one explode + map-side-combined
    groupBy per order — the shuffle carries the VOCABULARY of each
    order, never the corpus. Unigrams are never pruned (the final
    fallback must exist).

    NOTE (ADVICE r12): training EAGERLY materializes the fused count
    table via localCheckpoint — Spark jobs run at call time, and the
    blocks stay in executor storage until the returned frames are
    garbage collected. A long-lived session that retrains repeatedly
    should drop references to the old model dict (or call
    ``release_backoff_lm``) so the superseded blocks free up."""
    # ONE corpus pass for all three orders: every gram is emitted from
    # a single explode tagged with its order, counted in one shuffle
    # keyed (order, gram), and the counts MATERIALIZED once. The
    # previous shape (one explode+groupBy per order, with bi and uni
    # each feeding two scorer joins) relied on ReuseExchange to dedupe
    # the count subtrees — the r12 plan audit showed Catalyst reuses
    # NOTHING here (8 full corpus scans for one backoff_score query),
    # so the corpus was scanned and exploded per join arm (guide
    # §1.2/§3.3). Counts are value-identical: same gram strings, same
    # grouping, pruning applied after.
    from cdc_data_pipeline_spark.functions.text import tokens

    t = tokens(text_col)

    def grams(n: int):
        # same construction as word_ngrams (sequence(1, 0) would
        # generate DESCENDING [1, 0]: short docs must yield empty)
        return F.when(
            F.size(t) >= n,
            F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)),
                        lambda i: F.array_join(F.slice(t, i, n), " "))
        ).otherwise(F.array().cast("array<string>"))

    def tag(n: int):
        # NB: a two-arg lambda would make transform() pass the array
        # INDEX as the second argument — close over n instead
        return F.transform(grams(n),
                           lambda g: F.struct(F.lit(n).alias("o"),
                                              g.alias("g")))

    tagged = F.concat(tag(1), tag(2), tag(3))
    ex = (df.select(F.explode(tagged).alias("__r"))
          .select(F.col("__r.o").alias("__o"), F.col("__r.g").alias("g"))
          .filter(F.col("g") != ""))
    counts = (ex.groupBy("__o", "g").agg(F.count(F.lit(1)).alias("c"))
              .localCheckpoint(eager=True))
    uni = counts.filter(F.col("__o") == 1).select("g", "c")
    bi = (counts.filter(F.col("__o") == 2).select("g", "c")
          .filter(F.col("c") >= min_count))
    tri = (counts.filter(F.col("__o") == 3).select("g", "c")
           .filter(F.col("c") >= min_count))
    total = uni.agg(F.sum("c").alias("n_tokens"))
    # "_counts" carries the checkpointed table itself so
    # release_backoff_lm can free its blocks deterministically;
    # consumers only read the named order keys
    return {"uni": uni, "bi": bi, "tri": tri, "total": total,
            "_counts": counts}


def release_backoff_lm(model: dict[str, DataFrame]) -> None:
    """Free the checkpointed count blocks behind a trained model
    (ADVICE r12): long-lived sessions that retrain repeatedly would
    otherwise hold every superseded model's executor storage until
    Python GC happens to collect the frames. Safe to call once the
    model is no longer scored against; the dict must not be used
    afterwards."""
    counts = model.get("_counts")
    if counts is None:
        return  # model trained by pre-r13 code: GC frees it
    try:
        # the analyzed plan of a checkpointed frame IS the LogicalRDD
        # holding the materialized blocks (verified: storage-info
        # cached-partition count drops to zero)
        counts._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # best-effort; the ContextCleaner remains the backstop


def backoff_score(df: DataFrame, model: dict[str, DataFrame] | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  alpha: float = 0.4, min_count: int = 1,
                  decimals: int = 6) -> DataFrame:
    """Per-document mean negative log stupid-backoff trigram score:
    ``(id, n_trigrams, nll)``; documents with < 3 tokens score NULL.

    S(w3 | w1 w2) =
        c(w1w2w3)/c(w1w2)            if the trigram survived pruning
        a * c(w2w3)/c(w2)            else if the bigram survived
        a^2 * c(w3)/N                else (unigrams always exist for
                                     in-corpus scoring; an externally
                                     scored OOV token would hit the
                                     bigram/unigram fallbacks of its
                                     context first)

    Plan: the corpus explodes once per order needed (trigram row +
    its two context keys) and joins the count tables ON THE N-GRAM
    KEY — both sides shuffle by key, so a model far too large to
    broadcast (web-scale trigram tables are GBs) still joins without
    moving the corpus more than once per order; AQE broadcasts the
    small-model case automatically. All counts are integers; the only
    float ops are the final division/log/avg, rounded before output.
    """
    m = model if model is not None else train_backoff_lm(
        df, text_col, id_col, min_count)
    tg = word_ngrams(df, 3, text_col, id_col).select(
        F.col(id_col), F.col("g").alias("__t"),
        # context w1w2, suffix bigram w2w3, suffix unigram w3
        F.array_join(F.slice(F.split(F.col("g"), " "), 1, 2), " ").alias("__ctx2"),
        F.array_join(F.slice(F.split(F.col("g"), " "), 2, 2), " ").alias("__sfx2"),
        F.element_at(F.split(F.col("g"), " "), 3).alias("__w3"))
    tri = m["tri"].select(F.col("g").alias("__t"), F.col("c").alias("c3"))
    bi_ctx = m["bi"].select(F.col("g").alias("__ctx2"), F.col("c").alias("c2ctx"))
    bi_sfx = m["bi"].select(F.col("g").alias("__sfx2"), F.col("c").alias("c2sfx"))
    uni_ctx = m["uni"].select(F.col("g").alias("__w2"), F.col("c").alias("c1ctx"))
    uni_sfx = m["uni"].select(F.col("g").alias("__w3"), F.col("c").alias("c1sfx"))
    joined = (tg.join(tri, "__t", "left")
              .join(bi_ctx, "__ctx2", "left")
              .join(bi_sfx, "__sfx2", "left")
              .withColumn("__w2", F.element_at(F.split(F.col("__t"), " "), 2))
              .join(uni_ctx, "__w2", "left")
              .join(uni_sfx, "__w3", "left")
              .crossJoin(F.broadcast(m["total"])))
    a = F.lit(float(alpha))
    s = (F.when(F.col("c3").isNotNull() & F.col("c2ctx").isNotNull(),
                F.col("c3").cast("double") / F.col("c2ctx"))
         .when(F.col("c2sfx").isNotNull() & F.col("c1ctx").isNotNull(),
               a * F.col("c2sfx").cast("double") / F.col("c1ctx"))
         .otherwise(a * a * F.coalesce(F.col("c1sfx"), F.lit(1)).cast("double")
                    / F.col("n_tokens")))
    scored = (joined.withColumn("__nl", -F.log(s))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_trigrams"),
                   F.round(F.avg("__nl"), decimals).alias("nll")))
    return (df.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
                    F.col("nll")))
