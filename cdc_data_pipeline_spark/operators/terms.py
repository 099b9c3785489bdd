"""Term-frequency analytics over a document corpus.

- ``top_tokens`` — exact corpus-wide heavy hitters (total count +
  document frequency). The profiling query every curation pipeline
  runs before choosing stopword caps (e.g. the ``max_df`` stop-shingle
  cap in ``operators/dedup.jaccard_candidate_pairs``).
- ``tfidf_top_terms`` — per-document top terms by TF-IDF, the
  classic keyword/topic signal.
- ``bm25_topk`` — Okapi BM25 query→document retrieval over the same
  postings, the lexical complement of the embedding ANN family
  (``operators/similarity``): sparse keyword search where cosine
  top-k is dense semantic search.

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
- ``bm25_topk``: the corpus shuffles ONCE to (doc, term) postings;
  the query side (small by the retrieval contract) broadcasts into
  the postings, so only postings for query terms survive — the
  classic inverted-index probe expressed relationally. Per-term
  contributions are scaled to micro-unit LONGs before the per-(query,
  doc) sum, so the score is an order-independent integer total (no
  float-summation drift between partial aggregates — the same trick
  as the PQ integer ADC). The final per-query rank goes through
  ``sampling.group_topk``'s map-local cut: a stopword-ish query term
  matching 10% of the corpus never lands one query's scores in a
  single window task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens
from cdc_data_pipeline_spark.operators.sampling import group_topk


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


def bm25_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              exclude_pairs: DataFrame | None = None) -> DataFrame:
    """Okapi BM25 top-k document retrieval (Robertson–Spärck Jones),
    the standard lexical ranking function (Lucene/Elasticsearch
    default). For each query document, score every corpus document
    sharing a term and keep the top ``k``:

        score(q, d) = sum over DISTINCT terms t of q:
            idf(t) * tf(t,d) * (k1+1)
                   / (tf(t,d) + k1 * (1 - b + b * dl(d)/avgdl))
        idf(t) = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)   [Lucene form]

    Determinism: each per-term contribution is rounded to micro-units
    (1e-6) and summed as a LONG — the total is order-independent, so
    partial-aggregation order can never flip a rank, and ranking uses
    the integer total with an id tiebreak. ``bm25`` in the output is
    the micro-unit total / 1e6 (one exact IEEE division — identical
    across engines).

    Plan shape: corpus → (doc, term, tf) postings (one shuffle, the
    inverted index); query terms and the query-vocabulary IDF slice
    broadcast into the postings, so the join output is only the
    postings of query terms; per-(query, doc) LONG sum with map-side
    combine; ``group_topk`` final rank (map-local cut — a hot query
    term cannot concentrate one query's candidate set in one task).
    Self-matches (query_id == doc_id) are excluded, mirroring
    ``similarity.topk_cosine``.

    Returns ``(query_id, neighbor_id, bm25, rank)``.
    """
    ex = _exploded(corpus, text_col, id_col)
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # Materialize the postings ONCE: dl, dfreq, total_len and the
    # scoring join all branch off tf, and Catalyst does not reuse the
    # exchange across those branches (each prunes differently), so
    # without this the corpus is scanned and exploded per branch —
    # the r12 plan showed 7+ full corpus scans for one bm25 query
    # (guide §3.3: materialize an intermediate to truncate the plan).
    # The inverted index is exactly what a search engine materializes.
    # The explicit repartition pins the checkpoint's parallelism: AQE
    # coalesces the postings shuffle by POSTINGS bytes (often to 1-2
    # partitions), but the checkpoint freezes that layout and the
    # downstream broadcast-join scoring — whose candidate fan-out is
    # far larger than the postings — would inherit it (measured at the
    # 8x soak: the scoring stage collapsed to single-task, 11.7s ->
    # 48.4s; with the pin it is restored). Keyed by doc so per-doc
    # postings stay together; count follows the cluster, not a local
    # constant.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    tf = tf.repartition(par, F.col(id_col)).localCheckpoint(eager=True)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # N and avgdl: two scalars (watermark-budget class). N counts ALL
    # corpus rows (token-less documents still dilute avgdl).
    stats = (corpus.agg(F.count(F.lit(1)).alias("n_docs"))
             .crossJoin(F.broadcast(dl.agg(F.sum("dl").alias("total_len")))))
    qt = (queries
          .select(F.col(id_col).alias(query_id_col),
                  F.explode(tokens(text_col)).alias("token"))
          .distinct())
    return score_bm25_postings(tf, qt, dl, dfreq, stats, k=k, k1=k1, b=b,
                               id_col=id_col, query_id_col=query_id_col,
                               exclude_pairs=exclude_pairs)


def score_bm25_postings(tf: DataFrame, qt: DataFrame, dl: DataFrame,
                        dfreq: DataFrame, stats: DataFrame, k: int = 5,
                        k1: float = 1.2, b: float = 0.75,
                        id_col: str = "doc_id",
                        query_id_col: str = "query_id",
                        exclude_pairs: DataFrame | None = None,
                        exclude_self: bool = True) -> DataFrame:
    """The BM25 scoring plan over pre-built relations — shared by
    ``bm25_topk`` (relations derived from the corpus in-flight) and
    the persisted inverted index (relations read from storage), so
    both paths are arithmetically identical by construction.

    Inputs: ``tf`` (id, token, tf) postings; ``qt`` (query_id, token)
    DISTINCT query terms (broadcast-small); ``dl`` (id, dl) document
    lengths; ``dfreq`` (token, df) document frequencies (may be
    pre-restricted to the query vocabulary); ``stats`` one row
    (n_docs, total_len).

    The expensive per-element factors are hoisted OUT of the postings
    fan-out onto their small owning relations — ln() runs once per
    query-vocabulary term and the length norm once per document, not
    once per (query, doc, term) row. The float-op SEQUENCE matches the
    textbook inlined form exactly (same ops, same grouping, same
    values), so the SQL oracle reproduces it bit-for-bit.

    NOTE: building this plan EAGERLY materializes ``qt`` (and
    ``bm25_topk`` additionally the postings) via localCheckpoint —
    Spark jobs run at builder time even if the query is never
    executed, and the blocks live in executor storage until the
    frames are garbage collected (executor loss -> recompute becomes
    failure; acceptable for query-serving sessions, see r12 ADVICE).
    """
    # ``qt`` feeds TWO broadcast builds (the postings probe and the
    # query-vocabulary IDF slice) and Catalyst reuses nothing across
    # them (different projections defeat exchange reuse) — without
    # this the query-side explode + distinct runs once per build;
    # hybrid_rrf inherits the duplicate twice. Broadcast-small by the
    # retrieval contract, and always a broadcast SIDE — the frozen
    # partition layout can never collapse downstream parallelism
    # (the r12 checkpoint-hazard audit class).
    qt = qt.localCheckpoint(eager=True)
    avgdl = F.col("total_len") / F.col("n_docs")
    norm = dl.crossJoin(F.broadcast(stats)).select(
        id_col, (F.lit(k1) * (F.lit(1.0 - b) + (b * F.col("dl")) / avgdl))
        .alias("__norm"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    # query-vocabulary IDF slice: |distinct query terms| rows — small
    # enough to broadcast into the corpus-sized postings
    dfq = (dfreq.join(F.broadcast(qt.select("token").distinct()), "token")
           .crossJoin(F.broadcast(stats.select("n_docs")))
           .select("token", idf.alias("__idf")))
    scored = tf.join(F.broadcast(qt), "token")
    if exclude_self:
        # more-like-this shape: the query IS a corpus document, drop
        # its trivial self-hit. External-query serving (persisted
        # index search) passes False — there a query id that merely
        # COINCIDES with a corpus doc_id is a legitimate hit.
        scored = scored.filter(F.col(query_id_col) != F.col(id_col))
    scored = (scored
              .join(norm, id_col)
              .join(F.broadcast(dfq), "token"))
    contrib = (F.col("__idf") * F.col("tf") * (k1 + 1.0)
               / (F.col("tf") + F.col("__norm")))
    summed = (scored
              .withColumn("__ci", F.round(contrib * 1e6, 0).cast("long"))
              .groupBy(query_id_col, F.col(id_col).alias("neighbor_id"))
              .agg(F.sum("__ci").alias("__si")))
    if exclude_pairs is not None:
        # drop named (query, neighbor) pairs BEFORE ranking, so the
        # top-k backfills past them (hard-negative mining: known
        # positives must not consume result slots). Matched on the
        # canonical unordered orientation.
        ex = exclude_pairs.select(
            F.least(F.col("id_a"), F.col("id_b")).alias("__xa"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("__xb"))
        summed = (summed
                  .withColumn("__xa", F.least(F.col(query_id_col),
                                              F.col("neighbor_id")))
                  .withColumn("__xb", F.greatest(F.col(query_id_col),
                                                 F.col("neighbor_id")))
                  .join(ex, ["__xa", "__xb"], "left_anti")
                  .drop("__xa", "__xb"))
    top = group_topk(summed, [query_id_col], k,
                     [("__si", False), ("neighbor_id", True)],
                     rank_col="rank")
    return top.select(query_id_col, "neighbor_id",
                      (F.col("__si") / F.lit(1e6)).alias("bm25"),
                      F.col("rank").cast("int"))
