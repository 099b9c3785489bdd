"""Segment-level (line/paragraph) exact deduplication.

CCNet-style boilerplate removal (Wenzek et al. 2019): hash every
line/paragraph across the corpus and keep only its FIRST occurrence
(smallest ``(doc_id, pos)``); every later occurrence — navigation
chrome, cookie banners, licence footers — is dropped from its
document. Complements document-level dedup (``operators/dedup.py``):
this removes repeated content INSIDE otherwise-unique documents.

Reference parity: the reference dedupes whole rows by key (dbt
``ReplacingMergeTree`` semantics, `dbt_project/models/*`); segment
dedup is the text-corpus generalization of "keep one copy per
fingerprint" (SURVEY §7.6 north star).

Scale design (100 TB):

- one explode (text → segments), no shuffle;
- first-occurrence election is ``groupBy(segment hash) →
  min(struct(doc, pos))`` — map-side partial aggregation, so a
  boilerplate line appearing in billions of documents still combines
  locally. Deliberately NOT a window over the hash: a window would
  sort the full occurrence list of the hottest line in one task,
  while min() reduces it on the map side;
- the winners join back keyed on the 32-byte hash (AQE skew-join
  splits hot hashes);
- per-document reassembly is one groupBy(doc) over flagged segments.

Three shuffles total, each keyed on a high-cardinality column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_segments(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", delim: str = "\n") -> DataFrame:
    """Explode documents into ``(id, pos, segment)`` rows (pos 0-based)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "segment"),
    )


def segment_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", delim: str = "\n") -> DataFrame:
    """Corpus-wide first-occurrence segment dedup.

    Returns one row per document: ``id_col, n_segments, n_kept,
    kept_text, kept_md5`` where ``kept_text`` is the document with
    every non-first-occurrence segment removed (original segment
    order preserved) and ``kept_md5`` its digest — the compact
    attestation an oracle can check without shipping the text.
    """
    segs = (split_segments(df, text_col, id_col, delim)
            .withColumn("__h", F.md5(F.col("segment"))))
    winners = segs.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("__w"))
    flagged = (segs.join(winners, "__h")
               .withColumn("__kept",
                           (F.col(id_col) == F.col("__w.d"))
                           & (F.col("pos") == F.col("__w.p"))))
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("__kept").cast("int")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("__kept"), F.struct("pos", "segment")))),
                lambda s: s.segment),
            delim).alias("kept_text"),
    )
    return out.select(
        id_col, "n_segments", F.col("n_kept").cast("long").alias("n_kept"),
        "kept_text", F.md5("kept_text").alias("kept_md5"))


def duplicated_spans(df: DataFrame, n: int = 8, min_count: int = 2,
                     text_col: str = "text", id_col: str = "doc_id",
                     keep_first: bool = False) -> DataFrame:
    """ExactSubstr duplicated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    ``keep_first=True`` exempts the corpus-wide FIRST occurrence of
    each duplicated gram (lowest ``(id, position)``) — the
    keep-one-copy variant: spans only cover the REPEATS, so masking
    them leaves exactly one copy of every duplicated passage in the
    corpus. Default keeps Lee et al.'s drop-all-copies semantics
    (``min_count`` is the guard).

    Finds, for every document, the maximal token spans covered by
    length-``n`` token windows that occur at least ``min_count`` times
    in the whole corpus (counting all occurrences, including repeats
    inside one document). Returns ``(id_col, span_start, span_end)``
    with inclusive 0-based token positions. Spans are disjoint and
    non-adjacent by construction — a duplicated window starting at
    ``p`` covers ``[p, p+n-1]``, and two windows' coverage is
    connected iff their start gap is <= ``n``, so runs merge on that
    gap (NOT only consecutive starts, which would emit overlapping
    rows and double-count tokens for any consumer other than
    :func:`mask_duplicated_spans`).

    Lee et al. build a corpus-level suffix array — inherently
    sequential and memory-bound. The Spark-first re-expression keys
    duplicated windows by hash instead, which needs no global order:

    - every doc emits its n-gram hashes WITH positions in one
      projection (``transform`` over ``sequence`` + ``posexplode`` —
      all JVM whole-stage codegen, text is tokenized once);
    - the duplicate test is ``count() over (partition by hash)`` on the
      gram stream: ONE shuffle keyed on the digest, no join, and the
      corpus is tokenized/hashed exactly once. (A groupBy + join-back
      would either recompute the gram subtree for the election side —
      Catalyst prunes the two exchanges to different widths, defeating
      ReuseExchange — or shuffle the stream twice. On web-scale text
      the duplicated-hash set is billions of rows, not broadcastable.)
      A pathologically hot n-gram makes one window group large; the
      window buffers and spills rather than OOMs, and running
      :func:`segment_dedup` / line dedup first removes exactly that
      boilerplate;
    - run-merging of covered positions into maximal spans is a
      per-document window (gap-aware run breaks + running sum),
      bounded by doc length — never corpus-scale.

    Two shuffles total: gram digest, then doc id.
    Reference parity: generalizes the reference's whole-row duplicate
    detection (dbt ``ReplacingMergeTree`` / test_duplicates, SURVEY
    §2 R7) to intra-document substring granularity.
    """
    from pyspark.sql import Window

    from cdc_data_pipeline_spark.functions.text import tokens

    toks = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    grams = (
        toks.filter(F.size("__t") >= n)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - n),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("__t", i + 1, n))),
                )
            ).alias("p", "__h"),
        )
    )
    hw = Window.partitionBy("__h")
    ranked = grams.withColumn("__c", F.count(F.lit(1)).over(hw))
    if keep_first:
        # the corpus-wide FIRST occurrence of each duplicated gram
        # (lowest (id, position), deterministic) is exempt — the
        # keep-one-copy ExactSubstr variant: the corpus retains each
        # duplicated passage exactly once. Same partitioning as the
        # count window, so the exemption adds no extra shuffle.
        ow = Window.partitionBy("__h").orderBy(F.col(id_col),
                                               F.col("p"))
        ranked = ranked.withColumn("__rn", F.row_number().over(ow)) \
            .filter(F.col("__rn") > 1)
    hits = (ranked
            .filter(F.col("__c") >= min_count)
            .select(id_col, "p"))
    w = Window.partitionBy(id_col).orderBy("p")
    brk = F.when(F.col("p") - F.lag("p").over(w) <= n, F.lit(0)).otherwise(F.lit(1))
    runs = (hits.withColumn("__brk", brk)
            .withColumn("__grp", F.sum("__brk").over(w)))
    return (runs.groupBy(id_col, "__grp")
            .agg(F.min("p").cast("long").alias("span_start"),
                 (F.max("p") + n - 1).cast("long").alias("span_end"))
            .drop("__grp"))


def mask_duplicated_spans(df: DataFrame, n: int = 8, min_count: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          keep_first: bool = False) -> DataFrame:
    """Drop duplicated spans from each document's token stream.

    Joins :func:`duplicated_spans` back to the corpus and rebuilds
    ``text`` with every in-span token removed. ``keep_first=True``
    exempts the corpus-wide first occurrence of each duplicated gram
    (see :func:`duplicated_spans`) so one copy of every duplicated
    passage SURVIVES the mask — the keep-one-copy ExactSubstr
    variant; the default drops all copies (Lee et al. rely on
    min_count for the guard). The span list per doc is small
    (collected with ``collect_list`` per doc, bounded by doc length),
    and the rebuild is a native ``filter`` over token positions — no
    Python UDF.
    """
    from cdc_data_pipeline_spark.functions.text import tokens

    spans = (duplicated_spans(df, n=n, min_count=min_count,
                              text_col=text_col, id_col=id_col,
                              keep_first=keep_first)
             .groupBy(id_col)
             .agg(F.collect_list(F.struct("span_start", "span_end")).alias("__spans")))
    base = df.withColumn("__t", tokens(text_col))
    joined = base.join(spans, id_col, "left")
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s.span_start) & (i <= s.span_end))
    kept = F.when(F.col("__spans").isNull(), F.col("__t")).otherwise(
        F.filter(F.col("__t"), lambda t, i: ~in_span(i.cast("long"))))
    return (joined
            .withColumn("n_tokens", F.size("__t").cast("long"))
            .withColumn("__kept", kept)
            .withColumn("n_kept", F.size("__kept").cast("long"))
            .withColumn("clean_text", F.array_join("__kept", " "))
            .drop("__t", "__spans", "__kept", text_col))
