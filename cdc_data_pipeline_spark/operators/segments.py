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
