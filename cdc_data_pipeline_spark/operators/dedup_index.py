"""Persisted MinHash-LSH dedup index: incremental near-dup detection.

CDC meets dedup: a 100 TB training corpus is not re-deduplicated per
ingest tick — new documents arrive in micro-batches and must be
near-dup-checked against everything already ingested WITHOUT
recomputing (or even rescanning) the historical signatures. This
module persists the banded LSH signature table as an index:

    <path>/bands/pfx=N/   (doc_id, band, bucket) rows, partitioned by
                          a bucket-hash prefix

- ``build_lsh_index`` computes banded signatures once and writes them
  partitioned by ``pfx = hash(band, bucket) mod n_prefixes``.
- ``query_lsh_index`` signatures ONLY the incoming batch, derives the
  touched prefixes (driver-side: at most ``n_prefixes`` scalars, like
  the IVF probe set in ``operators.index``), and reads just those
  directories — partition pruning makes historical lookup cost
  proportional to the BATCH, not the corpus.
- ``append_lsh_index`` adds the batch's signatures in append mode;
  new files land only under the batch's prefixes, so the index grows
  without rewriting history (same O(batch) discipline as the bucketed
  CDC upsert sink in ``operators.incremental``).

The candidate semantics are identical to ``dedup.lsh_candidate_pairs``
(reference CDC dedup analogue: keep-latest upsert in
``base_loader.py:340-475`` — here generalized from key-equality to
near-duplicate text): full-corpus candidates = index-vs-batch pairs
(this module) + within-batch pairs (``lsh_candidate_pairs`` on the
batch), which the equivalence test pins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.dedup import banded_signatures

PFX = "pfx"


def _with_pfx(banded: DataFrame, n_prefixes: int) -> DataFrame:
    # xxhash64: engine-internal partitioning key, no oracle needs to
    # reproduce it (cheaper than md5)
    return banded.withColumn(
        PFX, F.pmod(F.xxhash64("band", "bucket"), F.lit(n_prefixes)).cast("int"))


def build_lsh_index(spark: SparkSession, docs: DataFrame, path: str,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_hashes: int = 8, bands: int = 4, shingle_k: int = 3,
                    n_prefixes: int = 64) -> dict:
    """Signature the corpus once and persist the banded index.

    Returns {n_docs, n_band_rows}. Index parameters are stored in a
    one-row meta table so queries cannot run with mismatched banding.
    """
    banded = _with_pfx(
        banded_signatures(docs, text_col, id_col, num_hashes, bands, shingle_k),
        n_prefixes)
    banded.write.mode("overwrite").partitionBy(PFX) \
        .parquet(os.path.join(path, "bands"))
    meta = spark.createDataFrame(
        [(num_hashes, bands, shingle_k, n_prefixes)],
        "num_hashes int, bands int, shingle_k int, n_prefixes int")
    meta.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))
    stats = spark.read.parquet(os.path.join(path, "bands")) \
        .agg(F.countDistinct(id_col).alias("d"), F.count(F.lit(1)).alias("r")).first()
    return {"n_docs": stats["d"], "n_band_rows": stats["r"]}


def _read_meta(spark: SparkSession, path: str) -> tuple[int, int, int, int]:
    m = spark.read.parquet(os.path.join(path, "meta")).first()
    return m["num_hashes"], m["bands"], m["shingle_k"], m["n_prefixes"]


def query_lsh_index(spark: SparkSession, path: str, batch: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id_existing, id_new) candidate near-dup pairs between the
    persisted corpus and the incoming batch.

    Only the batch is signatured; the index read is pruned to the
    batch's bucket-hash prefixes at the directory level (the collected
    prefix list is bounded by n_prefixes — scalar-scale, the same
    legitimate driver-side collect as the IVF probe set).
    """
    num_hashes, bands, shingle_k, n_prefixes = _read_meta(spark, path)
    # cache: the batch signatures are consumed twice (prefix collect +
    # join) and the batch is micro-batch-sized by construction
    qb = _with_pfx(
        banded_signatures(batch, text_col, id_col, num_hashes, bands, shingle_k),
        n_prefixes).cache()
    prefixes = [r[0] for r in qb.select(PFX).distinct().collect()]
    idx = (spark.read.parquet(os.path.join(path, "bands"))
           .filter(F.col(PFX).isin(prefixes)))
    joined = idx.alias("i").join(
        qb.alias("q"),
        (F.col("i.band") == F.col("q.band"))
        & (F.col("i.bucket") == F.col("q.bucket"))
        & (F.col(f"i.{id_col}") != F.col(f"q.{id_col}")))
    return (joined.select(F.col(f"i.{id_col}").alias("id_existing"),
                          F.col(f"q.{id_col}").alias("id_new"))
            .distinct())


def append_lsh_index(spark: SparkSession, path: str, batch: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id") -> None:
    """Add the batch's signatures to the index (append: new files land
    only under the batch's prefixes; history is never rewritten)."""
    num_hashes, bands, shingle_k, n_prefixes = _read_meta(spark, path)
    banded = _with_pfx(
        banded_signatures(batch, text_col, id_col, num_hashes, bands, shingle_k),
        n_prefixes)
    banded.write.mode("append").partitionBy(PFX) \
        .parquet(os.path.join(path, "bands"))
