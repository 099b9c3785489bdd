"""One-call training-corpus curation build: the operator families
composed into the standard flow a data team actually runs —

    quality gate -> exact dedup -> fuzzy (MinHash-cluster) dedup ->
    duplicated-span masking -> eval-set decontamination ->
    token-budget shard packing -> materialized shard directories

Each stage is one of the independently-oracle-checked operators
(`gopher_quality`, `dedup_exact`, `lsh_candidate_pairs` +
`dedup_clusters`, `mask_duplicated_spans`, `decontaminate`,
`pack_token_shards`); this module only wires them and records the
per-stage funnel counts — the audit trail a corpus build must keep.

Scale: every stage is a pure DataFrame transform (no collects beyond
the funnel counts, which are scalar aggregations); the shard write is
one hash exchange on the packed shard id. The funnel dict is the same
information the reference surfaces per-asset through Dagster
``Output(rows_loaded, ...)`` (extract_assets.py:148-159), here per
curation stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import token_count
from cdc_data_pipeline_spark.operators.curation import decontaminate, gopher_quality
from cdc_data_pipeline_spark.operators.dedup import (
    dedup_clusters, dedup_exact, lsh_candidate_pairs)
from cdc_data_pipeline_spark.operators.packing import pack_token_shards, shard_manifest
from cdc_data_pipeline_spark.operators.segments import mask_duplicated_spans


def curate_corpus(docs: DataFrame, eval_df: DataFrame | None = None, *,
                  out_path: str | None = None,
                  budget: int = 4096,
                  min_words: int = 10,
                  stopwords: tuple[str, ...] = ("the", "a"),
                  min_stop_hits: int = 1,
                  span_n: int = 5,
                  ngram: int = 3, max_overlap: float = 0.8,
                  num_hashes: int = 8, bands: int = 4,
                  shingle_k: int = 3,
                  mixture: dict[str, float] | None = None,
                  domain_col: str = "source",
                  normalize_unicode: str | None = None) -> tuple[DataFrame, dict]:
    """Run the full curation flow over ``docs`` (doc_id, text, ...).

    Returns ``(packed, funnel)``: the surviving corpus with
    ``n_tokens`` and ``shard_id`` columns, plus the per-stage count
    funnel. If ``out_path`` is given the shards are also written as
    ``shard_id=K`` parquet directories.

    ``normalize_unicode`` (e.g. ``"NFC"``) prepends the fineweb-style
    cleanup stage — unicode normalization + control-char strip
    (``functions.text.unicode_clean_udf``) — so every downstream
    fingerprint/shingle/dedup decision sees canonical bytes (two
    byte-different encodings of the same text dedup as equals).
    Default off: it is a no-op on already-clean corpora and the
    funnel stays comparable with earlier rounds.

    The default quality knobs match the fixture corpus (synthetic
    vocabulary, short docs) the way ``test_full_curation_pipeline``
    documents; production keeps the Gopher defaults.
    """
    # each stage is pinned (localCheckpoint) BEFORE its funnel count,
    # so the count and every downstream stage read the materialized
    # result instead of re-running the whole upstream chain — without
    # the pin, the quality gate and LSH pair generation execute ~5-7
    # times per build (once per later count / manifest / write). Same
    # pattern as dedup.connected_components' edge-list checkpoint.
    def _pin(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    funnel = {"input": docs.count()}

    if normalize_unicode is not None:
        from cdc_data_pipeline_spark.functions.text import unicode_clean_udf

        docs = docs.withColumn(
            "text", unicode_clean_udf(normalize_unicode)(F.col("text")))

    gated = _pin(docs.join(
        gopher_quality(docs, min_words=min_words, stopwords=stopwords,
                       min_stop_hits=min_stop_hits)
        .select("doc_id", "passes"), "doc_id").filter("passes").drop("passes"))
    funnel["after_quality"] = gated.count()

    exact = _pin(gated.join(dedup_exact(gated).select("doc_id"), "doc_id"))
    funnel["after_exact_dedup"] = exact.count()

    pairs = lsh_candidate_pairs(exact, num_hashes=num_hashes, bands=bands,
                                shingle_k=shingle_k)
    keep = (dedup_clusters(exact, pairs)
            .filter(F.col("is_canonical")).select("doc_id"))
    fuzzy = _pin(exact.join(keep, "doc_id"))
    funnel["after_fuzzy_dedup"] = fuzzy.count()

    masked = _pin(mask_duplicated_spans(fuzzy, n=span_n)
                  .select("doc_id", F.col("clean_text").alias("text"))
                  .filter(F.col("text") != ""))
    funnel["after_span_mask"] = masked.count()

    if eval_df is not None:
        clean = _pin(decontaminate(masked, eval_df, n=ngram,
                                   max_overlap=max_overlap))
    else:
        clean = masked
    funnel["after_decontaminate"] = clean.count()

    if mixture is not None:
        from cdc_data_pipeline_spark.operators.sampling import mixture_sample

        # the masker dropped the domain column with the other payload
        # cols; re-attach it for the mixture decision
        if domain_col not in clean.columns:
            clean = clean.join(docs.select("doc_id", domain_col), "doc_id")
        clean = _pin(mixture_sample(clean, domain_col, mixture, "doc_id"))
        funnel["after_mixture"] = clean.count()

    counted = clean.withColumn("n_tokens", token_count("text").cast("long"))
    packed = _pin(pack_token_shards(counted, budget=budget,
                                    token_col="n_tokens", order_col="doc_id"))
    man = shard_manifest(packed, "n_tokens").agg(
        F.count(F.lit(1)).alias("shards"),
        F.sum("n_tokens").alias("tokens")).first()
    funnel["shards"] = int(man["shards"] or 0)
    funnel["total_tokens"] = int(man["tokens"] or 0)

    if out_path is not None:
        # range partitioning gives one writer task per shard id; hash
        # would collide shard ids into shared tasks and leave others
        # idle (correctness unaffected — partitionBy still separates)
        (packed.repartitionByRange(max(funnel["shards"], 1), "shard_id")
               .sortWithinPartitions("shard_id", "doc_id")
               .write.mode("overwrite").partitionBy("shard_id")
               .parquet(out_path))
    return packed, funnel
