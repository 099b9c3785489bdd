"""End-to-end training-data curation pipeline: the operators compose
into the real flow — quality gate -> exact dedup -> near-dup prune ->
decontamination -> span masking -> packing — with corpus-size
monotonicity and final shard integrity checked at every stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.clustering import semdedup_prune
from cdc_data_pipeline_spark.operators.curation import decontaminate, gopher_quality
from cdc_data_pipeline_spark.operators.dedup import dedup_exact
from cdc_data_pipeline_spark.operators.packing import pack_token_shards, shard_manifest
from cdc_data_pipeline_spark.operators.segments import mask_duplicated_spans
from cdc_data_pipeline_spark.functions.text import token_count
from tests.conftest import SF0001


def test_full_curation_pipeline(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").repartition(8)
    n0 = docs.count()

    # 1. quality gate (fixture docs are short and the corpus vocabulary
    # is synthetic: relax the word floor and use corpus stopwords —
    # production keeps the Gopher defaults)
    gated = docs.join(
        gopher_quality(docs, min_words=10,
                       stopwords=("the", "a"), min_stop_hits=1)
        .select("doc_id", "passes"), "doc_id"
    ).filter("passes").drop("passes")
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 2. exact dedup (keep lowest doc_id per fingerprint, rejoin text)
    keep_ids = dedup_exact(gated).select("doc_id")
    exact = gated.join(keep_ids, "doc_id")
    n2 = exact.count()
    assert 0 < n2 <= n1

    # 3. span masking (remove corpus-duplicated substrings in place)
    masked = mask_duplicated_spans(exact, n=5)
    assert masked.count() == n2
    assert masked.filter(F.col("n_kept") > F.col("n_tokens")).count() == 0
    masked_docs = masked.select("doc_id", F.col("clean_text").alias("text")) \
        .filter(F.col("text") != "")

    # 4. decontamination against a pseudo eval set
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(masked_docs, ev, n=3, max_overlap=0.8)
    n4 = clean.count()
    assert 0 < n4 <= n2

    # 5. pack into token-budget shards and check integrity
    counted = clean.withColumn("n_tokens", token_count("text").cast("long"))
    packed = pack_token_shards(counted, budget=256, token_col="n_tokens",
                               order_col="doc_id")
    man = sorted(shard_manifest(packed, "n_tokens").collect(),
                 key=lambda r: r["shard_id"])
    assert sum(r["n_docs"] for r in man) == n4
    # greedy packing law: a non-final shard deviates from the budget by
    # less than one document's tokens (boundary doc may straddle)
    max_doc = counted.agg(F.max("n_tokens")).first()[0]
    for r in man[:-1]:
        assert 256 - max_doc < r["n_tokens"] < 256 + max_doc

    # 6. semantic near-dup prune composes on the embedding table too
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    kept = semdedup_prune(emb, k=4, threshold=0.95)
    assert 0 < kept.count() <= emb.count()


def test_curate_corpus_one_call(spark, tmp_path):
    """plans.curate.curate_corpus: the composed build produces a
    monotone funnel, writes shard directories, and the written rows
    equal the final stage count."""
    from cdc_data_pipeline_spark.plans.curate import curate_corpus

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    out = str(tmp_path / "shards")
    packed, funnel = curate_corpus(docs, ev, out_path=out, budget=256)
    order = ["input", "after_quality", "after_exact_dedup",
             "after_fuzzy_dedup", "after_span_mask", "after_decontaminate"]
    vals = [funnel[k] for k in order]
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0
    assert funnel["shards"] >= 1 and funnel["total_tokens"] > 0
    back = spark.read.parquet(out)
    assert back.count() == funnel["after_decontaminate"]
    assert back.select("shard_id").distinct().count() == funnel["shards"]


def test_curate_corpus_with_mixture(spark, tmp_path):
    """Optional mixture stage: targets shape the kept mix and the
    funnel records the extra stage."""
    from cdc_data_pipeline_spark.plans.curate import curate_corpus

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    w = {"src0": 0.5, "src1": 0.5}
    packed, funnel = curate_corpus(docs, None, budget=256, mixture=w)
    assert funnel["after_mixture"] <= funnel["after_decontaminate"]
    assert funnel["after_mixture"] > 0
    kept_sources = {r["source"] for r in
                    packed.select("source").distinct().collect()}
    assert kept_sources <= set(w)


def test_simhash_xxhash_single_pass_plan(spark, sf_dir):
    """The engine-internal (xxhash) simhash must hash each token ONCE
    and fold a vote-vector accumulator in a single pass — the r3 shape
    unrolled one aggregate per bit (32 passes over every token array).
    The plan therefore contains exactly one xxhash64 call."""
    from cdc_data_pipeline_spark.operators import dedup as dd
    from cdc_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = dd.simhash(docs, bits=32)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("xxhash64") == 1, plan.count("xxhash64")
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r.simhash < (1 << 32) for r in rows)
    # 64-bit variant exercises the sign-bit mask
    h64 = dd.simhash(docs.limit(50), bits=64)
    assert h64.count() == 50
    # deterministic
    again = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    assert again == {r.doc_id: r.simhash for r in rows}


def test_curation_unicode_stage_dedups_byte_variants(spark):
    """With normalize_unicode='NFC', two byte-different encodings of
    the same text (composed vs decomposed accents) become exact
    duplicates and collapse in the exact-dedup stage; default-off
    keeps them distinct."""
    from cdc_data_pipeline_spark.plans.curate import curate_corpus

    base = "the cafe serves the usual menu a bit late " * 2
    composed = base + "café"
    decomposed = base + "café"
    extra = [(i, "the quick brown fox number %d jumps over a lazy dog %d ok"
              % (i, i)) for i in range(3, 15)]
    docs = spark.createDataFrame(
        [(1, composed), (2, decomposed)] + extra, "doc_id long, text string")

    _, fun_off = curate_corpus(docs, min_words=5)
    _, fun_on = curate_corpus(docs, min_words=5, normalize_unicode="NFC")
    assert fun_off["after_exact_dedup"] == fun_on["after_exact_dedup"] + 1
