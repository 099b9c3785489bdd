"""BPE tokenizer training: classic-corpus merges, determinism,
segmentation round-trip, early stop."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import bpe
from cdc_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF0001


def _classic(spark):
    rows, i = [], 0
    for w, n in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)):
        for _ in range(n):
            rows.append((i, w)); i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_learns_classic_merges(spark):
    """Sennrich et al.'s hand-computable corpus: 'es' (freq 9) merges
    first, then 'est', then 'est</w>'; 'newest' collapses to one
    token; unseen-compositions segment into learned subwords."""
    df = _classic(spark)
    merges = bpe.train_bpe(df, num_merges=10, min_pair_count=2)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    seg = {r.segmented for r in bpe.bpe_segment(df, merges).collect()}
    assert "newest</w>" in seg           # full-word token
    assert "low|e|r|</w>" in seg         # low merged, suffix split
    # the artifact generalizes: 'lowest' was never seen whole
    unseen = spark.createDataFrame([(99, "lowest")], "doc_id long, text string")
    got = bpe.bpe_segment(unseen, merges).first()
    assert got.segmented == "low|est</w>"
    assert got.n_tokens == 2


def test_bpe_training_is_deterministic_and_layout_independent(spark):
    df = _classic(spark)
    m1 = bpe.train_bpe(df, num_merges=6)
    m2 = bpe.train_bpe(df.repartition(7), num_merges=6)
    assert m1 == m2


def test_bpe_local_and_distributed_loops_learn_identical_merges(spark):
    """The driver-side incremental merge loop (vocab fits) and the
    distributed per-merge loop must produce the same ordered merge
    list — same counts, same (count desc, pair asc) tiebreak."""
    df = _classic(spark)
    local = bpe.train_bpe(df, num_merges=10)
    dist = bpe.train_bpe(df, num_merges=10, local_vocab_limit=0)
    assert local == dist and local[:3] == [("e", "s"), ("es", "t"),
                                           ("est", "</w>")]
    # and on a messier corpus slice (ties, unicode, longer words)
    docs = read_table(spark, SF0001, "documents").limit(60)
    local2 = bpe.train_bpe(docs, num_merges=8)
    dist2 = bpe.train_bpe(docs, num_merges=8, local_vocab_limit=0)
    assert local2 == dist2 and len(local2) == 8


def test_bpe_early_stop_and_empty(spark):
    """All pairs unique -> nothing reaches min_pair_count=2 after the
    distinct words' own merges; empty corpus trains nothing."""
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=50, min_pair_count=2)
    assert len(merges) < 50              # stopped early
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe.train_bpe(empty, num_merges=5) == []
    out = bpe.bpe_segment(empty, [("a", "b")])
    assert out.count() == 0


def test_bpe_on_fixture_compresses_tokens(spark, sf_dir):
    """On the synthetic corpus, learned merges must strictly compress:
    BPE token count < raw character count, >= word count."""
    docs = read_table(spark, sf_dir, "documents").limit(100)
    merges = bpe.train_bpe(docs, num_merges=12)
    assert len(merges) == 12
    agg = (bpe.bpe_segment(docs, merges)
           .agg(F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w"))
           .first())
    chars = docs.agg(F.sum(F.length("text"))).first()[0]
    assert agg["w"] <= agg["t"] < chars


def test_bpe_trainer_and_encoder_tokenize_identically(spark):
    """Unicode whitespace (NBSP): the trainer's Java \\s+ split is
    ASCII-only, so 'vis\\u00a0major' is ONE word — the encoder must
    agree (a plain Python str.split() would split it in two and the
    learned merges would never apply)."""
    df = spark.createDataFrame(
        [(i, "vis major ok") for i in range(4)],
        "doc_id long, text string")
    from cdc_data_pipeline_spark.functions.text import token_count
    n_words_native = df.select(token_count("text").alias("n")).first()["n"]
    merges = bpe.train_bpe(df, num_merges=4, min_pair_count=2)
    got = bpe.bpe_segment(df.limit(1), merges).first()
    assert got.n_words == n_words_native == 2
    # the fused word segments as subwords of ONE word (merges apply)
    assert got.segmented.count(" ") == 1
