"""Context-window chunking, temperature resampling, and batch-inference
plumbing: invariants beyond the oracle parity sweep."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import inference as inf
from cdc_data_pipeline_spark.operators import sampling as sp
from cdc_data_pipeline_spark.operators.chunking import chunk_documents
from cdc_data_pipeline_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")


# ------------------------------------------------------------- chunking

def test_chunks_cover_and_overlap(spark, sf_dir):
    """Every token appears in some chunk; consecutive chunks share
    exactly `overlap` tokens; all but the last chunk are full size."""
    docs = _docs(spark, sf_dir).limit(50)
    chunk, overlap = 16, 4
    out = chunk_documents(docs, chunk, overlap).collect()
    tok_counts = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", F.size(F.filter(F.split("text", r"\s+"),
                                  lambda t: t != F.lit(""))).alias("n")).collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(tok_counts)
    step = chunk - overlap
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = tok_counts[doc_id]
        # starts cover [0, n): last start < n, next start would be >= n
        assert rows[-1]["chunk_id"] * step < n
        for i, r in enumerate(rows):
            assert r["chunk_id"] == i
            expect = min(chunk, n - i * step)
            assert r["n_tokens"] == expect
        for a, b in zip(rows, rows[1:]):
            if a["n_tokens"] == chunk:
                shared_a = a["chunk_text"].split(" ")[step:]
                shared_b = b["chunk_text"].split(" ")[:overlap]
                assert shared_a == shared_b


def test_chunk_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "  padded   tokens  "), (4, "a b c d e")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_id"]): r
           for r in chunk_documents(df, chunk_tokens=3, overlap=1).collect()}
    assert out[(1, 0)]["chunk_text"] == "" and out[(1, 0)]["n_tokens"] == 0
    assert out[(2, 0)]["chunk_text"] == "one"
    assert out[(3, 0)]["chunk_text"] == "padded tokens"
    # 5 tokens, chunk 3 step 2 -> starts 0,2,4
    assert out[(4, 0)]["chunk_text"] == "a b c"
    assert out[(4, 1)]["chunk_text"] == "c d e"
    assert out[(4, 2)]["chunk_text"] == "e" and out[(4, 2)]["n_tokens"] == 1


def test_chunking_plan_has_no_shuffle(spark, sf_dir):
    plan = chunk_documents(_docs(spark, sf_dir))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- temperature resampling

def test_temperature_resample_rates(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    kept = sp.temperature_resample(docs, "lang", "doc_id", alpha=0.5)
    n_in = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in
             kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    mx = max(n_in.values())
    import math
    for lang, n in n_in.items():
        rate = math.sqrt(n / mx)
        got = n_out.get(lang, 0)
        if n == mx:
            assert got == n, "anchor domain must be kept whole"
        else:
            assert got <= n
            # binomial 4-sigma envelope
            sd = math.sqrt(n * rate * (1 - rate))
            assert abs(got - n * rate) <= 4 * sd + 1


def test_temperature_resample_deterministic_subset(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in
         sp.temperature_resample(docs, "lang", "doc_id").collect()}
    b = {r["doc_id"] for r in
         sp.temperature_resample(docs.repartition(7), "lang", "doc_id").collect()}
    assert a == b, "membership must not depend on partition layout"
    assert a < {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_temperature_alpha_one_keeps_everything(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    assert sp.temperature_resample(docs, "lang", "doc_id", alpha=1.0).count() \
        == docs.count()


# ---------------------------------------------------- inference plumbing

def test_stub_embedding_matches_python_reference(spark, sf_dir):
    rows = inf.embed_texts(_docs(spark, sf_dir).select("doc_id", "text").limit(20),
                           dim=4).collect()
    assert rows
    for r in rows:
        assert len(r["embedding"]) == 4
        for i, v in enumerate(r["embedding"]):
            h = hashlib.md5(f"0|{r['text']}|{i}".encode()).hexdigest()
            assert v == int(h[:15], 16) / float(1 << 60) * 2.0 - 1.0


def test_embed_batching_invariant(spark, sf_dir):
    """Sub-batching must not change results (the Arrow batch size is a
    memory knob, never a semantics knob)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text").limit(100)
    a = {r["doc_id"]: r["embedding"]
         for r in inf.embed_texts(docs, dim=3).collect()}
    b = {r["doc_id"]: r["embedding"]
         for r in inf.embed_texts(docs, dim=3, batch_rows=7).collect()}
    assert a == b


def test_embed_plan_no_shuffle_and_schema(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = inf.embed_texts(docs, dim=2)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text", "embedding"]
    assert out.schema["embedding"].dataType.simpleString() == "array<double>"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------ bigram LM scoring

def test_lm_score_reference_model(spark):
    """Scoring against an externally trained model: clean text scores
    lower nll than noise under a model trained on clean text only."""
    from cdc_data_pipeline_spark.operators import lm

    clean = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(20)], "doc_id long, text string")
    model = lm.train_bigram_lm(clean)
    probe = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "qqxx zzqq xxzz qzqz")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["nll"] for r in
           lm.lm_score(probe, model=model).collect()}
    assert got[1] < got[2]


def test_lm_score_short_docs_null(spark):
    from cdc_data_pipeline_spark.operators import lm

    df = spark.createDataFrame([(1, ""), (2, "a"), (3, "ab")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in lm.lm_score(df).collect()}
    assert rows[1]["nll"] is None and rows[1]["n_bigrams"] == 0
    assert rows[2]["nll"] is None and rows[2]["n_bigrams"] == 0
    assert rows[3]["nll"] is not None and rows[3]["n_bigrams"] == 1


def test_lm_score_model_is_broadcast(spark, sf_dir):
    from cdc_data_pipeline_spark.operators import lm

    plan = lm.lm_score(_docs(spark, sf_dir))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_backoff_lm_hand_case_and_pruning(spark):
    """Stupid-backoff trigram scoring against a hand computation, plus
    the pruning fallback: with min_count high enough to prune every
    trigram, scores must come from the bigram/unigram backoff chain."""
    import math

    from cdc_data_pipeline_spark.operators import lm

    toy = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d e f"), (3, "x")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.nll)
           for r in lm.backoff_score(toy, min_count=1).collect()}
    # corpus trigram counts: abc:3 bca:1 cab:1 bcd:1 cde:1 def:1
    # bigram counts: ab:3 bc:3 ca:1 cd:1 de:1 ef:1
    # doc1 trigrams: abc(S=3/3) bca(1/3) cab(1/1) abc(3/3)
    d1 = round(-(math.log(1) + math.log(1 / 3) + math.log(1) + math.log(1)) / 4, 6)
    # doc2: abc(3/3) bcd(1/3) cde(1/1) def(1/1)
    d2 = round(-(math.log(1) + math.log(1 / 3) + math.log(1) + math.log(1)) / 4, 6)
    assert got[1] == (4, d1) and got[2] == (4, d2)
    assert got[3] == (0, None)
    # min_count=2 prunes every trigram except abc and every bigram
    # except ab/bc: bca falls back to bigram? bc kept (3) ->
    # a*c(ca)/c(b)... ca pruned -> unigram fallback
    pruned = {r.doc_id: r.nll
              for r in lm.backoff_score(toy, min_count=2).collect()}
    assert pruned[1] is not None and pruned[1] > got[1][1]
    # scoring against an externally trained model (clean-corpus shape)
    model = lm.train_backoff_lm(toy.filter("doc_id = 2"), min_count=1)
    ext = {r.doc_id: r.nll
           for r in lm.backoff_score(toy, model=model, min_count=1).collect()}
    assert ext[2] == 0.0  # every trigram of doc2 is deterministic in it
