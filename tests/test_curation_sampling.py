"""Operator-level tests for the curation / sampling / sketch / packing
/ clustering families (the catalog oracle parity in
test_oracle_parity.py covers end-to-end values; these pin the operator
CONTRACTS: determinism, exactness, mergeability, scale shape)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_data_pipeline_spark.functions.hashing import uniform_hash
from cdc_data_pipeline_spark.functions.text import token_count
from cdc_data_pipeline_spark.operators import clustering as cl
from cdc_data_pipeline_spark.operators import curation as cu
from cdc_data_pipeline_spark.operators import packing as pk
from cdc_data_pipeline_spark.operators import sampling as sp
from cdc_data_pipeline_spark.operators import sketches as sk
from cdc_data_pipeline_spark.sources.readers import read_table


# ------------------------------------------------------------------ sampling

def test_hash_sample_deterministic_and_layout_independent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in sp.hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    b = {r.doc_id for r in
         sp.hash_sample(docs.repartition(7), 0.3, "doc_id").select("doc_id").collect()}
    assert a == b and a  # same membership regardless of partitioning
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # ~Bernoulli(0.3)


def test_fast_hash_sample_matches_contract(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    got = sp.hash_sample(docs, 0.3, "doc_id", fast=True).count()
    assert 0.2 * n < got < 0.4 * n


def test_split_column_exclusive_exhaustive(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    lab = docs.withColumn("split", sp.split_column(
        "doc_id", [("test", 0.1), ("valid", 0.1), ("train", 0.8)]))
    counts = {r["split"]: r["cnt"] for r in
              lab.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive
    assert 0.6 * n < counts["train"]
    assert counts["test"] and counts["valid"]
    # membership is stable: re-derive and compare
    again = docs.withColumn("split", sp.split_column(
        "doc_id", [("test", 0.1), ("valid", 0.1), ("train", 0.8)]))
    assert lab.exceptAll(again).count() == 0


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = sp.stratified_sample_exact(docs, ["lang"], 5, "doc_id")
    per = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    avail = {r.lang: r.cnt for r in
             docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, cnt in per.items():
        assert cnt == min(5, avail[lang])


def test_weighted_sample_prefers_heavy_rows(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = sp.weighted_sample_topk(docs, ["lang"], 10, "n_chars", "doc_id")
    sample_mean = out.agg(F.avg("n_chars")).first()[0]
    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > pop_mean  # inclusion prob proportional to weight


# ------------------------------------------------------------------ sketches

def test_kmv_estimate_accuracy(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    est = {r.event_type: r.distinct_est
           for r in sk.kmv_estimate(e, ["event_type"], "user_id", k=64).collect()}
    true = {r.event_type: r.cnt for r in
            e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("cnt")).collect()}
    for t, d in true.items():
        rel = abs(est[t] - d) / d
        assert rel < 0.35, (t, est[t], d)  # KMV k=64 → ~1/sqrt(64) error


def test_kmv_partials_merge_equals_oneshot(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    oneshot = sk.kmv_estimate(e, ["event_type"], "user_id", k=32)
    # split the data arbitrarily, sketch each part, merge
    p1 = sk.kmv_partials(e.filter(F.col("event_id") % 3 != 0),
                         ["event_type"], "user_id", k=32, shards=8)
    p2 = sk.kmv_partials(e.filter(F.col("event_id") % 3 == 0),
                         ["event_type"], "user_id", k=32, shards=8)
    merged = sk.kmv_merge(p1.unionByName(p2), ["event_type"], k=32)
    assert merged.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(merged).count() == 0


# ------------------------------------------------------------------- packing

def test_pack_token_shards_matches_naive_global_cumsum(spark, sf_dir):
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tok"))
    packed = pk.pack_token_shards(docs, 1500, "n_tok", "doc_id", chunk=64)

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = docs.withColumn(
        "shard_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 1500).cast("long"))
    assert packed.select("doc_id", "shard_id") \
                 .exceptAll(naive.select("doc_id", "shard_id")).count() == 0


def test_pack_token_shards_budget_invariants(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tok"))
    packed = pk.pack_token_shards(docs, 1500, "n_tok", "doc_id", chunk=64)
    man = pk.shard_manifest(packed, "n_tok").orderBy("shard_id").collect()
    max_doc = docs.agg(F.max("n_tok")).first()[0]
    # a shard deviates from budget by at most one document's tokens:
    # under-full only when the previous shard's last doc overflowed in,
    # over-full only by its own boundary-crossing last doc
    for row in man[:-1]:
        assert 1500 - max_doc < row.n_tokens < 1500 + max_doc, row
    assert sum(r.n_docs for r in man) == docs.count()


# ------------------------------------------------------------------ curation

def test_contamination_flags_planted_eval_docs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    cont = cu.contamination(docs, ev, n=3)
    # the eval docs themselves overlap fully
    self_rows = cont.filter(F.col("doc_id") % 50 == 0).collect()
    assert self_rows and all(r.overlap == 1.0 for r in self_rows)
    cleaned = cu.decontaminate(docs, ev, n=3, max_overlap=0.99)
    assert cleaned.filter(F.col("doc_id") % 50 == 0).count() == 0
    assert cleaned.count() == docs.count() - len(self_rows)


def test_scrub_pii_removes_all_matches(spark):
    rows = [
        (1, "mail me at alice.smith+x@corp.example.org today"),
        (2, "call 555-123-4567 or +44 123-456-7890x"),
        (3, "server at 192.168.0.1 and 10.0.255.7."),
        (4, "clean text with no pii at all"),
        (5, "10.1.2.3 leading and trailing 172.16.0.9"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scrubbed = df.select("doc_id", cu.scrub_pii("text").alias("text"))
    m = cu.pii_metrics(scrubbed)
    leftover = m.filter((F.col("n_email") > 0) | (F.col("n_phone") > 0)
                        | (F.col("n_ip") > 0))
    assert leftover.count() == 0
    kept = {r.doc_id: r.text for r in scrubbed.collect()}
    assert "<EMAIL>" in kept[1] and "alice" not in kept[1]
    assert "<PHONE>" in kept[2]
    assert kept[3].count("<IP>") == 2
    assert kept[4] == "clean text with no pii at all"
    assert kept[5].startswith("<IP>") and kept[5].endswith("<IP>")


def test_repetition_metrics_on_degenerate_text(spark):
    rows = [
        (1, "spam spam spam spam"),          # one token repeated
        (2, "all words here are unique"),    # no repetition
        (3, ""),                             # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = {r.doc_id: r for r in cu.repetition_metrics(df).collect()}
    assert m[1].dup_token_ratio == 0.75 and m[1].top_token_ratio == 1.0
    assert m[2].dup_token_ratio == 0.0 and m[2].dup_2gram_ratio == 0.0
    assert m[3].dup_token_ratio == 0.0


# ---------------------------------------------------------------- clustering

def test_kmeans_deterministic_and_complete(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    a = cl.kmeans(e, k=4, iters=2).select("vec_id", "cluster")
    b = cl.kmeans(e.repartition(5), k=4, iters=2).select("vec_id", "cluster")
    assert a.exceptAll(b).count() == 0  # layout-independent
    assert a.count() == e.count()
    assert a.select("cluster").distinct().count() <= 4


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    cents0 = cl.init_centroids(e, 4)

    def inertia(assigned, cents):
        by_cid = dict(cents)
        total = 0.0
        for r in assigned.select("cluster", "embedding").collect():
            c = by_cid[r.cluster]
            total += sum((float(x) - y) ** 2 for x, y in zip(r.embedding, c))
        return total

    a1 = cl.assign_clusters(e, cents0)
    cents1 = cl.recompute_centroids(a1)
    a2 = cl.assign_clusters(e, cents1)
    assert inertia(a2, cents1) < inertia(a1, cents0)


def test_semdedup_engines_agree_exactly(spark, sf_dir):
    """The vectorized Arrow engine must emit the SAME rounded pairs as
    the JVM higher-order-function join (the shape the oracle mirrors):
    numpy matmul summation order may differ from the sequential fold,
    but never by enough to cross a 6-dp rounding boundary."""
    e = read_table(spark, sf_dir, "embeddings")
    a = cl.semdedup_pairs(e, k=4, threshold=0.3, engine="arrow")
    n = cl.semdedup_pairs(e, k=4, threshold=0.3, engine="native") \
          .select("cluster", "id_a", "id_b", "cos")
    assert a.exceptAll(n).count() == 0
    assert n.exceptAll(a).count() == 0


def test_semdedup_prune_drops_higher_id_of_each_pair(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    pairs = cl.semdedup_pairs(e, k=4, threshold=0.3)
    doomed = {r.id_b for r in pairs.select("id_b").distinct().collect()}
    kept = cl.semdedup_prune(e, k=4, threshold=0.3)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert doomed and not (doomed & kept_ids)
    assert kept_ids | doomed == {r.vec_id for r in e.select("vec_id").collect()}


def test_uniform_hash_fast_and_oracle_paths_are_uniformish(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    for fast in (False, True):
        mean = docs.select(F.avg(uniform_hash("doc_id", fast=fast))).first()[0]
        assert 0.4 < mean < 0.6


def test_gopher_quality_rules(spark):
    from cdc_data_pipeline_spark.operators.curation import gopher_quality

    good = "the cat and the dog have fun with all of that " * 5  # 55 words
    rows = spark.createDataFrame(
        [
            (1, good),
            (2, "the of short"),                       # too few words
            (3, ("- " + "the of item with have\n") * 12),  # bullet lines
            (4, " ".join(["zzzz"] * 60)),              # no stopwords
            (5, good + " ##########" * 40),            # symbol storm
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(rows, min_words=50).collect()}
    assert out[1]["passes"] is True
    assert out[2]["passes"] is False and out[2]["n_words"] == 3
    assert out[3]["passes"] is False and out[3]["bullet_ratio"] > 0.9
    assert out[4]["passes"] is False and out[4]["stop_hits"] == 0
    assert out[5]["passes"] is False and out[5]["symbol_ratio"] > 0.1


def test_gopher_quality_tokenless_doc_yields_null_mean(spark):
    """Empty / whitespace-only docs: mean_word_len must be NULL (SQL
    SUM-over-empty), matching the DuckDB oracle's list_sum([]) = NULL —
    not 0.0, which would silently diverge if the fixture ever grows an
    empty text. The doc still fails `passes` via the word-count rule."""
    from cdc_data_pipeline_spark.operators.curation import gopher_quality

    rows = spark.createDataFrame(
        [(1, ""), (2, "   \n  "), (3, "the of and that have with tok " * 8)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(rows, min_words=5).collect()}
    assert out[1]["mean_word_len"] is None and out[1]["n_words"] == 0
    assert out[2]["mean_word_len"] is None and out[2]["passes"] is False
    assert out[3]["mean_word_len"] is not None


def test_normalize_features_semantics(spark):
    from cdc_data_pipeline_spark.operators.stats import normalize_features

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)], "g string, v double")
    out = {(r["g"], r["v_z"], r["v_mm"])
           for r in normalize_features(df, ["v"], by=["g"]).collect()}
    # group a: mean 2, sd sqrt(2) -> z = +-0.707107; mm 0/1
    assert ("a", -0.707107, 0.0) in out and ("a", 0.707107, 1.0) in out
    # constant group: sd 0 and hi==lo -> NULLs, not crashes
    assert ("b", None, None) in out


def test_correlation_matrix_known_values(spark):
    from cdc_data_pipeline_spark.operators.stats import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.1)],
        "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == 1.0          # exact linear
    assert got[("x", "z")] < -0.99         # near-perfect negative
    assert len(got) == 3


def test_approx_percentiles_within_rank_error(spark):
    """GK sketch percentiles stay within the guaranteed rank error of
    the exact interpolated percentiles on real data."""
    from cdc_data_pipeline_spark.operators.stats import approx_percentiles

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    approx = {r["o_orderpriority"]: r for r in approx_percentiles(
        orders, "o_totalprice", by=["o_orderpriority"]).collect()}
    exact = {r["o_orderpriority"]: r for r in orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(approx) == set(exact)
    for k, e in exact.items():
        a = approx[k]
        assert a["n"] == e["n"]
        # value at most one sorted-neighbour step away: compare ranks
        vals = sorted(v["o_totalprice"] for v in
                      orders.filter(F.col("o_orderpriority") == k).collect())
        for pa, pe, frac in ((a["p50"], e["p50"], 0.5), (a["p95"], e["p95"], 0.95)):
            import bisect
            rank = bisect.bisect_left(vals, pa) / max(len(vals) - 1, 1)
            assert abs(rank - frac) < 0.01, (k, frac, rank)


def test_assign_engines_agree(spark, sf_dir):
    """Arrow (numpy batch matmul) and native (plan-literal fold)
    assignment must produce identical clusters — the arrow path is the
    production route for large k*dim, the native path the
    oracle-checked one."""
    emb = read_table(spark, sf_dir, "embeddings")
    cents = cl.init_centroids(emb, 8)
    a = {r.vec_id: r.cluster for r in
         cl.assign_clusters(emb, cents, engine="native").collect()}
    b = {r.vec_id: r.cluster for r in
         cl.assign_clusters(emb, cents, engine="arrow").collect()}
    assert a == b and len(a) == emb.count()


def test_kmeans_arrow_engine_matches_native(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    a = {r.vec_id: r.cluster for r in cl.kmeans(emb, 4, iters=2).collect()}
    b = {r.vec_id: r.cluster for r in
         cl.kmeans(emb, 4, iters=2, engine="arrow").collect()}
    assert a == b


def test_mixture_sample_hits_target_proportions(spark, sf_dir):
    """The kept mix matches the target proportions in expectation, the
    binding (scarcest-relative-to-target) domain keeps everything, and
    out-of-mixture domains are dropped entirely."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    w = {"src0": 0.2, "src1": 0.2, "src2": 0.6}
    kept = sp.mixture_sample(docs, "source", w, "doc_id", seed=3)
    counts = {r["source"]: r["count"] for r in
              kept.groupBy("source").count().collect()}
    assert set(counts) <= set(w)
    # src2 binds (25 docs against a 0.6 target): keeps all 25; the 0.2
    # domains should keep ~25*(0.2/0.6) ~ 8.3 each in expectation
    assert counts["src2"] == 25
    for d in ("src0", "src1"):
        assert 2 <= counts.get(d, 0) <= 16
    # deterministic and layout-independent
    again = sp.mixture_sample(docs.repartition(9), "source", w, "doc_id", seed=3)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == \
        {r.doc_id for r in again.select("doc_id").collect()}
    # empty weight set -> empty result
    assert sp.mixture_sample(docs, "source", {}, "doc_id").count() == 0


def test_mixture_repeat_semantics(spark, sf_dir):
    """Epoch-aware mixture: binding domain repeats ~max_epochs times,
    proportions hit the targets, the epoch column numbers copies
    densely from 0, max_epochs=1 reproduces mixture_sample's kept set,
    and the result is layout-independent."""
    from cdc_data_pipeline_spark.operators import sampling as sp

    docs = read_table(spark, sf_dir, "documents")
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = sp.mixture_repeat(docs, "source", w, "doc_id",
                            max_epochs=2.0, seed=13)
    rows = out.select("doc_id", "source", "epoch").collect()
    total = len(rows)
    by_src = {}
    by_doc = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    # proportions within binomial noise of the targets
    for d, p in w.items():
        assert abs(by_src[d] / total - p) < 0.08, (d, by_src, total)
    # per-doc epochs are dense 0..c-1
    for eps in by_doc.values():
        assert sorted(eps) == list(range(len(eps)))
    # some domain actually repeated (rate > 1 somewhere at these targets)
    assert any(len(e) > 1 for e in by_doc.values())
    # max_epochs=1: kept SET == mixture_sample's kept set (same seed)
    one = sp.mixture_repeat(docs, "source", w, "doc_id",
                            max_epochs=1.0, seed=13)
    ms = sp.mixture_sample(docs, "source", w, "doc_id", seed=13)
    assert {r.doc_id for r in one.select("doc_id").collect()} == \
        {r.doc_id for r in ms.select("doc_id").collect()}
    assert one.filter(F.col("epoch") != 0).count() == 0
    # layout independence
    again = sp.mixture_repeat(docs.repartition(13), "source", w, "doc_id",
                              max_epochs=2.0, seed=13)
    assert sorted((r.doc_id, r.epoch) for r in
                  again.select("doc_id", "epoch").collect()) == \
        sorted((r.doc_id, r.epoch) for r in rows)


def test_unicode_clean_normalizes_and_strips(spark):
    """NFC composes decomposed accents, control chars (except
    tab/newline) are stripped, ligatures are preserved under NFC (and
    folded under NFKC), nulls pass through."""
    from cdc_data_pipeline_spark.functions.text import unicode_clean_udf

    rows = [(1, "café"), (2, "a\x07b\x00c"), (3, "ﬁne ①"),
            (4, "tab\there\nline"), (5, None)]
    df = spark.createDataFrame(rows, "id long, t string")
    nfc = {r.id: r.c for r in
           df.select("id", unicode_clean_udf("NFC")(F.col("t")).alias("c")).collect()}
    assert nfc[1] == "café"            # composed
    assert nfc[2] == "abc"                   # BEL + NUL stripped
    assert nfc[3] == "ﬁne ①"      # NFC keeps compatibility chars
    assert nfc[4] == "tab\there\nline"      # tab/newline survive
    assert nfc[5] is None
    nfkc = {r.id: r.c for r in
            df.select("id", unicode_clean_udf("NFKC")(F.col("t")).alias("c")).collect()}
    assert nfkc[3] == "fine 1"               # ligature + circled digit folded


def test_pack_sequences_window_and_span_invariants(spark):
    from cdc_data_pipeline_spark.operators import packing as pk

    # token stream: 10+3+50+64+1 = 128 tokens -> exactly 2 windows of 64
    docs = spark.createDataFrame(
        [(0, 10), (1, 3), (2, 50), (3, 64), (4, 1), (5, 0)],
        "doc_id long, n_tok long")
    out = pk.pack_sequences(docs, 64, "n_tok", "doc_id", chunk=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # zero-token doc contributes nothing
    assert 5 not in by_doc
    # doc 2 starts at token 13, ends 63 -> fits window 0 entirely
    assert [(r["seq_id"], r["seq_offset"], r["frag_len"])
            for r in by_doc[2]] == [(0, 13, 50)]
    # doc 3 spans the 64-boundary: [63,127) -> 1 token in w0, 63 in w1
    frags3 = sorted((r["seq_id"], r["seq_offset"], r["doc_offset"],
                     r["frag_len"]) for r in by_doc[3])
    assert frags3 == [(0, 63, 0, 1), (1, 0, 1, 63)]
    # every window except the last sums to exactly seq_len
    per_seq = {}
    for r in out:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["frag_len"]
    assert per_seq == {0: 64, 1: 64}
    # fragments tile each document: offsets contiguous, lengths sum to T
    for d, rows in by_doc.items():
        rows = sorted(rows, key=lambda r: r["doc_offset"])
        assert rows[0]["doc_offset"] == 0
        assert sum(r["frag_len"] for r in rows) == rows[0]["n_tok"]
        for a, z in zip(rows, rows[1:]):
            assert z["doc_offset"] == a["doc_offset"] + a["frag_len"]


def test_pack_sequences_layout_independent(spark):
    from cdc_data_pipeline_spark.operators import packing as pk

    docs = spark.createDataFrame(
        [(i, (i * 37) % 90 + 1) for i in range(60)], "doc_id long, n_tok long")
    a = pk.pack_sequences(docs, 128, "n_tok", "doc_id", chunk=7).collect()
    b = pk.pack_sequences(docs.repartition(13), 128, "n_tok", "doc_id",
                          chunk=1000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mine_contrastive_pairs_semantics(spark):
    from cdc_data_pipeline_spark.operators.contrastive import (
        mine_contrastive_pairs)

    # docs 0/1 and 2/3 are near-identical (positives); the rest unique
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),
         (1, "alpha beta gamma delta zeta"),
         (2, "one two three four five six"),
         (3, "one two three four five seven"),
         (4, "totally different text here now"),
         (5, "unrelated words in this document"),
         (6, "yet another distinct entry body"),
         (7, "final standalone document text piece")],
        "doc_id long, text string")
    out = mine_contrastive_pairs(docs, k_neg=2, pos_threshold=0.3,
                                 n_shards=2)
    rows = out.collect()
    pos = {(r.id_a, r.id_b) for r in rows if r.label == 1}
    neg = {(r.id_a, r.id_b) for r in rows if r.label == 0}
    assert (0, 1) in pos and (2, 3) in pos
    # canonical orientation, no self pairs, disjoint label sets
    for a, b in pos | neg:
        assert a < b
    assert not (pos & neg)
    # positives carry a score, negatives don't
    assert all(r.score is not None for r in rows if r.label == 1)
    assert all(r.score is None for r in rows if r.label == 0)
    assert len(neg) >= len(docs.collect()) // 2   # real negative volume
    # deterministic under layout changes
    again = mine_contrastive_pairs(docs.repartition(5), k_neg=2,
                                   pos_threshold=0.3, n_shards=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hard_negatives_exclude_near_dups_and_backfill(spark):
    from cdc_data_pipeline_spark.operators.contrastive import (
        mine_hard_negatives)

    # doc 1 is a near-duplicate of query 10 (shares 4 of 5 shingle
    # words) -> excluded; docs 2/3 share terms without being dups ->
    # they are the hard negatives, backfilling doc 1's slot.
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta unrelated words here"),
         (3, "gamma delta other content body"),
         (4, "completely different text entirely"),
         (10, "alpha beta gamma delta zeta")],
        "doc_id long, text string")
    queries = corpus.filter(F.col("doc_id") == 10)
    out = mine_hard_negatives(corpus, queries, k_neg=2, pos_threshold=0.3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    ids = [r["neighbor_id"] for r in rows]
    assert 1 not in ids and 10 not in ids   # near-dup + self excluded
    assert len(ids) == 2 and set(ids) <= {2, 3, 4}
    assert rows[0]["bm25"] >= rows[1]["bm25"]
