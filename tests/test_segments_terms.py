"""Unit semantics for segment dedup, term analytics, and embedding
projection/quantization (the oracle-parity suite covers the catalog
entries end-to-end; these pin the operator contracts directly)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.projection import project_vectors
from cdc_data_pipeline_spark.operators.segments import segment_dedup
from cdc_data_pipeline_spark.operators.terms import tfidf_top_terms, top_tokens


def test_segment_dedup_keeps_first_occurrence_only(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha\nboiler\nbeta"),
            (2, "boiler\ngamma"),       # 'boiler' first seen in doc 1
            (3, "boiler\nalpha\ndelta"),  # both dups
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    assert out[1]["n_segments"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "gamma"
    assert out[3]["n_segments"] == 3 and out[3]["n_kept"] == 1
    assert out[3]["kept_text"] == "delta"


def test_segment_dedup_within_doc_repeat_kept_once(spark):
    df = spark.createDataFrame(
        [(7, "x\ny\nx")], "doc_id long, text string")
    row = segment_dedup(df).collect()[0]
    # second 'x' inside the SAME doc is also a later occurrence
    assert row["n_kept"] == 2
    assert row["kept_text"] == "x\ny"


def test_top_tokens_counts_and_df(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b")], "doc_id long, text string")
    rows = top_tokens(df, k=2).collect()
    assert [(r["token"], r["n"], r["df"]) for r in rows] == [
        ("a", 3, 2), ("b", 2, 2)]


def test_tfidf_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [(1, "common rare common"), (2, "common other")],
        "doc_id long, text string")
    rows = tfidf_top_terms(df, top=1).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # 'common' appears in every doc -> idf 0; the doc-unique term wins
    assert by_doc[1]["token"] == "rare"
    assert by_doc[2]["token"] == "other"
    assert all(r["rank"] == 1 for r in rows)


def test_projection_dequantization_error_bound(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(64)
    rows = project_vectors(e, dim=64, out_dim=8, seed=11).collect()
    assert rows and all(len(r["proj"]) == 8 and len(r["q"]) == 8 for r in rows)
    for r in rows:
        for p, q in zip(r["proj"], r["q"]):
            assert abs(q) <= 127
            assert abs(q * r["scale"] - p) <= r["scale"] / 2 + 1e-9


def test_projection_matches_plain_dot(spark):
    from cdc_data_pipeline_spark.operators.similarity import _gaussian_planes

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(4)
    local = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
    planes = _gaussian_planes(8, 64, 11)
    for r in project_vectors(e, dim=64, out_dim=8, seed=11).collect():
        v = local[r["vec_id"]]
        for j, p in enumerate(planes):
            want = round(sum(a * b for a, b in zip(v, p)), 6)
            assert math.isclose(r["proj"][j], want, abs_tol=1e-6)

def test_duplicated_spans_finds_planted_repeat(spark):
    from cdc_data_pipeline_spark.operators.segments import duplicated_spans

    # the 4-token phrase "p q r s" appears in docs 1 and 2; with n=3
    # its two 3-gram windows are adjacent -> one maximal span each
    df = spark.createDataFrame(
        [
            (1, "a b p q r s c d"),
            (2, "e p q r s f g h"),
            (3, "u v w x y z k m"),
        ],
        "doc_id long, text string",
    )
    out = sorted((r["doc_id"], r["span_start"], r["span_end"])
                 for r in duplicated_spans(df, n=3).collect())
    assert out == [(1, 2, 5), (2, 1, 4)]


def test_duplicated_spans_counts_within_doc_repeats(spark):
    from cdc_data_pipeline_spark.operators.segments import duplicated_spans

    # "x y z" repeats inside ONE doc -> both occurrences are spans
    df = spark.createDataFrame(
        [(9, "x y z a b c x y z")], "doc_id long, text string")
    out = sorted((r["span_start"], r["span_end"])
                 for r in duplicated_spans(df, n=3).collect())
    assert out == [(0, 2), (6, 8)]


def test_mask_duplicated_spans_drops_all_copies(spark):
    from cdc_data_pipeline_spark.operators.segments import mask_duplicated_spans

    df = spark.createDataFrame(
        [
            (1, "a b p q r s c d"),
            (2, "e p q r s f g h"),
            (3, "u v w x y z k m"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in mask_duplicated_spans(df, n=3).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "e f g h"
    assert out[3]["clean_text"] == "u v w x y z k m"
    assert out[1]["n_tokens"] == 8 and out[1]["n_kept"] == 4
    assert out[3]["n_kept"] == 8


def test_sentiment_score_known_values(spark):
    from cdc_data_pipeline_spark.functions.text import sentiment_score

    df = spark.createDataFrame(
        [(1, "this is a GOOD great day"),      # 2 pos, 0 neg -> 1.0
         (2, "bad terrible awful stuff"),       # 3 neg -> -1.0
         (3, "good but bad"),                   # 1 pos 1 neg -> 0.0
         (4, "nothing relevant here")],         # no hits -> NULL
        "id long, text string")
    got = {r.id: r.s for r in
           df.select("id", sentiment_score("text").alias("s")).collect()}
    assert got[1] == 1.0
    assert got[2] == -1.0
    assert got[3] == 0.0
    assert got[4] is None


def test_bm25_ranks_rare_term_match_first(spark):
    from cdc_data_pipeline_spark.operators.terms import bm25_topk

    # query 10 shares the RARE term "zebra" with doc 1 and the common
    # term "the" (in every doc) with docs 2 and 3 -> doc 1 must rank
    # first; self-match (doc 10 itself) is excluded.
    corpus = spark.createDataFrame(
        [(1, "the zebra grazes"),
         (2, "the cat sits on the mat"),
         (3, "the dog barks at the cat"),
         (10, "the zebra runs")],
        "doc_id long, text string")
    queries = corpus.filter(F.col("doc_id") == 10)
    out = bm25_topk(corpus, queries, k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["query_id"] for r in rows] == [10, 10, 10]
    assert rows[0]["neighbor_id"] == 1          # rare-term match wins
    assert all(r["neighbor_id"] != 10 for r in rows)   # no self-match
    assert rows[0]["bm25"] > rows[1]["bm25"] >= rows[2]["bm25"]


def test_bm25_k_cap_and_determinism(spark):
    from cdc_data_pipeline_spark.operators.terms import bm25_topk

    corpus = spark.createDataFrame(
        [(i, f"common shared w{i % 3}") for i in range(1, 9)] + [(99, "common shared w0")],
        "doc_id long, text string")
    queries = corpus.filter(F.col("doc_id") == 99)
    out1 = bm25_topk(corpus, queries, k=4).collect()
    out2 = bm25_topk(corpus.repartition(7), queries, k=4).collect()
    assert len(out1) == 4
    # layout-independent: identical rows and ranks after repartition
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_rrf_fuse_prefers_candidates_in_both_lists(spark):
    from cdc_data_pipeline_spark.operators.similarity import rrf_fuse

    # candidate 7 is rank 2 in BOTH lists (rrf = 2/62); candidate 1 is
    # rank 1 in only one list (rrf = 1/61) -> 7 must fuse above 1.
    lex = spark.createDataFrame(
        [(0, 1, 1), (0, 7, 2)], "query_id long, neighbor_id long, rank int")
    den = spark.createDataFrame(
        [(0, 3, 1), (0, 7, 2)], "query_id long, neighbor_id long, rank int")
    out = sorted(rrf_fuse([lex, den], k=3).collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [7, 1, 3]
    assert abs(out[0]["rrf"] - 2 / 62) < 1e-12
    assert abs(out[1]["rrf"] - 1 / 61) < 1e-12
    # 1 and 3 tie on score (rank 1 in one list each) -> id tiebreak
    assert out[1]["rrf"] == out[2]["rrf"]


def test_rrf_fuse_weights_bias_a_source(spark):
    from cdc_data_pipeline_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 1, 1)], "query_id long, neighbor_id long, rank int")
    den = spark.createDataFrame(
        [(0, 3, 1)], "query_id long, neighbor_id long, rank int")
    # unweighted: tie broken by id -> 1 first; weighting the dense
    # source 3x flips the order
    plain = sorted(rrf_fuse([lex, den], k=2).collect(),
                   key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in plain] == [1, 3]
    biased = sorted(rrf_fuse([lex, den], k=2, weights=[1.0, 3.0]).collect(),
                    key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in biased] == [3, 1]
    assert abs(biased[0]["rrf"] - 3 / 61) < 1e-12


class TestKeepFirstExemption:
    """r10: the keep-one-copy ExactSubstr variant — previously the
    package's last NotImplementedError carve-out."""

    def test_first_copy_survives_mask(self, spark):
        from cdc_data_pipeline_spark.operators import segments as sg

        phrase = "alpha beta gamma delta epsilon"
        docs = spark.createDataFrame(
            [(1, f"{phrase} unique one"),
             (2, f"other words here {phrase}"),
             (3, f"{phrase} tail three")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               sg.mask_duplicated_spans(docs, n=5, keep_first=True)
               .collect()}
        # doc 1 holds the corpus-wide first occurrence: untouched
        assert out[1]["clean_text"] == f"{phrase} unique one"
        assert out[1]["n_kept"] == out[1]["n_tokens"]
        # the clones lose the phrase but keep their own words
        assert out[2]["clean_text"] == "other words here"
        assert out[3]["clean_text"] == "tail three"
        # default (drop-all) still masks every copy including the first
        all_dropped = {r["doc_id"]: r for r in
                       sg.mask_duplicated_spans(docs, n=5).collect()}
        assert all_dropped[1]["clean_text"] == "unique one"

    def test_intra_document_repeat_keeps_first(self, spark):
        from cdc_data_pipeline_spark.operators import segments as sg

        phrase = "a b c d e"
        docs = spark.createDataFrame(
            [(7, f"{phrase} mid words {phrase}")],
            "doc_id long, text string")
        row = sg.mask_duplicated_spans(docs, n=5, keep_first=True) \
            .first()
        assert row["clean_text"] == f"{phrase} mid words"

    def test_keep_first_spans_cover_only_repeats(self, spark):
        from cdc_data_pipeline_spark.operators import segments as sg

        phrase = "p q r s t"
        docs = spark.createDataFrame(
            [(1, f"{phrase} x"), (2, f"y {phrase}")],
            "doc_id long, text string")
        spans = sg.duplicated_spans(docs, n=5, keep_first=True).collect()
        assert len(spans) == 1 and spans[0]["doc_id"] == 2
