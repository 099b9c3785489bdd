"""Empty-batch / empty-side edge cases: a CDC tick with no changes must
be a clean no-op everywhere (the reference short-circuits on 0-row
batches, base_loader.py:308-310 — here the algebra itself must do it).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import incremental as inc
from cdc_data_pipeline_spark.operators import scd2
from cdc_data_pipeline_spark.operators.asof import asof_join
from cdc_data_pipeline_spark.operators.dedup import dedup_exact, lsh_candidate_pairs


def _t3(spark, rows):
    return spark.createDataFrame(rows, "k long, t long, v string")


def test_upsert_empty_batch_is_noop(spark):
    target = _t3(spark, [(1, 1, "a"), (2, 1, "b")])
    out = inc.upsert(target, target.limit(0), ["k"])
    assert sorted(map(tuple, out.collect())) == [(1, 1, "a"), (2, 1, "b")]


def test_upsert_dedup_empty_batch_is_noop(spark):
    target = _t3(spark, [(1, 1, "a")])
    out = inc.upsert_dedup(target, target.limit(0), ["k"], "t")
    assert [tuple(r) for r in out.collect()] == [(1, 1, "a")]


def test_latest_per_key_empty(spark):
    assert inc.latest_per_key(_t3(spark, [(1, 1, "a")]).limit(0), ["k"], "t").count() == 0


def test_snapshot_load_empty_batch_keeps_target(spark):
    target = _t3(spark, [(1, 1, "a")]).withColumn("d", F.lit("2024-01-01").cast("date"))
    batch = _t3(spark, [(1, 1, "a")]).limit(0)
    out = inc.snapshot_load(target, batch, "d", F.lit("2024-01-02").cast("date"))
    assert out.count() == 1


def test_scd2_empty_batch_keeps_snapshot(spark):
    b1 = spark.createDataFrame([(1, "x"), (2, "y")], "user_id long, occ string")
    s1 = scd2.scd2_merge(None, b1, ["user_id"], ["occ"], "2024-01-01 00:00:00")
    s2 = scd2.scd2_merge(s1, b1.limit(0), ["user_id"], ["occ"], "2024-02-01 00:00:00")
    assert sorted((r.user_id, r.occ, r.dbt_valid_to) for r in s2.collect()) == \
           sorted((r.user_id, r.occ, r.dbt_valid_to) for r in s1.collect())


def test_asof_join_empty_right_yields_null_payload(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([], "k long, rts long, payload string")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").collect()
    assert len(out) == 1 and out[0].rts is None and out[0].payload is None


def test_dedup_ops_on_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_exact(empty).count() == 0
    assert lsh_candidate_pairs(empty).count() == 0


def test_merge_empty_source_is_noop(spark):
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators.merge import merge, merge_with_cdf

    target = _t3(spark, [(1, 1, "a"), (2, 1, "b")])
    empty = target.limit(0)
    out = merge(target, empty, ["k"], delete_when=F.col("v") == "zzz")
    assert sorted(map(tuple, out.collect())) == [(1, 1, "a"), (2, 1, "b")]
    state, changes = merge_with_cdf(target, empty, ["k"])
    assert changes.count() == 0
    assert state.count() == 2


def test_round2_operators_on_empty_inputs(spark):
    """dup_spans / funnel / range join / stats on 0-row frames: empty
    results, no crashes (ANSI division, HOF aggregates, windows)."""
    from cdc_data_pipeline_spark.operators.funnel import (
        cohort_retention, funnel_counts)
    from cdc_data_pipeline_spark.operators.rangejoin import (
        point_gap_join, point_interval_join)
    from cdc_data_pipeline_spark.operators.segments import (
        duplicated_spans, mask_duplicated_spans)
    from cdc_data_pipeline_spark.operators.stats import (
        correlation_matrix, normalize_features)

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert duplicated_spans(docs, n=3).count() == 0
    assert mask_duplicated_spans(docs, n=3).count() == 0

    ev = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    assert funnel_counts(ev, ["view", "click"]).count() == 0
    assert cohort_retention(ev).count() == 0

    pts = spark.createDataFrame([], "pid long, ts timestamp")
    ivs = spark.createDataFrame([], "iid long, start_ts timestamp, end_ts timestamp")
    assert point_interval_join(pts, ivs, "ts", "start_ts", "end_ts").count() == 0
    r = spark.createDataFrame([], "rid long, rts timestamp")
    assert point_gap_join(pts, r, "ts", "rts").count() == 0

    vals = spark.createDataFrame([], "g string, v double")
    assert normalize_features(vals, ["v"], by=["g"]).count() == 0
    # correlation over an empty frame: NULL corr rows, not a crash
    rows = correlation_matrix(vals.select(F.col("v").alias("x"),
                                          F.col("v").alias("y")),
                              ["x", "y"]).collect()
    assert len(rows) == 1 and rows[0]["corr"] is None


def test_skew_report_flags_hot_key(spark):
    from cdc_data_pipeline_spark.operators.skew import skew_report

    rows = [(1, i) for i in range(90)] + [(k, 0) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long, v long")
    rep = skew_report(df, ["k"], top=3).collect()
    assert rep[0]["k"] == 1 and rep[0]["n_rows"] == 90
    assert rep[0]["share"] == 0.9
    # 11 keys, 100 rows -> uniform ~9.09; hot key ~9.9x uniform
    assert rep[0]["x_uniform"] > 9
    assert skew_report(df.limit(0), ["k"]).count() == 0


def test_round3_operators_on_empty_inputs(spark):
    """Round-3 operators on 0-row inputs: empty shuffles, caps, top-k
    and sentiment all yield empty/clean results without erroring."""
    from cdc_data_pipeline_spark.functions.text import sentiment_score
    from cdc_data_pipeline_spark.operators import sampling as sp
    from cdc_data_pipeline_spark.operators.shuffle import deterministic_shuffle

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    assert deterministic_shuffle(docs.select("doc_id"), "doc_id", 4).count() == 0
    assert sp.domain_caps(docs, "source", 3, "doc_id").count() == 0
    assert sp.group_topk(docs, ["source"], 2, [("doc_id", True)]).count() == 0
    assert docs.select(sentiment_score("text")).count() == 0


def test_ivfpq_empty_queries_yield_empty(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators import pq
    from cdc_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.lit(False))
    centroids = emb.filter(F.col("vec_id") % 50 == 25) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    out = pq.ivfpq_topk(emb, queries, centroids, dim=64, m=4, ksub=8, k=3)
    assert out.count() == 0


def test_ivf_ops_with_empty_centroids(spark, sf_dir):
    """Empty centroid sets: assignment and probing yield zero rows
    (never an analysis error from an empty literal array), and the
    composed searches return empty results with their full schema."""
    from cdc_data_pipeline_spark.operators import pq
    from cdc_data_pipeline_spark.operators.similarity import (
        ivf_assign, ivf_probe_cells, ivf_topk)
    from cdc_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    none = emb.filter(F.lit(False)) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    assert ivf_assign(emb, none).count() == 0
    assert ivf_probe_cells(queries, none, nprobe=2).count() == 0
    out = ivf_topk(emb, queries, none, k=3)
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]
    assert out.count() == 0
    books = pq.train_pq_codebooks(emb, 64, m=4, ksub=8)
    out2 = pq.ivfpq_topk(emb, queries, none, dim=64, m=4, ksub=8, k=3,
                         codebooks=books)
    assert out2.count() == 0
    # the residual path must short-circuit too (an empty centroid map
    # would otherwise fail analysis)
    out3 = pq.ivfpq_topk(emb, queries, none, dim=64, m=4, ksub=8, k=3,
                         codebooks=books, residual=True)
    assert out3.count() == 0
    assert out3.columns == ["query_id", "neighbor_id", "dist_sq", "rank"]


def test_mixture_repeat_empty_and_unknown_domains(spark, sf_dir):
    """No positive weights, or weights naming absent domains, yield an
    empty result (with the epoch column) rather than an error."""
    from cdc_data_pipeline_spark.operators import sampling as sp
    from cdc_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = sp.mixture_repeat(docs, "source", {}, "doc_id")
    assert "epoch" in out.columns and out.count() == 0
    out2 = sp.mixture_repeat(docs, "source", {"no_such_src": 1.0}, "doc_id")
    assert out2.count() == 0


def test_local_topk_cut_empty_input(spark):
    from cdc_data_pipeline_spark.operators import sampling as sp

    df = spark.createDataFrame([], "g string, v long")
    assert sp.local_topk_cut(df, ["g"], 3, [("v", True)]).count() == 0
