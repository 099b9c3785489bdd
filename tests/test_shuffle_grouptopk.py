"""Contract tests for operators/shuffle.py (deterministic training
shuffle + shard writer) and sampling.group_topk / domain_caps (the
skew-safe per-group top-k family)."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import sampling as sp
from cdc_data_pipeline_spark.operators import shuffle as sh
from cdc_data_pipeline_spark.sources.readers import read_table


# --------------------------------------------------- deterministic shuffle

def test_shuffle_layout_independent_and_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    a = sh.deterministic_shuffle(docs, "doc_id", 8, seed=1).collect()
    b = sh.deterministic_shuffle(docs.repartition(13), "doc_id", 8, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # (shard, pos) is a bijection over the corpus
    keys = {(r.shard_id, r.pos) for r in a}
    assert len(keys) == len(a) == docs.count()
    # positions are dense 0..n_s-1 within each shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_spreads_uniformly(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    counts = (sh.deterministic_shuffle(docs, "doc_id", 8, seed=0)
              .groupBy("shard_id").count().collect())
    assert len(counts) == 8
    for r in counts:
        assert 0.5 * n / 8 < r["count"] < 1.5 * n / 8


def test_write_training_shards_round_trip(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = str(tmp_path / "shards")
    sh.write_training_shards(docs, out, "doc_id", n_shards=4, seed=2)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("shard_id").distinct().count() == 4
    # written assignment == recomputed assignment (pure function of key)
    expect = sh.deterministic_shuffle(docs, "doc_id", 4, seed=2) \
        .select("doc_id", "shard_id", "pos")
    got = back.select("doc_id", F.col("shard_id").cast("int"), "pos")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


# ------------------------------------------------------------- group_topk

def test_group_topk_matches_plain_window(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = sp.group_topk(docs, ["source"], 5,
                        [("n_chars", False), ("doc_id", True)],
                        rank_col="rank")
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    expect = (docs.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= 5))
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_group_topk_hot_group_cut_bounds_shuffle(spark, sf_dir):
    """With one group owning every row, the map-local cut must bound
    what reaches the rank window: the partial output is at most
    k * input_partitions rows, never the full group."""
    docs = read_table(spark, sf_dir, "documents") \
        .withColumn("g", F.lit("hot")).repartition(8)
    k = 3
    survivors = sp.local_topk_cut(docs, ["g"], k, [("doc_id", True)]).count()
    assert survivors <= k * 8 * 2  # k per Arrow batch; far below corpus
    assert survivors < docs.count()
    got = sp.group_topk(docs, ["g"], k, [("doc_id", True)])
    assert [r.doc_id for r in got.orderBy("doc_id").collect()] == \
        [r.doc_id for r in docs.orderBy("doc_id").limit(k).collect()]


def test_group_topk_null_group_and_order_semantics(spark):
    """r3 advice (medium): null group keys must form their own group —
    never be silently dropped — and null order values must land where
    Spark's asc()/desc() defaults put them (first ascending, last
    descending). Pinned against the plain rank window in both
    directions on data with nulls in both positions."""
    from pyspark.sql import Window

    rows = [("a", 1.0, 1), ("a", None, 2), ("a", 3.0, 3), ("a", None, 4),
            (None, 2.0, 5), (None, None, 6), (None, 1.0, 7),
            ("b", 5.0, 8), ("b", None, 9)]
    df = spark.createDataFrame(
        rows, "g string, score double, id int").repartition(4)
    for asc in (True, False):
        got = sp.group_topk(df, ["g"], 2,
                            [("score", asc), ("id", True)], rank_col="rank")
        order = F.col("score").asc() if asc else F.col("score").desc()
        w = Window.partitionBy("g").orderBy(order, F.col("id").asc())
        expect = (df.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 2))
        assert got.exceptAll(expect).count() == 0, f"asc={asc}"
        assert expect.exceptAll(got).count() == 0, f"asc={asc}"
    # the null group is present in the output (3 rows -> top 2 kept)
    got = sp.group_topk(df, ["g"], 2, [("id", True)])
    assert got.filter(F.col("g").isNull()).count() == 2


def test_domain_caps_enforces_cap_and_determinism(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    capped = sp.domain_caps(docs, "source", 7, "doc_id", seed=5)
    sizes = capped.groupBy("source").count().collect()
    orig = {r["source"]: r["count"] for r in
            docs.groupBy("source").count().collect()}
    for r in sizes:
        assert r["count"] == min(7, orig[r["source"]])
    again = sp.domain_caps(docs.repartition(11), "source", 7, "doc_id", seed=5)
    assert {r.doc_id for r in capped.select("doc_id").collect()} == \
        {r.doc_id for r in again.select("doc_id").collect()}


def test_shuffle_plan_has_no_global_range_sort(spark, sf_dir):
    """The whole point of deterministic_shuffle: shuffled order without
    an all-to-all range exchange. The plan must contain no
    rangepartitioning (global sort) — only the per-shard rank window's
    hash exchange."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out = sh.deterministic_shuffle(docs, "doc_id", 8)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" not in plan
    assert "hashpartitioning" in plan


def test_domain_caps_plan_contains_partial_cut(spark, sf_dir):
    """group_topk must place the Arrow map-local cut BEFORE the rank
    window's exchange, so a hot domain never ships its full row set."""
    docs = read_table(spark, sf_dir, "documents")
    out = sp.domain_caps(docs, "source", 5, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    i_map = plan.find("MapInPandas")
    i_win = plan.find("Window")
    assert i_map != -1 and i_win != -1
    # executedPlan prints top-down: the window consumes the map output,
    # so Window appears above (before) MapInPandas in the string
    assert i_win < i_map
