"""Merge strategies M1-M5 as multi-batch scenarios + the write path."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import (
    duplicate_keys,
    get_watermark,
    latest_per_key,
    snapshot_load,
    upsert,
    upsert_dedup,
    write_merged,
)
from cdc_data_pipeline_spark.sources.readers import incremental_scan


def mk(spark, rows):
    return spark.createDataFrame(rows, "k long, updated_at string, v string")


def test_watermark_none_for_missing_target(spark):
    assert get_watermark(None, "updated_at") is None


def test_watermark_and_scan_modes(spark):
    df = mk(spark, [(1, "2024-01-01", "a"), (2, "2024-01-02", "b")])
    wm = get_watermark(df, "updated_at")
    assert wm == "2024-01-02"
    assert incremental_scan(df, "updated_at", wm, inclusive=False).count() == 0
    # Mongo-style $gte re-reads the boundary row (at-least-once)
    assert incremental_scan(df, "updated_at", wm, inclusive=True).count() == 1
    assert incremental_scan(df, "updated_at", None).count() == 2


def test_upsert_replaces_and_appends(spark):
    target = mk(spark, [(1, "2024-01-01", "a"), (2, "2024-01-01", "b")])
    batch = mk(spark, [(2, "2024-01-02", "b2"), (3, "2024-01-02", "c")])
    out = {r.k: r.v for r in upsert(target, batch, ["k"]).collect()}
    assert out == {1: "a", 2: "b2", 3: "c"}


def test_upsert_dedup_multi_version_batch(spark):
    target = mk(spark, [(1, "2024-01-01", "a")])
    batch = mk(spark, [(1, "2024-01-02", "v2"), (1, "2024-01-03", "v3"), (2, "2024-01-01", "b")])
    out = {r.k: (r.v, r.updated_at) for r in upsert_dedup(target, batch, ["k"], "updated_at").collect()}
    assert out == {1: ("v3", "2024-01-03"), 2: ("b", "2024-01-01")}


def test_latest_per_key_tiebreaker(spark):
    df = mk(spark, [(1, "2024-01-01", "x"), (1, "2024-01-01", "y")])
    out = latest_per_key(df, ["k"], "updated_at", tiebreakers=["v"]).collect()
    assert len(out) == 1 and out[0].v == "y"


def test_duplicate_keys(spark):
    df = mk(spark, [(1, "a", "x"), (1, "b", "y"), (2, "c", "z")])
    dups = duplicate_keys(df, ["k"]).collect()
    assert len(dups) == 1 and dups[0].k == 1 and dups[0].cnt == 2


def test_snapshot_load_overwrites_same_date(spark):
    t = spark.createDataFrame([(1, "a")], "k long, v string") \
        .withColumn("snap_date", F.lit("2024-01-01").cast("date"))
    b = spark.createDataFrame([(2, "b")], "k long, v string")
    # different date: both partitions survive
    s1 = snapshot_load(t, b, "snap_date", F.lit("2024-01-02").cast("date"))
    assert s1.count() == 2
    # same date: old partition replaced
    s2 = snapshot_load(t, b, "snap_date", F.lit("2024-01-01").cast("date"))
    rows = s2.collect()
    assert len(rows) == 1 and rows[0].k == 2


def test_write_merged_self_dependency(spark, tmp_path):
    """M2 reads the target and overwrites the same path — the localize-
    then-write protocol must not corrupt the data (SURVEY §7.2 trap)."""
    path = str(tmp_path / "tgt")
    t0 = mk(spark, [(1, "2024-01-01", "a"), (2, "2024-01-01", "b")])
    t0.write.parquet(path)
    target = spark.read.parquet(path)
    batch = mk(spark, [(2, "2024-01-02", "b2")])
    write_merged(upsert(target, batch, ["k"]), path)
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "b2"}


def test_merge_plan_has_single_join(spark):
    """The generalized MERGE must decide every row's fate from ONE
    full-outer join — the target is scanned once, not four times
    (anti + semi + semi/anti + anti)."""
    from cdc_data_pipeline_spark.operators.merge import merge

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    source = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    out = merge(target, source, ["k"], delete_when=F.col("v") == "zzz")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join ") == 1, plan


def test_merge_cdf_replays_to_new_state(spark):
    """Applying the change feed to the old state must reproduce the
    merge result exactly: state' = state - preimages - deletes
    + postimages + inserts."""
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators.merge import CDF_COL, merge_with_cdf

    target = spark.createDataFrame(
        [(1, 10.0, "U"), (2, 20.0, "U"), (3, 30.0, "U")], "k long, v double, op string")
    source = spark.createDataFrame(
        [(2, 99.0, "U"),    # update
         (3, 0.0, "D"),     # delete
         (4, 40.0, "U"),    # insert
         (5, 0.0, "D")],    # delete of an absent key: no-op
        "k long, v double, op string")
    state, changes = merge_with_cdf(target, source, ["k"], delete_when=F.col("op") == "D")

    got_changes = {(r.k, r[CDF_COL]) for r in changes.collect()}
    assert got_changes == {(2, "update_preimage"), (2, "update_postimage"),
                           (3, "delete"), (4, "insert")}

    removed = changes.filter(F.col(CDF_COL).isin("update_preimage", "delete")).drop(CDF_COL)
    added = changes.filter(F.col(CDF_COL).isin("update_postimage", "insert")).drop(CDF_COL)
    replayed = target.exceptAll(removed).unionByName(added)
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, state.collect()))


def test_salted_collect_equals_direct(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators.skew import salted_collect_set
    from cdc_data_pipeline_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    salted = salted_collect_set(orders, ["o_custkey"], "o_orderstatus", salt=8)
    direct = orders.groupBy("o_custkey") \
        .agg(F.array_sort(F.collect_set("o_orderstatus")).alias("values"))
    assert sorted((r.o_custkey, tuple(r["values"])) for r in salted.collect()) == \
           sorted((r.o_custkey, tuple(r["values"])) for r in direct.collect())


def test_backfill_snapshot_idempotent_per_partition(spark, tmp_path):
    """Backfill writes one partition per date; re-running one date
    rewrites only that partition (others keep their files/mtimes)."""
    import os

    from cdc_data_pipeline_spark.operators.incremental import backfill_snapshot

    tgt = str(tmp_path / "snap")

    def build(spark_, d):
        n = int(d[-2:])  # day number -> row count, distinguishable
        return spark_.range(n).select(
            F.col("id").alias("k"), F.lit(d).alias("built_for"))

    backfill_snapshot(spark, build, tgt, ["2024-01-01", "2024-01-02", "2024-01-03"])
    out = spark.read.parquet(tgt)
    assert out.count() == 1 + 2 + 3
    assert out.select("snapshot_date").distinct().count() == 3

    def mtimes(day):
        p = f"{tgt}/snapshot_date={day}"
        return {f: os.path.getmtime(os.path.join(p, f))
                for f in os.listdir(p) if f.endswith(".parquet")}

    before_d1, before_d2 = mtimes("2024-01-01"), mtimes("2024-01-02")
    import time
    time.sleep(1.1)
    # re-run only day 2 with different content: idempotent overwrite
    backfill_snapshot(
        spark, lambda s, d: s.range(20).select(
            F.col("id").alias("k"), F.lit(d).alias("built_for")),
        tgt, ["2024-01-02"])
    out2 = spark.read.parquet(tgt)
    assert out2.filter(F.col("snapshot_date") == "2024-01-02").count() == 20
    assert out2.filter(F.col("snapshot_date") == "2024-01-01").count() == 1
    assert mtimes("2024-01-01") == before_d1      # untouched partition
    assert mtimes("2024-01-02") != before_d2      # rewritten partition


def test_upsert_bucketed_schema_evolution(spark, tmp_path):
    """CDC feeds evolve (the Debezium schema-change shape the
    reference meets with live DDL): with ``evolve_schema=True`` a
    batch carrying a NEW column upserts cleanly — historical rows
    surface NULL for it — and a later batch that DROPPED a column
    leaves NULL on its replaced rows (latest-wins: the new version
    simply doesn't carry the field). The default stays strict and
    fails fast on drift."""
    import pytest

    from cdc_data_pipeline_spark.operators.incremental import (
        upsert_bucketed)

    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)],
        "k long, v string, ts long")
    upsert_bucketed(spark, tgt, base, ["k"], "ts", n_buckets=4)

    widened = spark.createDataFrame(
        [(2, "b2", 20, "extra2"), (4, "d", 20, "extra4")],
        "k long, v string, ts long, note string")
    # strict default: silent drift is a bug worth failing on
    with pytest.raises(Exception):
        upsert_bucketed(spark, tgt, widened, ["k"], "ts", n_buckets=4)
    upsert_bucketed(spark, tgt, widened, ["k"], "ts", n_buckets=4,
                    evolve_schema=True)

    out = {r["k"]: (r["v"], r["ts"], r["note"])
           for r in spark.read.option("mergeSchema", "true")
           .parquet(tgt).collect()}
    assert out[2] == ("b2", 20, "extra2")
    assert out[4] == ("d", 20, "extra4")
    assert out[1] == ("a", 10, None)      # historical rows: NULL note
    assert out[3] == ("c", 10, None)

    narrowed = spark.createDataFrame([(2, 30)], "k long, ts long")
    upsert_bucketed(spark, tgt, narrowed, ["k"], "ts", n_buckets=4,
                    evolve_schema=True)
    out = {r["k"]: (r["v"], r["ts"], r["note"])
           for r in spark.read.option("mergeSchema", "true")
           .parquet(tgt).collect()}
    assert out[2] == (None, 30, None)     # replaced row dropped fields
    assert out[4] == ("d", 20, "extra4")  # other keys untouched
    assert len(out) == 4
