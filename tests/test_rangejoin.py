"""Keyless bucketized range joins: semantics + the no-nested-loop plan
guarantee (the whole point of the operator)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.rangejoin import (
    point_gap_join,
    point_interval_join,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_point_interval_inclusive_and_multibucket(spark):
    pts = spark.createDataFrame(
        [(1, _ts(1, 0)), (2, _ts(2, 30)), (3, _ts(5, 0)), (4, _ts(3, 0))],
        "pid long, ts timestamp")
    # interval spans 3 one-hour buckets; bounds are inclusive
    ivs = spark.createDataFrame(
        [(10, _ts(1, 0), _ts(3, 0)), (11, _ts(4, 59), _ts(4, 59, 59))],
        "iid long, start_ts timestamp, end_ts timestamp")
    got = sorted((r["pid"], r["iid"]) for r in
                 point_interval_join(pts, ivs, "ts", "start_ts", "end_ts",
                                     bucket="1 hour").collect())
    # pid 1 at start bound, pid 4 at end bound, pid 2 inside; pid 3 outside
    assert got == [(1, 10), (2, 10), (4, 10)]


def test_point_interval_no_duplicate_matches(spark):
    pts = spark.createDataFrame([(1, _ts(2, 0))], "pid long, ts timestamp")
    ivs = spark.createDataFrame([(9, _ts(0, 30), _ts(6, 30))],
                                "iid long, start_ts timestamp, end_ts timestamp")
    rows = point_interval_join(pts, ivs, "ts", "start_ts", "end_ts",
                               bucket="1 hour").collect()
    # the interval is replicated into 7 buckets but the pair matches once
    assert len(rows) == 1


def test_point_gap_join_symmetric_window(spark):
    l = spark.createDataFrame([(1, _ts(1, 0))], "lid long, lts timestamp")
    r = spark.createDataFrame(
        [(20, _ts(0, 31)), (21, _ts(1, 29)), (22, _ts(1, 31)), (23, _ts(0, 29))],
        "rid long, rts timestamp")
    got = sorted(r["rid"] for r in
                 point_gap_join(l, r, "lts", "rts", gap="30 minutes").collect())
    # +-30 min inclusive window: 0:31 and 1:29 in, 0:29 and 1:31 out
    assert got == [20, 21]


def test_rangejoin_plan_is_equi_join_not_nested_loop(spark):
    pts = spark.range(1000).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60).alias("ts"))
    ivs = spark.range(100).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 600).alias("start_ts"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 600 + 300).alias("end_ts"))
    out = point_interval_join(pts, ivs, "ts", "start_ts", "end_ts", bucket="1 hour")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # bucket key makes it a hash-joinable equi join
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_quarantine_plan_is_map_only(spark):
    """quarantine_split adds NO shuffle: both sides are filters over
    one projection (the property that makes it free at 100 TB)."""
    from cdc_data_pipeline_spark.operators.quality import quarantine_split

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    good, bad = quarantine_split(df, {"v_small": F.col("v") < 5})
    for side in (good, bad):
        side.count()
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
