"""Compaction + Z-order layout maintenance: correctness (data
preserved) and the layout property each exists for (fewer files /
tighter per-file spans)."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import maintenance as mt
from cdc_data_pipeline_spark.sources.readers import read_table


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    orders = read_table(spark, sf_dir, "orders")
    # simulate a micro-batch-fragmented table: 64 tiny files
    orders.repartition(64).write.mode("overwrite").parquet(path)
    assert mt.table_stats(spark, path)["n_files"] == 64
    n = orders.count()

    res = mt.compact_parquet(spark, path, target_bytes=8 * 1024 * 1024)
    assert res["after"]["n_files"] < res["before"]["n_files"]
    after = spark.read.parquet(path)
    assert after.count() == n
    assert after.exceptAll(orders.select(*after.columns)).count() == 0


def test_compact_is_atomic_no_staging_left(spark, sf_dir, tmp_path):
    import os
    path = str(tmp_path / "t")
    read_table(spark, sf_dir, "nation").repartition(8).write.parquet(path)
    mt.compact_parquet(spark, path, target_bytes=64 * 1024 * 1024)
    assert not os.path.exists(path + ".__compact__")


def test_zorder_write_tightens_both_dimension_spans(spark, sf_dir, tmp_path):
    """Against a layout sorted on one column only, z-order must give
    small per-file spans on BOTH clustered columns — that's the whole
    point (a lexicographic sort prunes only its leading column)."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    lex_path = str(tmp_path / "lex")
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(lex_path))
    z_path = str(tmp_path / "z")
    mt.zorder_write(ev, z_path, ["user_id", "value"], n_files=8)

    def mean_span(path, col):
        df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
        return (mt.file_span_stats(df, col)
                .agg(F.avg("span_frac")).first()[0])

    # z-order keeps spans on BOTH columns well below the full range,
    # and beats the one-column layout on the non-leading column
    assert mean_span(z_path, "user_id") < 0.6
    assert mean_span(z_path, "value") < 0.6
    assert mean_span(z_path, "value") < 0.8 * mean_span(lex_path, "value")

    # data preserved
    assert spark.read.parquet(z_path).exceptAll(ev).count() == 0


def test_zorder_point_query_scans_fewer_files(spark, sf_dir, tmp_path):
    """End-to-end skipping: a two-dimensional range predicate over the
    z-ordered layout must touch fewer files than over the single-column
    layout (file-level min/max pruning via input_file_name count)."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    lo_u, hi_u = 10, 20
    lo_v, hi_v = 100.0, 200.0

    lex_path = str(tmp_path / "lex2")
    (ev.repartitionByRange(16, "event_id").sortWithinPartitions("event_id")
       .write.mode("overwrite").parquet(lex_path))  # clustered on neither
    z_path = str(tmp_path / "z2")
    mt.zorder_write(ev, z_path, ["user_id", "value"], n_files=16)

    def files_touched(path):
        df = (spark.read.parquet(path)
              .filter((F.col("user_id").between(lo_u, hi_u))
                      & (F.col("value").between(lo_v, hi_v)))
              .select(F.input_file_name().alias("f")).distinct())
        return df.count()

    # same answer either way
    a = spark.read.parquet(z_path).filter(
        (F.col("user_id").between(lo_u, hi_u))
        & (F.col("value").between(lo_v, hi_v))).count()
    b = spark.read.parquet(lex_path).filter(
        (F.col("user_id").between(lo_u, hi_u))
        & (F.col("value").between(lo_v, hi_v))).count()
    assert a == b
    assert files_touched(z_path) < files_touched(lex_path)


def test_zorder_key_plan_has_no_window_or_single_partition(spark, sf_dir):
    """The rank normalization must be map-only: approxQuantile happens
    eagerly (its own job), and the keyed plan itself must contain no
    WindowExec and no SinglePartition exchange — the round-1 ntile
    design funneled every row through one task."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    keyed = mt.zorder_key(ev, ["user_id", "value"], bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan
