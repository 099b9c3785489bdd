"""End-to-end multi-tick CDC pipeline: the reference's cron loop
(extract -> watermark filter -> upsert into raw -> SCD2 snapshot ->
marts, reference: dagster_code/assets/extract_assets.py +
dbt_project/dbt/models/**) replayed as three deterministic ticks with
parquet targets, then checked against a single full rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import incremental as inc
from cdc_data_pipeline_spark.operators import scd2
from cdc_data_pipeline_spark.operators.quality import expect_not_null, expect_unique
from cdc_data_pipeline_spark.sources.readers import incremental_scan, read_table


def test_multi_tick_cdc_equals_full_rebuild(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    raw_path = str(tmp_path / "raw_orders")
    cuts = ["1997-01-01", "1999-01-01", "2002-01-01"]  # covers 1995..2001

    snap = None
    for i, cut in enumerate(cuts):
        # ---- incremental extract with watermark from the target itself
        target = spark.read.parquet(raw_path) if os.path.exists(raw_path) else None
        wm = inc.get_watermark(target, "o_orderdate")
        visible = orders.filter(F.col("o_orderdate") < F.lit(cut).cast("timestamp"))
        batch = incremental_scan(visible, "o_orderdate", wm, inclusive=False)
        merged = batch if target is None else inc.upsert(target, batch, ["o_orderkey"])
        inc.write_merged(merged, raw_path)

        # ---- SCD2 tick: every third customer flips segment this tick
        cust_tick = customer.select(
            F.col("c_custkey").alias("user_id"),
            F.when(F.col("c_custkey") % 3 == i, F.lit(f"SEG_{i}"))
            .otherwise(F.col("c_mktsegment")).alias("occupation"),
        )
        snap = scd2.scd2_merge(snap, cust_tick, ["user_id"], ["occupation"],
                               f"2024-01-0{i + 1} 00:00:00")

    # raw target after 3 ticks == one full load
    final = spark.read.parquet(raw_path)
    assert final.count() == orders.count()
    assert final.exceptAll(orders).count() == 0
    expect_unique(final, ["o_orderkey"])
    expect_not_null(final, ["o_orderkey", "o_orderdate"])

    # SCD2 current state: keys flipped in an earlier tick and re-sent
    # with their original segment later must END on the original; only
    # the tick-2 flip (%3==2) survives as current.
    current = scd2.scd2_current(snap)
    expect_current = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.when(F.col("c_custkey") % 3 == 2, F.lit("SEG_2"))
        .otherwise(F.col("c_mktsegment")).alias("occupation"),
    )
    got = current.select("user_id", "occupation")
    assert got.count() == customer.count()
    assert got.exceptAll(expect_current).count() == 0

    # history depth per key:
    # %3==0: opens as SEG_0 at tick 0, reverts at tick 1 -> 2 versions
    # %3==1: opens orig, flips SEG_1 at tick 1, reverts at tick 2 -> 3
    # %3==2: opens orig, flips SEG_2 at tick 2 -> 2
    per_mod = {r["mod"]: (r["lo"], r["hi"]) for r in
               snap.groupBy("user_id").count()
                   .withColumn("mod", F.col("user_id") % 3)
                   .groupBy("mod")
                   .agg(F.min("count").alias("lo"), F.max("count").alias("hi"))
                   .collect()}
    assert per_mod == {0: (2, 2), 1: (3, 3), 2: (2, 2)}, per_mod


def test_cli_list_run_oracle(tmp_path):
    """The __main__ CLI surface: list names, run an entry as NDJSON,
    print an oracle."""
    import json
    import subprocess
    import sys

    env_dir = "/root/testdata/sf0.001"
    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "list"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo")
    names = out.stdout.split()
    assert out.returncode == 0 and "pricing_summary" in names and "dup_spans" in names

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "run",
         "quality_summary", "--sf-dir", env_dir, "--json"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(rows) == 1 and rows[0]["n_rows"] > 0

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "oracle", "pricing_summary"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo")
    assert out.returncode == 0 and "l_returnflag" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "run", "nope"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo")
    assert out.returncode == 2


def test_cli_sql_index_search_curate(tmp_path):
    """The round-3 CLI surface: ad-hoc SQL, persisted-index build +
    search, and the one-call curation flow."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "sql",
         "SELECT COUNT(*) AS n FROM orders"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0 and "1500" in out.stdout

    idx = str(tmp_path / "ivf")
    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "index",
         "--path", idx, "--cells", "8"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_cells"] == 8 and stats["n_vectors"] == 500

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "search",
         "--path", idx, "--k", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0 and "query_id" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "cdc_data_pipeline_spark", "curate"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert out.returncode == 0
    funnel = json.loads(out.stdout.strip().splitlines()[-1])
    assert funnel["input"] >= funnel["after_decontaminate"] > 0


def test_cli_versions_rollback_vacuum(tmp_path):
    """Versioned-table management CLI: list, O(1) rollback, vacuum
    (which must protect the pointer and anything newer than it)."""
    import json
    import subprocess
    import sys

    base = str(tmp_path / "vt")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "cdc_data_pipeline_spark", *args],
            capture_output=True, text=True, timeout=300, cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-500:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    run("build", "--base-path", base, "--select", "+stg_users")
    run("build", "--base-path", base, "--select", "+stg_users")
    tbl = f"{base}/stg_users"
    assert run("versions", "--table-path", tbl) == {"versions": [1, 2], "current": 2}
    assert run("rollback", "--table-path", tbl, "--to", "1") == {"current": 1}
    # v2 is newer than the pointer -> protected
    assert run("vacuum", "--table-path", tbl, "--keep", "1") == \
        {"removed": [], "versions": [1, 2]}
    run("rollback", "--table-path", tbl, "--to", "2")
    assert run("vacuum", "--table-path", tbl, "--keep", "1") == \
        {"removed": [1], "versions": [2]}
