"""Core relational + CDC query catalog (SURVEY §2.1-§2.6 operators).

Each entry: a PySpark implementation built from the engine library, and
a DuckDB oracle SQL string computing the same result. Column names and
rounding are aligned on both sides (driver compares order-insensitive
value hashes after sorting columns by name).

Float policy: aggregates are ROUNDed at or finer than the data's
decimal grid (prices/discounts are 2dp, products 4dp-grid) so IEEE
noise cannot flip a rounding; averages round at 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import incremental as inc
from cdc_data_pipeline_spark.operators import scd2
from cdc_data_pipeline_spark.plans import models
from cdc_data_pipeline_spark.session import configure_session
from cdc_data_pipeline_spark.sources.readers import incremental_scan, read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    return read_table(spark, sf_dir, name)


def lifecycle_result(df: DataFrame, tmp_path: str) -> DataFrame:
    """Finish a persisted-index LIFECYCLE catalog entry: materialize
    the served result (localCheckpoint — the frame must stop
    referencing the throwaway index's files before they go away), then
    remove the tempdir so repeated catalog runs leave no ``cdcspark_*``
    residue behind. Callers wrap their whole lifecycle in
    try/finally(rmtree) and route the success path through here."""
    import shutil

    out = df.localCheckpoint(eager=True)
    shutil.rmtree(tmp_path, ignore_errors=True)
    return out


# ---------------------------------------------------------------- models

def q_stg_savings_plan(spark, sf_dir):
    """R1/R2/F2/P7: projection + rename + rounding cast + Lagos tz shift."""
    return models.stg_savings_plan(_t(spark, sf_dir, "orders"))


SQL_STG_SAVINGS_PLAN = """
SELECT o_orderkey AS plan_id, o_custkey AS user_id,
       o_orderpriority AS product_type,
       ROUND(o_totalprice, 2) AS amount, o_orderstatus AS status,
       o_orderdate + INTERVAL 1 HOUR AS created_at,
       o_orderdate AS updated_at
FROM orders
"""


def q_dim_users(spark, sf_dir):
    """F1/R3: full_name concat + broadcast join to nation."""
    return models.dim_users(models.stg_users(_t(spark, sf_dir, "customer")), _t(spark, sf_dir, "nation"))


SQL_DIM_USERS = """
SELECT c.c_custkey AS user_id,
       'User ' || c.c_name AS full_name,
       c.c_name AS user_name,
       c.c_mktsegment AS occupation,
       n.n_name AS state,
       ROUND(c.c_acctbal, 2) AS account_balance
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def q_dim_savings_plan(spark, sf_dir):
    """R3: dim enrich left join (broadcast users dim)."""
    du = models.dim_users(models.stg_users(_t(spark, sf_dir, "customer")), _t(spark, sf_dir, "nation"))
    return models.dim_savings_plan(models.stg_savings_plan(_t(spark, sf_dir, "orders")), du)


SQL_DIM_SAVINGS_PLAN = f"""
WITH dim_users AS ({SQL_DIM_USERS}),
stg_plan AS ({SQL_STG_SAVINGS_PLAN})
SELECT p.plan_id, p.user_id, u.full_name AS customer_name,
       u.state AS customer_state, u.occupation AS user_occupation,
       p.amount AS plan_amount, p.product_type, p.status,
       p.created_at, p.updated_at
FROM stg_plan p LEFT JOIN dim_users u ON p.user_id = u.user_id
"""


def q_fact_savings_transaction(spark, sf_dir):
    """R4: fact enrich left join."""
    du = models.dim_users(models.stg_users(_t(spark, sf_dir, "customer")), _t(spark, sf_dir, "nation"))
    dp = models.dim_savings_plan(models.stg_savings_plan(_t(spark, sf_dir, "orders")), du)
    return models.fact_savings_transaction(models.stg_savings_transaction(_t(spark, sf_dir, "lineitem")), dp)


SQL_FACT_SAVINGS_TRANSACTION = f"""
WITH dim_plan AS ({SQL_DIM_SAVINGS_PLAN})
SELECT l.l_orderkey::VARCHAR || '-' || l.l_linenumber::VARCHAR AS transaction_id,
       l.l_orderkey AS plan_id, p.user_id, p.product_type,
       ROUND(l.l_extendedprice, 2) AS amount,
       l.l_returnflag AS side, ROUND(l.l_discount, 2) AS rate,
       l.l_shipdate + INTERVAL 1 HOUR AS created_at,
       l.l_shipdate AS updated_at
FROM lineitem l LEFT JOIN dim_plan p ON l.l_orderkey = p.plan_id
"""


# ------------------------------------------------------------ incremental

def q_incremental_watermark(spark, sf_dir):
    """M5/M6/P9: scalar high-watermark read + exclusive filter.

    'Already loaded' = orders before 1997; watermark = MAX(o_orderdate)
    over the loaded slice; the batch is everything strictly newer.
    """
    orders = _t(spark, sf_dir, "orders")
    loaded = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    wm = inc.get_watermark(loaded, "o_orderdate")
    batch = incremental_scan(orders, "o_orderdate", wm, inclusive=False)
    return batch.select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("amount"), "o_orderdate",
    )


SQL_INCREMENTAL_WATERMARK = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS amount, o_orderdate
FROM orders
WHERE o_orderdate > (
  SELECT max(o_orderdate) FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
"""


def q_upsert(spark, sf_dir):
    """M2: incremental upsert (delete+insert by key) as anti-join+union.

    Target = keys with o_orderkey%10<8; batch re-sends keys %10>=5 with
    amount bumped by +10 (the 'update'); batch rows win.
    """
    orders = _t(spark, sf_dir, "orders")
    proj = orders.select(F.col("o_orderkey").alias("plan_id"), F.round("o_totalprice", 2).alias("amount"))
    target = proj.filter(F.col("plan_id") % 10 < 8).withColumn("batch_flag", F.lit(0))
    batch = (
        proj.filter(F.col("plan_id") % 10 >= 5)
        .withColumn("amount", F.round(F.col("amount") + 10.0, 2))
        .withColumn("batch_flag", F.lit(1))
    )
    return inc.upsert(target, batch, ["plan_id"])


SQL_UPSERT = """
WITH target AS (
  SELECT o_orderkey AS plan_id, ROUND(o_totalprice,2) AS amount, 0 AS batch_flag
  FROM orders WHERE o_orderkey % 10 < 8),
batch AS (
  SELECT o_orderkey AS plan_id, ROUND(ROUND(o_totalprice,2) + 10.0, 2) AS amount, 1 AS batch_flag
  FROM orders WHERE o_orderkey % 10 >= 5)
SELECT * FROM target WHERE plan_id NOT IN (SELECT plan_id FROM batch)
UNION ALL SELECT * FROM batch
"""


def q_upsert_dedup(spark, sf_dir):
    """M3/R8: upsert + latest-record-wins dedup via argmax aggregation.

    The batch contains every lineitem twice (original + a day-later
    'update' with quantity+1); keep-latest must retain only the update.
    """
    li = _t(spark, sf_dir, "lineitem")
    base = li.select("l_orderkey", "l_linenumber", F.col("l_shipdate").alias("updated_at"),
                     F.round("l_quantity", 2).alias("quantity"))
    newer = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_shipdate") + F.expr("INTERVAL 1 DAY")).alias("updated_at"),
        F.round(F.col("l_quantity") + 1, 2).alias("quantity"),
    )
    batch = base.unionByName(newer)
    # quantity tiebreaker: the fixture contains duplicate (orderkey,
    # linenumber) keys, so tracking-only ordering would tie
    return inc.latest_per_key(batch, ["l_orderkey", "l_linenumber"], "updated_at",
                              tiebreakers=["quantity"])


SQL_UPSERT_DEDUP = """
WITH batch AS (
  SELECT l_orderkey, l_linenumber, l_shipdate AS updated_at, ROUND(l_quantity,2) AS quantity
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_shipdate + INTERVAL 1 DAY, ROUND(l_quantity+1,2)
  FROM lineitem)
SELECT l_orderkey, l_linenumber, updated_at, quantity FROM batch
QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                           ORDER BY updated_at DESC, quantity DESC) = 1
"""


def q_snapshot_load(spark, sf_dir):
    """M4: date-partitioned snapshot overwrite (pure-function form).

    Existing partition 2024-01-01 holds keys %10<5; the new 2024-01-02
    snapshot stamps keys %10>=3. Only same-date partitions are replaced.
    """
    li = _t(spark, sf_dir, "lineitem")
    proj = li.select("l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("quantity"))
    target = proj.filter(F.col("l_orderkey") % 10 < 5).withColumn("snap_date", F.lit("2024-01-01").cast("date"))
    batch = proj.filter(F.col("l_orderkey") % 10 >= 3)
    return inc.snapshot_load(target, batch, "snap_date", F.lit("2024-01-02").cast("date"))


SQL_SNAPSHOT_LOAD = """
SELECT l_orderkey, l_linenumber, ROUND(l_quantity,2) AS quantity, DATE '2024-01-01' AS snap_date
FROM lineitem WHERE l_orderkey % 10 < 5
UNION ALL
SELECT l_orderkey, l_linenumber, ROUND(l_quantity,2), DATE '2024-01-02'
FROM lineitem WHERE l_orderkey % 10 >= 3
"""


def q_duplicate_keys(spark, sf_dir):
    """R7: duplicate detection — GROUP BY key HAVING count>1."""
    return inc.duplicate_keys(_t(spark, sf_dir, "orders"), ["o_custkey"]) \
        .select("o_custkey", F.col("cnt").cast("long").alias("cnt"))


SQL_DUPLICATE_KEYS = """
SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""


def q_scd2_check(spark, sf_dir):
    """M7: SCD Type 2 'check' strategy over two deterministic batches.

    Batch 1 (2024-01-01) = all customers; batch 2 (2024-02-01) re-sends
    all rows but customers with c_custkey%7=0 change segment. Expected:
    changed keys get a closed v1 + open v2; everyone else keeps one open
    row.
    """
    cust = _t(spark, sf_dir, "customer")
    b1 = cust.select(F.col("c_custkey").alias("user_id"), F.col("c_name").alias("user_name"),
                     F.col("c_mktsegment").alias("occupation"))
    b2 = b1.withColumn(
        "occupation",
        F.when(F.col("user_id") % 7 == 0, F.lit("SEGMENT_CHANGED")).otherwise(F.col("occupation")),
    )
    s1 = scd2.scd2_merge(None, b1, ["user_id"], ["occupation"], "2024-01-01 00:00:00")
    s2 = scd2.scd2_merge(s1, b2, ["user_id"], ["occupation"], "2024-02-01 00:00:00")
    return s2.select("user_id", "user_name", "occupation",
                     "dbt_valid_from", "dbt_valid_to", "dbt_scd_id", "dbt_updated_at")


SQL_SCD2_CHECK = """
SELECT c_custkey AS user_id, c_name AS user_name, c_mktsegment AS occupation,
       TIMESTAMP '2024-01-01 00:00:00' AS dbt_valid_from,
       CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2024-02-01 00:00:00' END AS dbt_valid_to,
       md5(c_custkey::VARCHAR || '|' || '2024-01-01 00:00:00') AS dbt_scd_id,
       TIMESTAMP '2024-01-01 00:00:00' AS dbt_updated_at
FROM customer
UNION ALL
SELECT c_custkey, c_name, 'SEGMENT_CHANGED',
       TIMESTAMP '2024-02-01 00:00:00', NULL,
       md5(c_custkey::VARCHAR || '|' || '2024-02-01 00:00:00'),
       TIMESTAMP '2024-02-01 00:00:00'
FROM customer WHERE c_custkey % 7 = 0
"""


def q_scd2_temporal_join(spark, sf_dir):
    """Point-in-time enrichment against the SCD2 snapshot: each order
    (synthetic event time spanning the version boundary) joins the
    dimension version valid AT ITS EVENT TIME — the leakage-free
    feature-store join (operators/scd2.py::temporal_join). Exactly one
    version matches per fact because validity intervals partition the
    timeline."""
    snap = q_scd2_check(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    facts = orders.select(
        "o_orderkey", F.col("o_custkey").alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-15 00:00:00").cast("timestamp"))
            + (F.col("o_orderkey") % 60) * 86400).alias("event_ts"))
    out = scd2.temporal_join(facts, snap.select(
        "user_id", "occupation", "dbt_valid_from", "dbt_valid_to"),
        ["user_id"], "event_ts")
    return out.select("o_orderkey", "user_id", "event_ts",
                      "occupation", "dbt_valid_from")


SQL_SCD2_TEMPORAL_JOIN = f"""
WITH snap AS ({SQL_SCD2_CHECK}),
facts AS (
  SELECT o_orderkey, o_custkey AS user_id,
         TIMESTAMP '2024-01-15 00:00:00'
           + (o_orderkey % 60) * INTERVAL 1 DAY AS event_ts
  FROM orders)
SELECT f.o_orderkey, f.user_id, f.event_ts, s.occupation, s.dbt_valid_from
FROM facts f LEFT JOIN snap s
  ON f.user_id = s.user_id
 AND s.dbt_valid_from <= f.event_ts
 AND (s.dbt_valid_to IS NULL OR f.event_ts < s.dbt_valid_to)
"""


def q_scd2_current(spark, sf_dir):
    """R5: current-version filter over the SCD2 snapshot."""
    snap = q_scd2_check(spark, sf_dir)
    return scd2.scd2_current(snap).select("user_id", "occupation", "dbt_valid_from")


SQL_SCD2_CURRENT = f"""
SELECT user_id, occupation, dbt_valid_from
FROM ({SQL_SCD2_CHECK}) WHERE dbt_valid_to IS NULL
"""


# -------------------------------------------------------------- quality

def q_quality_summary(spark, sf_dir):
    """T1/T2: unique + not_null checks as one aggregate row."""
    orders = _t(spark, sf_dir, "orders")
    dup = inc.duplicate_keys(orders, ["o_orderkey"]).count()
    row = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("null_totalprice"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
    )
    return row.withColumn("dup_orderkeys", F.lit(dup).cast("long")) \
              .select("n_rows", "dup_orderkeys", "null_totalprice", "null_custkey")


SQL_QUALITY_SUMMARY = """
SELECT count(*) AS n_rows,
       (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) AS dup_orderkeys,
       count(*) FILTER (WHERE o_totalprice IS NULL) AS null_totalprice,
       count(*) FILTER (WHERE o_custkey IS NULL) AS null_custkey
FROM orders
"""


# ------------------------------------------------------------- analytics

def q_pricing_summary(spark, sf_dir):
    """Headline agg (TPC-H Q1 shape): grouped sums/avgs with map-side
    partial aggregation; filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf_dir):
    """Multi-join rollup (TPC-H Q5 shape): fact joins chain of broadcast
    dims; revenue grid is 1e-4 so ROUND(...,4) is noise-proof."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT r.r_name AS region, n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def q_top_orders(spark, sf_dir):
    """Join + agg + deterministic top-k (TPC-H Q3 shape). Rank on the
    ROUNDED revenue with key tiebreak so both engines cut the same set."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)


SQL_TOP_ORDERS = """
SELECT o.o_orderkey, o.o_orderdate,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""


QUERIES = {
    "stg_savings_plan": q_stg_savings_plan,
    "dim_users": q_dim_users,
    "dim_savings_plan": q_dim_savings_plan,
    "fact_savings_transaction": q_fact_savings_transaction,
    "incremental_watermark": q_incremental_watermark,
# upsert (M2) rotated to the local-parity tier in round 7: its
# anti-join+union machinery is a strict subset of upsert_dedup (M3)
# and of the promoted table_change_feed lifecycle row (ext.py), which
# runs the same merge through the bucketed sink WITH hard deletes and
# the change data feed under a value-exact oracle.
    "upsert_dedup": q_upsert_dedup,
    "snapshot_load": q_snapshot_load,
    "scd2_check": q_scd2_check,
    "quality_summary": q_quality_summary,
    # pricing_summary rotated to the local-parity tier in round 11:
    # its Q1-shape grouped-agg machinery stays pinned by the tpch
    # entries (order_priority_counts, promo_revenue) and by
    # quality_summary's ungrouped aggs; the freed driver slot goes to
    # versioned_mart (ext.py) — the versioned-table lifecycle, per
    # the r5 lesson that protocol breakage must be driver-visible
    # (VERDICT r10 #2).
    "revenue_by_nation": q_revenue_by_nation,
    # promoted in round 3 (r2 verdict #6): point-in-time temporal join
    # against SCD2 history is a distinct join family worth a driver pin
    "scd2_temporal_join": q_scd2_temporal_join,
}

ORACLES = {
    "stg_savings_plan": SQL_STG_SAVINGS_PLAN,
    "dim_users": SQL_DIM_USERS,
    "dim_savings_plan": SQL_DIM_SAVINGS_PLAN,
    "fact_savings_transaction": SQL_FACT_SAVINGS_TRANSACTION,
    "incremental_watermark": SQL_INCREMENTAL_WATERMARK,
    "upsert_dedup": SQL_UPSERT_DEDUP,
    "snapshot_load": SQL_SNAPSHOT_LOAD,
    "scd2_check": SQL_SCD2_CHECK,
    "quality_summary": SQL_QUALITY_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "scd2_temporal_join": SQL_SCD2_TEMPORAL_JOIN,
}

# Local-parity-only tier: the driver's conformance check caps at 50
# entries, so redundant relational shapes — each driver-green in round
# 1 and each one's machinery still exercised by an exported entry (R5
# current filter is the WHERE-IS-NULL tail of scd2_check, R7 HAVING
# repeats in quality_summary's dup check, R11/R12 sort+limit repeats
# in every top-k sampling/similarity entry) — live here: still
# oracle-verified by tests/test_oracle_parity.py on every run, just
# not exported through __spark_entry__.queries().
EXTRA_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "upsert": q_upsert,
    "scd2_current": q_scd2_current,
    "duplicate_keys": q_duplicate_keys,
    "top_orders": q_top_orders,
}
EXTRA_ORACLES = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "upsert": SQL_UPSERT,
    "scd2_current": SQL_SCD2_CURRENT,
    "duplicate_keys": SQL_DUPLICATE_KEYS,
    "top_orders": SQL_TOP_ORDERS,
}
