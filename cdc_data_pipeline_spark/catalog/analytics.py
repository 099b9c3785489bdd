"""Analytics catalog: window functions, rollup/pivot, distinct/sort,
monthly partition rollups, as-of join — relational surface beyond the
reference's own SQL (SURVEY §2.5 notes these arrive Spark-side).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.catalog.core import _t
from cdc_data_pipeline_spark.operators.asof import asof_join


def q_running_total(spark, sf_dir):
    """Cumulative window aggregation per customer, deterministic frame
    order (date, key) so both engines sum in the same sequence."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.sum(F.round("o_totalprice", 2)).over(w), 2).alias("running_total"),
    )


SQL_RUNNING_TOTAL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       ROUND(SUM(ROUND(o_totalprice, 2)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


def q_status_pivot(spark, sf_dir):
    """Pivot order status into columns (explicit values keep Catalyst
    from an extra distinct pass — and keep the schema stable)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


SQL_STATUS_PIVOT = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


def q_sales_rollup(spark, sf_dir):
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n_rows"))
    )


SQL_SALES_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_distinct_priorities(spark, sf_dir):
    """R13/R11: distinct + sort."""
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct() \
        .orderBy("o_orderpriority")


SQL_DISTINCT_PRIORITIES = """
SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority
"""


def q_monthly_shipments(spark, sf_dir):
    """F4: toStartOfMonth partition rollup (reference partitions the
    transactions table by month, init-clickhouse.sql:37)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.trunc("l_shipdate", "month").alias("ship_month"))
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


SQL_MONTHLY_SHIPMENTS = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY 1
"""


def q_asof_order_state(spark, sf_dir):
    """As-of join: for each event, the user's most recent order state at
    event time (backward-inclusive). Union+window formulation — one
    shuffle, no range join. Right side pre-deduped per (user, date)."""
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    right = (
        orders.groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_order_key"))
    )
    out = asof_join(events, right, on=["user_id"], left_ts="ts",
                    right_ts="o_orderdate", right_cols=["last_order_key"])
    return out.select("event_id", "user_id", "ts",
                      F.col("o_orderdate").alias("last_order_date"), "last_order_key")


SQL_ASOF_ORDER_STATE = """
WITH right_side AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_order_key
  FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderdate AS last_order_date, o.last_order_key
FROM events e ASOF LEFT JOIN right_side o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


def q_sales_cube(spark, sf_dir):
    """CUBE grouping sets (all subtotal combinations)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
             F.count(F.lit(1)).alias("n_rows"))
    )


SQL_SALES_CUBE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n_rows
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_top_orders_per_customer(spark, sf_dir):
    """Top-N per group via window rank (deterministic tiebreak)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.round("o_totalprice", 2).desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("amount"), "rank")
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS amount,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey ASC) AS INTEGER) AS rank
FROM orders
QUALIFY rank <= 3
"""


def q_customers_without_orders(spark, sf_dir):
    """R9 as a first-class entry: left-anti membership (customers with
    no order since 2000 — churned accounts)."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        cust.join(recent.select(F.col("o_custkey").alias("c_custkey")).distinct(),
                  ["c_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
"""


def q_order_value_percentiles(spark, sf_dir):
    """Exact percentiles (median / p95, linear interpolation) per order
    priority — Spark `percentile` and DuckDB `quantile_cont` share the
    same interpolated definition."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_ORDER_VALUE_PERCENTILES = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------- feature statistics

_NF_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_feature_normalize(spark, sf_dir):
    """Per-group z-score + min-max feature scaling: one stats pass per
    group (broadcast back), the fact side never shuffles. See
    operators/stats.py."""
    from cdc_data_pipeline_spark.operators.stats import normalize_features

    o = _t(spark, sf_dir, "orders")
    return normalize_features(o, ["o_totalprice"], by=["o_orderpriority"],
                              keep=["o_orderkey"])


SQL_FEATURE_NORMALIZE = """
WITH s AS (
  SELECT o_orderpriority, AVG(o_totalprice) mu, STDDEV_SAMP(o_totalprice) sd,
         MIN(o_totalprice) lo, MAX(o_totalprice) hi
  FROM orders GROUP BY 1)
SELECT o.o_orderkey, o.o_orderpriority,
       ROUND((o.o_totalprice - s.mu) / NULLIF(s.sd, 0), 6) AS o_totalprice_z,
       ROUND((o.o_totalprice - s.lo) / NULLIF(s.hi - s.lo, 0), 6) AS o_totalprice_mm
FROM orders o JOIN s USING (o_orderpriority)
"""


def q_corr_matrix(spark, sf_dir):
    """All pairwise Pearson correlations of the lineitem measures from
    ONE scan (single moment aggregate, map-side combined)."""
    from cdc_data_pipeline_spark.operators.stats import correlation_matrix

    return correlation_matrix(_t(spark, sf_dir, "lineitem"), _NF_COLS)


def _corr_sql():
    cols = _NF_COLS
    inner = ", ".join(f"SUM({c}) s_{c}, SUM({c}*{c}) ss_{c}" for c in cols)
    cross = ", ".join(f"SUM({a}*{b}) sx_{a}_{b}"
                      for i, a in enumerate(cols) for b in cols[i + 1:])
    terms = ", ".join(
        f"('{a}','{b}', ROUND((s.n*s.sx_{a}_{b} - s.s_{a}*s.s_{b})"
        f" / NULLIF(sqrt(s.n*s.ss_{a} - s.s_{a}*s.s_{a})"
        f" * sqrt(s.n*s.ss_{b} - s.s_{b}*s.s_{b}), 0), 6))"
        for i, a in enumerate(cols) for b in cols[i + 1:])
    return f"""
WITH s AS (SELECT COUNT(*)::DOUBLE n, {inner}, {cross} FROM lineitem)
SELECT p.* FROM s, (VALUES {terms}) AS p(col_a, col_b, corr)
"""


SQL_CORR_MATRIX = _corr_sql()


def q_price_deciles(spark, sf_dir):
    """Equi-depth bucketing: order totalprice into 10 equal-count
    buckets (NTILE semantics, front-loaded remainder) and report each
    bucket's count/min/max. Executed by operators.stats.global_ntile —
    a range-partitioned distributed sort plus closed-form bucket from
    the global rank — NOT an unpartitioned NTILE window, which Spark
    executes by moving every row into one task; deterministic
    tie-break on the key."""
    from cdc_data_pipeline_spark.operators.stats import global_ntile

    o = _t(spark, sf_dir, "orders")
    d = global_ntile(
        o.select(F.round("o_totalprice", 2).alias("price"), "o_orderkey"),
        buckets=10, order_cols=["price", "o_orderkey"], out_col="decile")
    return (d.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("price").alias("lo"), F.max("price").alias("hi"))
            .orderBy("decile"))


SQL_PRICE_DECILES = """
WITH d AS (
  SELECT ROUND(o_totalprice, 2) AS price,
         -- INTEGER cast: DuckDB ntile is BIGINT, Spark's is int
         CAST(ntile(10) OVER (ORDER BY ROUND(o_totalprice, 2), o_orderkey) AS INTEGER) AS decile
  FROM orders)
SELECT decile, COUNT(*) AS n_orders, MIN(price) AS lo, MAX(price) AS hi
FROM d GROUP BY decile ORDER BY decile
"""


def q_active_inactive_customers(spark, sf_dir):
    """Set operations (INTERSECT / EXCEPT — absent from the reference's
    SQL surface, SURVEY §2.4): customers with BOTH finished and open
    orders, and customers with finished orders only (both branches
    non-empty on the fixtures). Spark compiles both to aggregated
    semi/anti joins (no sort-based set diff); ``subtract`` is EXCEPT
    set semantics — exceptAll would leave multiplicity remainders for
    multi-order customers."""
    orders = _t(spark, sf_dir, "orders")
    fin = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    opn = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = fin.intersect(opn).withColumn("cohort", F.lit("retained"))
    lapsed = fin.subtract(opn).withColumn("cohort", F.lit("lapsed"))
    return both.unionByName(lapsed)


SQL_ACTIVE_INACTIVE = """
WITH fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
opn AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT o_custkey, 'retained' AS cohort FROM
  (SELECT o_custkey FROM fin INTERSECT SELECT o_custkey FROM opn)
UNION ALL
SELECT o_custkey, 'lapsed' FROM
  (SELECT o_custkey FROM fin EXCEPT SELECT o_custkey FROM opn)
"""


def q_status_unpivot(spark, sf_dir):
    """Unpivot (melt) — the inverse of status_pivot: per-customer
    status counts pivoted wide, then melted back to (customer, status,
    n) long form with zero cells dropped. Spark's native unpivot
    operator (SQL UNPIVOT / DataFrame.unpivot, Spark 3.4+)."""
    orders = _t(spark, sf_dir, "orders")
    wide = (orders.groupBy("o_custkey")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1))))
    long = wide.unpivot("o_custkey", ["F", "O", "P"], "status", "n")
    return long.filter(F.col("n").isNotNull()) \
        .select("o_custkey", "status", F.col("n").cast("long").alias("n"))


SQL_STATUS_UNPIVOT = """
SELECT o_custkey, o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY o_custkey, o_orderstatus
"""


QUERIES = {
    "asof_order_state": q_asof_order_state,
}

ORACLES = {
    "asof_order_state": SQL_ASOF_ORDER_STATE,
}

# Local-parity-only tier (driver caps conformance at 50 entries; these
# shapes are redundant with exported entries — cube repeats rollup's
# grouping-sets machinery, window rank/cumsum repeat upsert_dedup's
# QUALIFY row_number and events_sessionize's running SUM frame,
# anti-join repeats parts_never_returned, distinct repeats
# supplier_counts — and all five were driver-green in round 1).
# Still oracle-verified by tests/test_oracle_parity.py on every run.
EXTRA_QUERIES = {
    "sales_cube": q_sales_cube,
    "top_orders_per_customer": q_top_orders_per_customer,
    "customers_without_orders": q_customers_without_orders,
    "running_total": q_running_total,
    "distinct_priorities": q_distinct_priorities,
    "order_value_percentiles": q_order_value_percentiles,
    "status_pivot": q_status_pivot,
    "sales_rollup": q_sales_rollup,
    "monthly_shipments": q_monthly_shipments,
    "feature_normalize": q_feature_normalize,
    "corr_matrix": q_corr_matrix,
    "price_deciles": q_price_deciles,
    "active_inactive_customers": q_active_inactive_customers,
    "status_unpivot": q_status_unpivot,
}

EXTRA_ORACLES = {
    "sales_cube": SQL_SALES_CUBE,
    "top_orders_per_customer": SQL_TOP_ORDERS_PER_CUSTOMER,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "running_total": SQL_RUNNING_TOTAL,
    "distinct_priorities": SQL_DISTINCT_PRIORITIES,
    "order_value_percentiles": SQL_ORDER_VALUE_PERCENTILES,
    "status_pivot": SQL_STATUS_PIVOT,
    "sales_rollup": SQL_SALES_ROLLUP,
    "monthly_shipments": SQL_MONTHLY_SHIPMENTS,
    "feature_normalize": SQL_FEATURE_NORMALIZE,
    "corr_matrix": SQL_CORR_MATRIX,
    "price_deciles": SQL_PRICE_DECILES,
    "active_inactive_customers": SQL_ACTIVE_INACTIVE,
    "status_unpivot": SQL_STATUS_UNPIVOT,
}
