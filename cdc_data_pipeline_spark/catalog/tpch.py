"""TPC-H-shaped relational breadth: distinct aggregation, HAVING,
correlated scalar subqueries, and multi-predicate anti-join — classic
warehouse query shapes a reference user would expect the engine to run
(the reference's own SQL surface is small; SURVEY §2.5 notes the rest
arrives Spark-side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.catalog.core import _t


def q_supplier_counts(spark, sf_dir):
    """Q16 shape: distinct-count aggregation after an exclusion filter."""
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(~F.col("p_brand").isin("Brand#1"))
    )
    return (
        pairs.groupBy("p_brand", "p_size")
        .agg(F.count_distinct("s_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_COUNTS = """
SELECT p.p_brand, p.p_size, COUNT(DISTINCT s.s_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_brand NOT IN ('Brand#1')
GROUP BY p.p_brand, p.p_size
"""


def q_big_spenders(spark, sf_dir):
    """Q18 shape: GROUP BY ... HAVING SUM over a join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
    )


SQL_BIG_SPENDERS = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, b.total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING ROUND(SUM(l_quantity), 2) > 150) b
ON o.o_orderkey = b.l_orderkey
"""


def q_above_avg_orders(spark, sf_dir):
    """Q17/Q2 shape: correlated scalar subquery — orders above their
    customer's average order value. Spark decorrelates this into an
    aggregation + join automatically (no per-row re-execution)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("tpch_orders_src")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS amount
        FROM tpch_orders_src o
        WHERE o_totalprice > (
          SELECT 1.5 * AVG(o_totalprice) FROM tpch_orders_src i
          WHERE i.o_custkey = o.o_custkey)
    """)


SQL_ABOVE_AVG_ORDERS = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS amount
FROM orders o
WHERE o_totalprice > (
  SELECT 1.5 * AVG(o_totalprice) FROM orders i
  WHERE i.o_custkey = o.o_custkey)
"""


def q_parts_never_shipped_late(spark, sf_dir):
    """Q21-ish anti-join with an extra predicate: parts with no
    returned lineitem since 2000."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    returned = li.filter((F.col("l_returnflag") == "R")
                         & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))) \
        .select(F.col("l_partkey").alias("p_partkey")).distinct()
    return (
        part.join(returned, ["p_partkey"], "left_anti")
        .select("p_partkey", "p_brand", F.round("p_retailprice", 2).alias("price"))
    )


SQL_PARTS_NEVER_SHIPPED_LATE = """
SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS price
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem
  WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): three-table join with
    date-window predicates, revenue aggregation, top 10. The dim side
    (filtered customers) broadcasts; both date filters reach their
    parquet scans; top-10 is a TakeOrdered, no global sort."""
    from pyspark.sql.functions import broadcast

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                         2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10))


SQL_SHIPPING_PRIORITY = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


def q_order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): orders in a quarter
    with EXISTS a returned lineitem, counted per priority. The EXISTS
    compiles to a left-semi hash join — the lineitem side never
    duplicates order rows, and both date filters push to the scans."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp")))
    returned = _t(spark, sf_dir, "lineitem") \
        .filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (orders.join(returned, orders.o_orderkey == returned.l_orderkey,
                        "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


SQL_ORDER_PRIORITY_COUNTS = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_priority_shipping_mix(spark, sf_dir):
    """TPC-H Q12 shape: join + CASE-bucketed conditional counts —
    per lineitem status, how many of its orders are high- vs
    low-priority. One join keyed on the order, map-side combined."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("long")
                 .alias("low_line_count"))
            .orderBy("l_linestatus"))


SQL_PRIORITY_SHIPPING_MIX = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): conditional-aggregate ratio
    over a part join — one scalar out. Revenue terms are summed as
    exact DECIMAL (no float-order drift) and the ratio rounds once."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (1 - F.col("l_discount").cast("decimal(18,2)")))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(F.lit(0).cast("decimal(18,2)")))
                / F.sum(rev), 6).alias("promo_revenue_pct")))


SQL_PROMO_REVENUE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE 0 END)
             / SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))), 6)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


QUERIES = {}

ORACLES = {}

# Local-parity-only tier (driver caps conformance at 50 entries; all
# four were driver-green in round 1, and each one's machinery also
# appears in an exported entry — distinct-count aggregation in
# kmv_distinct/quality_summary, scalar-subquery comparison in
# incremental_watermark, HAVING-over-join in big_spenders'
# duplicate_keys twin, predicate anti-join in upsert). Verified by
# test_oracle_parity on every run.
EXTRA_QUERIES = {
    "order_priority_counts": q_order_priority_counts,
    "priority_shipping_mix": q_priority_shipping_mix,
    "promo_revenue": q_promo_revenue,
    "supplier_counts": q_supplier_counts,
    "above_avg_orders": q_above_avg_orders,
    "big_spenders": q_big_spenders,
    "parts_never_returned": q_parts_never_shipped_late,
    "shipping_priority": q_shipping_priority,
}
EXTRA_ORACLES = {
    "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
    "priority_shipping_mix": SQL_PRIORITY_SHIPPING_MIX,
    "promo_revenue": SQL_PROMO_REVENUE,
    "supplier_counts": SQL_SUPPLIER_COUNTS,
    "above_avg_orders": SQL_ABOVE_AVG_ORDERS,
    "big_spenders": SQL_BIG_SPENDERS,
    "parts_never_returned": SQL_PARTS_NEVER_SHIPPED_LATE,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
}
