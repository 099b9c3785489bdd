"""Star-schema model layer — the dbt models re-expressed on fixtures.

Reference dbt DAG (dbt_project/dbt/models/**): stg_users ->
users_snapshot -> dim_users; stg_savings_plan -> dim_savings_plan;
stg_savings_transaction -> fact_savings_transaction. Fixture mapping
per FIXTURES.md §C: customer≈users, orders≈savings_plan,
lineitem≈savingsTransaction, nation/region are enrichment dims.

Every model is DataFrame -> DataFrame; Catalyst provides the
parse/optimize/execute stack the reference delegated to dbt+ClickHouse.
Joins against nation/region/customer marts are broadcast — dimension
tables stay small relative to facts at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.scalars import to_lagos


def stg_users(customer: DataFrame) -> DataFrame:
    """Projection + rename (R1; reference models/staging/stg_users.sql:7-14)."""
    return customer.select(
        F.col("c_custkey").alias("user_table_id"),
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("occupation"),
        F.col("c_nationkey").cast("int").alias("state_id"),
        F.round(F.col("c_acctbal"), 2).alias("account_balance"),
    )


def dim_users(stg_users_df: DataFrame, nation: DataFrame) -> DataFrame:
    """Dim enrich: concat full_name (F1) + broadcast join to nation for a
    state name (R3; reference models/marts/dim_users.sql:6-15)."""
    n = F.broadcast(nation.select(F.col("n_nationkey").alias("state_id"), F.col("n_name").alias("state")))
    return (
        stg_users_df.join(n, "state_id", "left")
        .select(
            "user_id",
            F.concat_ws(" ", F.lit("User"), F.col("user_name")).alias("full_name"),
            "user_name",
            "occupation",
            "state",
            "account_balance",
        )
    )


def stg_savings_plan(orders: DataFrame) -> DataFrame:
    """Projection + rename + tz shift (R2/F2; reference
    models/staging/stg_savings_plan.sql:9-19). Lagos display time is an
    exact +1h shift (no DST) so the oracle reproduces it."""
    return orders.select(
        F.col("o_orderkey").alias("plan_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("product_type"),
        F.round(F.col("o_totalprice"), 2).alias("amount"),
        F.col("o_orderstatus").alias("status"),
        to_lagos("o_orderdate").alias("created_at"),
        F.col("o_orderdate").alias("updated_at"),
    )


def dim_savings_plan(stg_plan: DataFrame, dim_users_df: DataFrame) -> DataFrame:
    """Left equi-join enrich (R3; reference marts/dim_savings_plan.sql:10-26).
    The users dim is broadcast — classic small-dim pattern."""
    u = F.broadcast(dim_users_df.select("user_id", "full_name", "state", "occupation"))
    return (
        stg_plan.join(u, "user_id", "left")
        .select(
            "plan_id",
            "user_id",
            F.col("full_name").alias("customer_name"),
            F.col("state").alias("customer_state"),
            F.col("occupation").alias("user_occupation"),
            F.col("amount").alias("plan_amount"),
            "product_type",
            "status",
            "created_at",
            "updated_at",
        )
    )


def stg_savings_transaction(lineitem: DataFrame) -> DataFrame:
    """Projection + rename (R2; reference stg_savings_transaction.sql:11-21)."""
    return lineitem.select(
        F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")).alias("transaction_id"),
        F.col("l_orderkey").alias("plan_id"),
        F.round(F.col("l_extendedprice"), 2).alias("amount"),
        F.col("l_returnflag").alias("side"),
        F.round(F.col("l_discount"), 2).alias("rate"),
        to_lagos("l_shipdate").alias("created_at"),
        F.col("l_shipdate").alias("updated_at"),
    )


def fact_savings_transaction(stg_txn: DataFrame, dim_plan: DataFrame) -> DataFrame:
    """Fact enrich join (R4; reference marts/fact_savings_transaction.sql:10-23).

    The plan dim is explicitly broadcast: it is bounded by the number
    of savings plans (orders of magnitude below the transaction fact),
    but Spark's size estimate of the computed dim subtree exceeds the
    auto-broadcast threshold and silently planned a sort-merge join —
    a full shuffle of the FACT side that the hint removes."""
    p = F.broadcast(dim_plan.select("plan_id", "user_id", "product_type"))
    return (
        stg_txn.join(p, "plan_id", "left")
        .select(
            "transaction_id",
            "plan_id",
            "user_id",
            "product_type",
            "amount",
            "side",
            "rate",
            "created_at",
            "updated_at",
        )
    )


def build_star_registry(spark, sf_dir: str):
    """The flagship star-schema DAG as a registry (reference dbt graph,
    SURVEY §3.3) — shared by `__spark_entry__.entry()` and the CLI
    `build` command."""
    from cdc_data_pipeline_spark.plans.registry import ModelRegistry
    from cdc_data_pipeline_spark.sources.readers import read_table

    reg = ModelRegistry()
    for t in ("customer", "orders", "lineitem", "nation"):
        reg.add_source(t, read_table(spark, sf_dir, t))
    reg.model("stg_users", ("customer",))(stg_users)
    reg.model("dim_users", ("stg_users", "nation"))(dim_users)
    reg.model("stg_savings_plan", ("orders",))(stg_savings_plan)
    reg.model("dim_savings_plan", ("stg_savings_plan", "dim_users"))(dim_savings_plan)
    reg.model("stg_savings_transaction", ("lineitem",))(stg_savings_transaction)
    reg.model("fact_savings_transaction",
              ("stg_savings_transaction", "dim_savings_plan"))(fact_savings_transaction)
    return reg, ("customer", "orders", "lineitem", "nation")
