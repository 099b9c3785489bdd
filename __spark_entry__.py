"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose the engine's conformance catalog
(cdc_data_pipeline_spark.catalog) — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from cdc_data_pipeline_spark import catalog  # noqa: E402
from cdc_data_pipeline_spark.plans import models  # noqa: E402
from cdc_data_pipeline_spark.session import configure_session  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star-schema model DAG (the reference's dbt graph,
    SURVEY §3.3) executed topologically, then the revenue rollup."""
    configure_session(spark)
    reg, _sources = models.build_star_registry(spark, SF0001)
    built = reg.run(select="+fact_savings_transaction")
    fact = built["fact_savings_transaction"]

    from pyspark.sql import functions as F

    return (
        fact.groupBy("product_type")
        .agg(
            F.count(F.lit(1)).alias("n_transactions"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.round(F.avg("rate"), 6).alias("avg_rate"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracles()
