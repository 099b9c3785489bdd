"""Data-quality assertion operators (SURVEY §2.6 T1/T2).

Reference: dbt schema tests ``unique`` / ``not_null``
(dbt_project/dbt/models/staging/schema.yml, marts/schema.yml), executed
as part of every ``dbt build``. Each check is itself a DataFrame query
(oracle-checkable); ``expect_*`` raise for pipeline gating.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(AssertionError):
    pass


def unique_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows-per-duplicated-key; empty result == test passes (T1)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def not_null_violation_count(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column null counts; all zero == test passes (T2).

    One aggregate pass over the table (not one scan per column).
    """
    aggs = [F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in cols]
    return df.agg(*aggs)


def expect_unique(df: DataFrame, cols: Sequence[str]) -> None:
    n = unique_violations(df, cols).limit(1).count()
    if n:
        raise DataQualityError(f"unique violated on {cols}")


def expect_not_null(df: DataFrame, cols: Sequence[str]) -> None:
    row = not_null_violation_count(df, cols).first()
    bad = {c: row[f"{c}_nulls"] for c in cols if row[f"{c}_nulls"]}
    if bad:
        raise DataQualityError(f"not_null violated: {bad}")


def accepted_values_violations(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    """dbt ``accepted_values`` analogue (natural extension of T1/T2)."""
    return df.filter(~F.col(col).isin(list(values)) & F.col(col).isNotNull()) \
             .groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
