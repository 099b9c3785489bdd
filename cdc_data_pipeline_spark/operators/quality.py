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


def with_violations(df: DataFrame, rules: dict) -> DataFrame:
    """Append a ``_violations`` array naming every rule the row fails.

    ``rules`` maps rule name -> boolean Column (True == row PASSES).
    All rules evaluate in ONE projection — no per-rule scans, no
    shuffle; NULL rule results count as failures (SQL three-valued
    logic must not quietly pass a row).
    """
    checks = [
        F.when(cond.isNull() | ~cond, F.lit(name))
        for name, cond in rules.items()
    ]
    return df.withColumn(
        "_violations",
        F.array_compact(F.array(*checks)).cast("array<string>"))


def quarantine_split(df: DataFrame, rules: dict) -> tuple[DataFrame, DataFrame]:
    """Route rows by validity: ``(good, bad)`` where bad rows carry
    ``_violations`` naming each failed rule — the badRecordsPath
    pattern for semantic (not parse) errors. Write ``bad`` next to the
    target and replay it after upstream fixes; the pipeline never
    drops data silently and never poisons the target.

    Both frames derive from one projection; Catalyst evaluates the
    rule columns once per side (map-only, no shuffle). Reference
    parity: the reference logs-and-skips bad rows inside its loaders
    (base_loader.py skip_unknown_fields / type coercion); here routing
    is explicit and the reasons are queryable.
    """
    flagged = with_violations(df, rules)
    good = flagged.filter(F.size("_violations") == 0).drop("_violations")
    bad = flagged.filter(F.size("_violations") > 0)
    return good, bad
