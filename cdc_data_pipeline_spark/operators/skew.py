"""Skew mitigation for non-algebraic aggregations.

Algebraic aggregates (sum/count/min/max) get map-side partial combine
for free, and AQE splits skewed JOIN partitions — but a skewed
``collect_set``/``collect_list`` on a hot key still funnels every row
of that key through one reducer. Salting splits the hot key into
``salt`` sub-keys, aggregates the small pieces in parallel, then
merges the per-salt partials (a second, tiny aggregation over one row
per (key, salt)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt: int = 16,
    sort_result: bool = True,
) -> DataFrame:
    """Distinct values per key as an array, aggregated in two salted
    stages. Result is identical to a direct
    ``groupBy(keys).agg(collect_set(value))`` (pinned in tests) but the
    heaviest reducer sees ~1/salt of a hot key's rows.
    """
    keys = list(keys)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt)))
    partial = (
        salted.groupBy(*keys, "__salt")
        .agg(F.collect_set(value_col).alias("__part"))
    )
    merged = (
        partial.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias("values"))
    )
    if sort_result:
        merged = merged.withColumn("values", F.array_sort("values"))
    return merged
