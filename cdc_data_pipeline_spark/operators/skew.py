"""Skew mitigation: salted aggregation and salted join.

Algebraic aggregates (sum/count/min/max) get map-side partial combine
for free, and AQE splits skewed JOIN partitions — but a skewed
``collect_set``/``collect_list`` on a hot key still funnels every row
of that key through one reducer. Salting splits the hot key into
``salt`` sub-keys, aggregates the small pieces in parallel, then
merges the per-salt partials (a second, tiny aggregation over one row
per (key, salt)).

``salted_join`` covers the join case AQE can't: AQE splits a skewed
SHUFFLE partition, but when one key's rows alone exceed a partition
(the web-scale "null key" / "default id" pathology) every split still
contains the same hot key. Salting the probe side and replicating the
build side ``salt`` ways spreads a single key over ``salt`` reducers
deterministically.
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


def salted_join(big: DataFrame, small: DataFrame, keys: Sequence[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join where ``big`` has pathologically hot keys: each big
    row gets a deterministic salt from its OTHER columns' hash, and
    ``small`` is replicated ``salt`` ways (explode of a literal
    range), so the shuffle key (keys..., salt) spreads one hot key
    across ``salt`` reducers. Result equals ``big.join(small, keys,
    how)`` exactly (pinned in tests).

    Supports inner and left joins (the shapes that keep one row per
    big-side row). Cost: small side shuffles salt× its size — use for
    moderate ``small`` when broadcast is too big and AQE's split can't
    break a single-key partition.
    """
    assert how in ("inner", "left"), "salted_join keeps big-side row identity"
    keys = list(keys)
    non_key = [c for c in big.columns if c not in keys]
    b = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key]) if non_key
               else F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    s = (small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
              .withColumn("__salt", F.col("__salt").cast("int")))
    return b.join(s, keys + ["__salt"], how).drop("__salt")
