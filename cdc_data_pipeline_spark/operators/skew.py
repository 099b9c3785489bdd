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


def skew_report(df: DataFrame, keys: Sequence[str], top: int = 20) -> DataFrame:
    """Join/agg skew diagnosis for a key: the ``top`` hottest key
    values with their share of all rows and the ratio to a perfectly
    uniform key — the number that tells you whether to salt (ratio >>
    partition count) or let AQE's skew split handle it.

    One groupBy (map-side combined) + a tiny ungrouped aggregate
    joined by literal broadcast; the top-N is a TakeOrdered, no global
    sort. Safe to run on the 100 TB fact itself.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys")).first()
    total, n_keys = totals["__total"] or 0, totals["__n_keys"] or 1
    uniform = total / n_keys if n_keys else 0.0
    return (counts
            .withColumn("share", F.round(F.col("n_rows") / F.lit(max(total, 1)), 6))
            .withColumn("x_uniform",
                        F.round(F.col("n_rows") / F.lit(max(uniform, 1e-12)), 2))
            .orderBy(F.col("n_rows").desc(), *keys)
            .limit(top))
