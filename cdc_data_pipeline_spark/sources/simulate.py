"""Deterministic CDC churn generation — the engine-side equivalent of
the reference's load simulator (reference: setup/simulate_cdc.py:11-19,
light/medium/heavy profiles of insert/update counts per tick).

Unlike the reference (Postgres ``random()``), selection here is
hash-based — ``xxhash64(key, tick)`` — so a tick's batch is a pure
function of (base table, tick, profile): reproducible across runs,
executors, and engines. Used to drive merge-strategy tests and soak
benchmarks without fixture mutation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: inserts, updates per tick — shaped after simulate_cdc.py:11-19
PROFILES = {
    "light": (100, 50),
    "medium": (1000, 500),
    "heavy": (5000, 2000),
}

KEY_STRIDE = 10_000_000


def churn_batch(
    base: DataFrame,
    keys: Sequence[str],
    tracking_column: str,
    tick: int,
    profile: str = "light",
    value_col: str | None = None,
) -> DataFrame:
    """One tick's change-batch: ``n_updates`` re-sent rows (tracking
    bumped by ``tick`` days, value perturbed) + ``n_inserts`` brand-new
    rows (first key shifted by tick*KEY_STRIDE).

    Row selection = lowest ``xxhash64(keys..., tick)`` — deterministic,
    uniformly spread, and different every tick.
    """
    n_inserts, n_updates = PROFILES[profile]
    h = F.xxhash64(*[F.col(k) for k in keys], F.lit(tick))

    updates = (
        base.withColumn("__h", h).orderBy("__h").limit(n_updates).drop("__h")
        .withColumn(tracking_column,
                    F.col(tracking_column) + F.expr(f"INTERVAL {tick} DAY"))
    )
    if value_col is not None:
        updates = updates.withColumn(value_col, F.round(F.col(value_col) * 1.1, 2))

    inserts = (
        base.withColumn("__h", F.xxhash64(*[F.col(k) for k in keys], F.lit(-tick)))
        .orderBy("__h").limit(n_inserts).drop("__h")
        .withColumn(keys[0], F.col(keys[0]) + F.lit(tick * KEY_STRIDE))
        .withColumn(tracking_column,
                    F.col(tracking_column) + F.expr(f"INTERVAL {tick} DAY"))
    )
    return updates.unionByName(inserts)
