"""As-of (temporal) join — an operator the reference's warehouse lacks
and Spark has no builtin for; expressed as a composition of union +
window so it scales.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row with the same key and ``right_ts <= left_ts`` (backward,
inclusive — the CDC "state as of event time" lookup).

Scale design: the naive formulation is a range join (key-equi +
inequality) that Spark executes as a broadcast-nested-loop or an
exploding sort-merge. The union trick instead:
  1. tag both inputs and union them (no join!),
  2. one window sort per key over the merged timeline,
  3. ``last(right_payload, ignorenulls=True)`` carries the latest right
     row forward to each left row.
Cost: ONE shuffle on the key + a per-partition sort — the same cost as
a single sort-merge join, independent of how many right rows precede
each left row. Right rows tying a left timestamp sort first, so the
match is inclusive.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join; right payload columns are appended
    (suffixed where names collide with left). Right side should be
    unique per (key, right_ts) — pre-dedup with ``latest_per_key``
    otherwise, or the carried match among ties is unspecified.
    """
    on = list(on)
    right_cols = [c for c in (right_cols or right.columns) if c not in on and c != right_ts]
    payload_cols = [right_ts, *right_cols]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload_cols}

    lrow_type = T.StructType([left.schema[c] for c in left.columns])
    payload_type = T.StructType([right.schema[c] for c in payload_cols])

    l_m = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_m = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )

    merged = l_m.unionByName(r_m)
    # right rows (__is_left=0) sort before left rows at equal timestamps
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))

    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols],
    )
