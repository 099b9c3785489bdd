"""Keyless range joins as bucketized equi-joins.

Spark executes a join whose ONLY predicate is a range condition
(point-in-interval, |t1 - t2| <= gap) as BroadcastNestedLoopJoin or a
cartesian product — O(n*m) comparisons and a single-task bottleneck
when neither side is broadcastable. These operators rewrite the range
predicate as a coarse time-bucket equi-join + residual filter, the
standard trick (also behind Databricks' RANGE_JOIN hint): each side
lands in gap-width buckets, candidates meet only inside a bucket, and
the exact predicate prunes the residue. Work becomes
O(n + m + matches) with a plain shuffled hash/sort-merge join that
AQE can re-plan and skew-split like any other equi-join.

Reference parity: the reference has no range-join operator at all
(its joins are dbt equi-joins, SURVEY §2.4 R3/R4); this is the batch
sibling of streaming/joins.py::interval_join (keyed, stream-capable).

Scale notes:

- bucket width trades shuffle fan-out against residual-filter
  selectivity; width == interval/gap size means each interval spans
  <= 2 buckets and each point probes exactly 1;
- intervals longer than the width explode to ceil(len/width)+1
  copies — explicit and linear, never quadratic. Pathologically long
  intervals should be capped or split upstream;
- a (point, interval) pair can meet in only ONE bucket (the point's),
  so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__rj_bucket"


def _epoch(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def point_interval_join(points: DataFrame, intervals: DataFrame,
                        ts_col: str, start_col: str, end_col: str,
                        bucket: str = "1 hour") -> DataFrame:
    """Inner-join points to every interval containing them
    (``start <= ts <= end``, inclusive), with no equi key.

    ``bucket`` is the coarse grid width (Spark interval literal).
    Output: all point columns + all interval columns.
    """
    width = _interval_seconds(points, bucket)
    p = points.withColumn(_B, F.floor(_epoch(ts_col) / width))
    iv = (intervals
          .withColumn(
              _B,
              F.explode(F.sequence(F.floor(_epoch(start_col) / width),
                                   F.floor(_epoch(end_col) / width)))))
    out = (p.join(iv, _B)
           .filter((F.col(ts_col) >= F.col(start_col))
                   & (F.col(ts_col) <= F.col(end_col)))
           .drop(_B))
    return out


def point_gap_join(left: DataFrame, right: DataFrame,
                   left_ts: str, right_ts: str,
                   gap: str = "30 minutes") -> DataFrame:
    """Inner-join left x right where ``|left_ts - right_ts| <= gap``,
    no equi key. Right rows are replicated into their own and both
    neighbour buckets (3 copies, constant), left rows probe exactly
    their one bucket."""
    width = _interval_seconds(left, gap)
    l = left.withColumn(_B, F.floor(_epoch(left_ts) / width))
    rb = F.floor(_epoch(right_ts) / width)
    r = right.withColumn(_B, F.explode(F.array(rb - 1, rb, rb + 1)))
    gap_s = F.lit(width)
    return (l.join(r, _B)
            .filter(F.abs(_epoch(left_ts) - _epoch(right_ts)) <= gap_s)
            .drop(_B))


def _interval_seconds(df: DataFrame, literal: str) -> float:
    """Resolve an interval literal to seconds via Catalyst constant
    folding (no hand parser, exact Spark semantics)."""
    row = df.sparkSession.range(1).select(
        (F.lit("1970-01-01 00:00:00").cast("timestamp")
         + F.expr(f"INTERVAL {literal}")).cast("double").alias("s")).first()
    if row["s"] is None or row["s"] <= 0:
        raise ValueError(f"cannot resolve interval literal: {literal}")
    return row["s"]
