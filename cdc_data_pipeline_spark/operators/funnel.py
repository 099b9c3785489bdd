"""Funnel and cohort-retention analytics over the events stream.

Reference parity: the reference's analytics layer stops at windowed
aggregates and sessionization (`dbt_project/models/`, SURVEY §2.4);
funnels and retention are the immediately-adjacent product-analytics
asks on the same event table, built from the same groupBy machinery —
they belong in a "complete" engine surface (SURVEY §7.6).

Scale design (100 TB of events):

- ``funnel_steps`` is ONE shuffle keyed on the user id: per-user
  events are collected and ordered inside the aggregate, then the
  strictly-increasing step scan runs as a native ``aggregate`` HOF —
  JVM-side, no Python, no window over the full corpus. Per-user state
  is bounded by that user's event count (product-analytics norm);
  pathological bot users can be pre-capped with a count filter.
- ``funnel_counts`` reduces that to one row per step — a tiny
  map-side-combinable groupBy.
- ``cohort_retention`` is two user-keyed aggregations: first-seen
  cohort election (min), then (cohort, period) distinct-user counts.
  Both shuffles carry only (user, week) pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Per-user ordered funnel progression.

    A user completes step ``i`` at the EARLIEST event of type
    ``steps[i]`` that is strictly after their step ``i-1`` completion
    time. Returns ``(user_col, steps_completed, last_step_ts)`` for
    every user with at least one step-0 event; ``steps_completed`` in
    ``1..len(steps)``.
    """
    nsteps = len(steps)
    ev = (events
          .filter(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col), F.col(ts_col).alias("__ts"),
                  F.col(type_col).alias("__et")))
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__et"))).alias("__evs"))

    # sequential scan: state = (next step index, ts of last completed
    # step). An event advances the state iff its type is the next
    # step and (for steps > 0) it is strictly later than the previous
    # completion. All native `aggregate` HOF — whole-stage codegen.
    step_of = F.create_map(*[x for i, s in enumerate(steps)
                             for x in (F.lit(s), F.lit(i))])
    init = F.struct(F.lit(0).alias("nxt"),
                    F.lit(None).cast(ev.schema["__ts"].dataType).alias("last_ts"))
    scan = F.aggregate(
        "__evs", init,
        lambda acc, e: F.when(
            (acc.nxt < nsteps)
            & (step_of[e["__et"]] == acc.nxt)
            & ((acc.nxt == 0) | (e["__ts"] > acc.last_ts)),
            F.struct((acc.nxt + 1).alias("nxt"), e["__ts"].alias("last_ts")),
        ).otherwise(acc))
    return (per_user
            .withColumn("__scan", scan)
            .filter(F.col("__scan.nxt") > 0)
            .select(user_col,
                    F.col("__scan.nxt").cast("long").alias("steps_completed"),
                    F.col("__scan.last_ts").alias("last_step_ts")))


def funnel_counts(events: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Classic funnel report: for each step, how many users reached at
    least that step. One row per step index (1-based)."""
    prog = funnel_steps(events, steps, user_col, ts_col, type_col)
    counts = (prog.groupBy("steps_completed")
              .agg(F.count(F.lit(1)).alias("__n")))
    # users who reached step i also reached every j < i
    step_idx = F.sequence(F.lit(1), F.col("steps_completed"))
    return (counts
            .select(F.explode(step_idx).alias("step"), "__n")
            .groupBy("step")
            .agg(F.sum("__n").cast("long").alias("n_users"))
            .orderBy("step"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, then
    distinct-user counts per (cohort_week, activity week offset).

    One scan, two shuffles: ``groupBy(user).collect_set(week)`` gives
    each user's distinct active weeks AND their cohort (array_min) in
    a single user-keyed pass — no distinct+join-back (which would scan
    the events twice and shuffle four times; Catalyst cannot reuse the
    exchange across the join's differently-pruned sides). Per-user
    state is bounded by the number of distinct weeks (tiny). The
    explode + final (cohort, offset) aggregate is map-side combined.

    Output: ``(cohort_week date, week_offset long, n_users long)``.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    per_user = (events
                .select(F.col(user_col), wk.alias("__wk"))
                .groupBy(user_col)
                .agg(F.collect_set("__wk").alias("__wks")))
    exploded = (per_user
                .select(F.array_min("__wks").alias("__cohort"),
                        F.explode("__wks").alias("__wk")))
    return (exploded
            .groupBy(F.to_date("__cohort").alias("cohort_week"),
                     F.floor(
                         (F.unix_timestamp("__wk") - F.unix_timestamp("__cohort"))
                         / (7 * 24 * 3600)).alias("week_offset"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .orderBy("cohort_week", "week_offset"))


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Markov transition counts between consecutive events per user:
    ``(from_type, to_type, n, p)`` with p = n / outgoing-total of
    from_type (6 dp). One user-keyed window (lag) + one tiny groupBy;
    the per-from normalization joins on the handful of event types —
    broadcast, never a second pass over the events."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (events
             .select(F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
                     F.col(type_col).alias("to_type"))
             .withColumn("from_type", F.lag("to_type").over(w))
             .filter(F.col("from_type").isNotNull()))
    counts = (pairs.groupBy("from_type", "to_type")
              .agg(F.count(F.lit(1)).alias("n")))
    outgoing = counts.groupBy("from_type").agg(F.sum("n").alias("__out"))
    return (counts.join(F.broadcast(outgoing), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("__out"), 6).alias("p"))
            .orderBy("from_type", "to_type"))


def rolling_anomalies(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      lookback: int = 20, z_threshold: float = 3.0,
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Per-user rolling z-score anomaly flags: each event's value
    against the mean/stddev of the previous ``lookback`` events (frame
    excludes the current row — no self-contamination). One user-keyed
    window pass; per-partition state is the frame buffer, bounded by
    ``lookback``. Rows with fewer than 2 prior events are unscored
    (NULL z, not flagged)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
         .rowsBetween(-lookback, -1))
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.round((F.col(value_col) - mu) / F.nullif(sd, F.lit(0.0)), 6)
    return (events
            .select(F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
                    F.col(value_col))
            .withColumn("zscore", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("zscore")) > z_threshold,
                                   F.lit(False))))
