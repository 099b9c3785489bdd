"""Funnel + cohort-retention operator contracts (catalog entries are
oracle-checked end-to-end in test_oracle_parity)."""

from __future__ import annotations

from datetime import datetime

from cdc_data_pipeline_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_funnel_requires_strict_order(spark):
    df = _ev(spark, [
        # user 1: full ordered funnel
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
        # user 2: purchase BEFORE click -> stops at click
        (2, 1, 1, "view"), (2, 1, 2, "purchase"), (2, 1, 3, "click"),
        # user 3: no view -> not in funnel at all
        (3, 1, 1, "click"), (3, 1, 2, "purchase"),
        # user 4: view only
        (4, 1, 9, "view"),
    ])
    steps = ["view", "click", "purchase"]
    prog = {r["user_id"]: r["steps_completed"]
            for r in funnel_steps(df, steps).collect()}
    assert prog == {1: 3, 2: 2, 4: 1}
    counts = {r["step"]: r["n_users"] for r in funnel_counts(df, steps).collect()}
    assert counts == {1: 3, 2: 2, 3: 1}


def test_funnel_simultaneous_events_do_not_advance(spark):
    # click at the SAME timestamp as view must not count (strict >)
    df = _ev(spark, [(7, 1, 5, "view"), (7, 1, 5, "click")])
    prog = funnel_steps(df, ["view", "click"]).collect()
    assert [(r["user_id"], r["steps_completed"]) for r in prog] == [(7, 1)]


def test_funnel_later_retry_advances(spark):
    # early click (before view) is ignored; the later one counts
    df = _ev(spark, [(5, 1, 1, "click"), (5, 1, 2, "view"), (5, 1, 3, "click")])
    prog = funnel_steps(df, ["view", "click"]).collect()
    assert [(r["user_id"], r["steps_completed"]) for r in prog] == [(5, 2)]


def test_cohort_retention_offsets(spark):
    df = _ev(spark, [
        # user 1 first seen week of Jan 1 (Mon), active weeks 0 and 2
        (1, 1, 1, "view"), (1, 16, 1, "view"),
        # user 2 first seen week of Jan 8, active weeks 0 and 1
        (2, 8, 1, "view"), (2, 15, 1, "view"),
    ])
    rows = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
            for r in cohort_retention(df).collect()}
    assert rows == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_transition_matrix_counts_and_probs(spark):
    from cdc_data_pipeline_spark.operators.funnel import transition_matrix

    rows = []
    # user 1: a -> b -> a -> b ; user 2: a -> c
    seq = {1: ["a", "b", "a", "b"], 2: ["a", "c"]}
    eid = 0
    for u, types in seq.items():
        for i, t in enumerate(types):
            rows.append((u, datetime(2024, 1, 1, i), eid, t))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in transition_matrix(df).collect()}
    # from 'a': 2x a->b, 1x a->c -> p = 2/3, 1/3; from 'b': b->a once
    assert got[("a", "b")] == (2, 0.666667)
    assert got[("a", "c")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got  # no cross-user transition 2->1


def test_rolling_anomalies_flags_spike(spark):
    from cdc_data_pipeline_spark.operators.funnel import rolling_anomalies

    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.1, 9.9, 100.0, 10.0]
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, i), i, v) for i, v in enumerate(vals)],
        "user_id long, ts timestamp, event_id long, value double")
    out = {r["event_id"]: r for r in rolling_anomalies(df, lookback=5).collect()}
    assert out[8]["is_anomaly"] is True           # the 100.0 spike
    assert out[0]["zscore"] is None and out[0]["is_anomaly"] is False
    normal = [out[i]["is_anomaly"] for i in range(2, 8)]
    assert not any(normal)
