#!/usr/bin/env python
"""Per-query profiler for the optimization rounds.

For each named catalog query: run it (noop sink) N times under a
dedicated job group, record min wall, Spark job/stage/task counts
(host-immune structure, same approach as scale_soak.structural), and
dump ``explain("formatted")`` of the returned frame.

    python tools/qprof.py [--runs N] [--plans-dir plans/r12 --suffix _before] [query ...]

Prints one JSON line per query on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from cdc_data_pipeline_spark import catalog  # noqa: E402
from cdc_data_pipeline_spark.session import get_spark  # noqa: E402


def profile_one(spark, name, fn, sf_dir, runs, plans_dir, suffix):
    sc = spark.sparkContext
    best = None
    counters = None
    plan = None
    for i in range(runs):
        group = f"qprof-{name}-{i}-{time.time_ns()}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        if best is None or dt < best:
            best = dt
        if i == 0:
            st = sc.statusTracker()
            jobs = st.getJobIdsForGroup(group)
            stages, tasks = set(), 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    if sid in stages:
                        continue
                    si = st.getStageInfo(sid)
                    if si is not None:
                        stages.add(sid)
                        tasks += si.numTasks
            counters = {"jobs": len(jobs), "stages": len(stages),
                        "tasks": int(tasks)}
            try:
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            except Exception:
                import io
                import contextlib
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
    if plans_dir and plan is not None:
        os.makedirs(plans_dir, exist_ok=True)
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
    return {"query": name, "sec_min": round(best, 3), "runs": runs, **(counters or {})}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qprof")
    qs = {**catalog.extra_queries(), **catalog.queries()}
    names = args.queries or sorted(qs)
    # warmup
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}), flush=True)
            continue
        res = profile_one(spark, name, qs[name], sf_dir, args.runs,
                          args.plans_dir, args.suffix)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
