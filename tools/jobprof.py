#!/usr/bin/env python
"""Itemize every Spark JOB inside one catalog query (or an ad-hoc
merge) via the live UI REST API: job id, description/callsite, wall
ms, stage count, task count. This is the per-merge fixed-floor
profiler VERDICT r12 #1 asks for — structural, host-immune.

    python tools/jobprof.py <query> [--runs 1]

Prints one JSON line per job, then a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from cdc_data_pipeline_spark import catalog  # noqa: E402
from cdc_data_pipeline_spark.session import get_spark  # noqa: E402


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the UI REST API is this tool's data source (the session default
    # disables the UI; profiling-only override, never the bench's)
    spark = get_spark("jobprof", extra_conf={"spark.ui.enabled": "true",
                                            "spark.ui.port": "4099"})
    qs = {**catalog.extra_queries(), **catalog.queries()}
    fn = qs[args.query]
    # warmup
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    for i in range(args.runs):
        group = f"jobprof-{i}-{time.time_ns()}"
        sc.setJobGroup(group, args.query)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = [j for j in _api(spark, "/jobs")
                if j.get("jobGroup") == group]
        jobs.sort(key=lambda j: j["jobId"])
        total_ms = 0

        def _ts(s):
            base = time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))
            return base + float(s[20:23] or 0) / 1000.0

        prev_done = None
        for j in jobs:
            sub = _ts(j["submissionTime"])
            try:
                ms = (_ts(j["completionTime"]) - sub) * 1000
            except Exception:
                ms = -1
            # driver-side gap since the previous job completed: fsutil
            # metadata work, plan compilation, broadcast builds, commit
            # renames — the per-merge fixed floor lives HERE
            gap = round((sub - prev_done) * 1000, 1) if prev_done else None
            prev_done = _ts(j["completionTime"]) if ms >= 0 else prev_done
            total_ms += max(ms, 0)
            print(json.dumps({
                "run": i, "job": j["jobId"],
                "ms": round(ms, 1), "gap_ms": gap,
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numTasks"),
                "name": j.get("name", "")[:110],
            }), flush=True)
        print(json.dumps({"run": i, "query": args.query,
                          "wall_sec": round(dt, 3),
                          "n_jobs": len(jobs),
                          "sum_job_ms": round(total_ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
