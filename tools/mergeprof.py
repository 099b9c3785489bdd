#!/usr/bin/env python
"""Phase-labeled profile of the table_change_feed lifecycle: wrap each
lifecycle step in setJobDescription so every Spark job (and the driver
gap before it) is attributed to a phase. One-off measurement tool."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_pipeline_spark.catalog.ext import _t  # noqa: E402
from cdc_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mergeprof", extra_conf={"spark.ui.enabled": "true",
                                               "spark.ui.port": "4099"})
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()

    import shutil
    import tempfile

    from cdc_data_pipeline_spark.operators.incremental import (
        read_changes, upsert_bucketed)

    runs = int(os.environ.get("MERGEPROF_RUNS", "2"))
    ui = sc.uiWebUrl
    app = sc.applicationId

    def _jobs():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs?status=succeeded") as r:
            return json.loads(r.read())

    for run in range(runs):
        first_job = max((j["jobId"] for j in _jobs()), default=-1) + 1
        t_all0 = time.time()
        base = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderdate")
        root = tempfile.mkdtemp(prefix="mergeprof_")
        path = root + "/t"
        marks = []
        try:
            sc.setJobDescription("phase1:create")
            t0 = time.time()
            upsert_bucketed(spark, path, base, ["o_orderkey"], "o_orderdate",
                            n_buckets=8, emit_changes=True)
            marks.append(("phase1:create", time.time() - t0))
            k = F.col("o_orderkey")
            upd = base.filter((k % 7 == 0) & (k % 11 != 0)).select(
                k.alias("o_orderkey"),
                F.round(F.col("o_totalprice") + 1.5, 2).alias("o_totalprice"),
                F.date_add("o_orderdate", 1).alias("o_orderdate"),
                F.lit(False).alias("is_del"))
            ins = base.filter(k % 13 == 0).select(
                (k + 100_000_000).alias("o_orderkey"), "o_totalprice",
                "o_orderdate", F.lit(False).alias("is_del"))
            dels = base.filter(k % 11 == 0).select(
                "o_orderkey", "o_totalprice",
                F.date_add("o_orderdate", 1).alias("o_orderdate"),
                F.lit(True).alias("is_del"))
            batch = upd.unionByName(ins).unionByName(dels)
            sc.setJobDescription("phase2:merge")
            t0 = time.time()
            upsert_bucketed(spark, path, batch, ["o_orderkey"], "o_orderdate",
                            delete_col="is_del", emit_changes=True)
            marks.append(("phase2:merge", time.time() - t0))
            sc.setJobDescription("phase3:read")
            t0 = time.time()
            feed = read_changes(spark, path, since_seq=0).select(
                "_op", "o_orderkey",
                F.round("o_totalprice", 2).alias("price"))
            feed = feed.localCheckpoint(eager=True)
            marks.append(("phase3:read", time.time() - t0))
            sc.setJobDescription("phase4:noop")
            t0 = time.time()
            feed.write.format("noop").mode("overwrite").save()
            marks.append(("phase4:noop", time.time() - t0))
            sc.setJobDescription(None)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        wall = time.time() - t_all0

        jobs = [j for j in _jobs() if j["jobId"] >= first_job]
        jobs.sort(key=lambda j: j["jobId"])

        def _ts(s):
            return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) \
                + float(s[20:23] or 0) / 1000.0

        per_phase: dict[str, list[float]] = {}
        prev_done = None
        for j in jobs:
            d = j.get("description") or ""
            if not d.startswith("phase"):
                prev_done = None
                continue
            sub = _ts(j["submissionTime"])
            try:
                done = _ts(j["completionTime"])
            except Exception:
                continue
            ms = (done - sub) * 1000
            gap = (sub - prev_done) * 1000 if prev_done else 0.0
            prev_done = done
            ph = per_phase.setdefault(d, [0, 0.0, 0.0])
            ph[0] += 1
            ph[1] += ms
            ph[2] += max(gap, 0)
            if run == runs - 1:
                print(json.dumps({
                    "job": j["jobId"], "phase": d, "ms": round(ms, 1),
                    "gap_ms": round(max(gap, 0), 1),
                    "tasks": j.get("numTasks"),
                    "name": j.get("name", "")[:80]}), flush=True)
        print(json.dumps({"run": run, "wall": round(wall, 3),
                          "phases": {k: {"jobs": v[0],
                                         "job_ms": round(v[1], 1),
                                         "gap_ms": round(v[2], 1)}
                                     for k, v in sorted(per_phase.items())},
                          "marks": [(m, round(s, 3)) for m, s in marks]}),
              flush=True)


if __name__ == "__main__":
    main()
