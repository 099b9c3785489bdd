#!/usr/bin/env python
"""Benchmark the headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no collect-to-driver cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from cdc_data_pipeline_spark import catalog  # noqa: E402
from cdc_data_pipeline_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "fact_savings_transaction",
    "incremental_watermark",
    "upsert",
    "upsert_dedup",
    "scd2_check",
    "merge_mixed",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_exact",
    "dup_spans",
    "minhash_lsh_pairs",
    "jaccard_pairs",
    "simhash_pairs",
    "topk_cosine",
    "ann_lsh_topk",
    "text_stats",
    "winnow_fingerprints",
    "media_features",
    "events_rollup_incremental",
    "funnel_counts",
    "outage_attribution",
    "gopher_quality",
    "events_quarantine",
    "transition_matrix",
    "rolling_anomalies",
    "scd2_temporal_join",
    "decontaminate",
    "kmv_distinct",
    "token_shards",
    "kmeans_clusters",
    "semdedup_pairs",
    "domain_caps",
    "shuffle_shards",
    "fuzzy_dedup_keep",
    "ivfpq_topk",
    "mixture_sample",
    "mixture_repeat",
    "sentiment_scores",
    "backoff_lm_score",
    "unicode_clean",
    "bpe_segment",
    "doc_embeddings",
    "bm25_topk",
    "hybrid_rrf_topk",
    # r7: the bucketed table's change-data-feed lifecycle (build +
    # mixed-op merge + feed read) — the engine's flagship CDC-out path
    "table_change_feed",
    # r8: feed-driven incremental view maintenance; real-decode
    # cross-modal dedup (Y4M temporal fingerprint / PPM bilinear aHash
    # through the shared blocked Hamming join)
    "ivm_mart",
    "video_dup_pairs",
    "image_dup_pairs",
    # r9: the SCD2 version-transition feed replayed into a
    # dbt_scd_id-keyed replica (promoted driver row, r8 verdict #6)
    "scd2_feed_replica",
    # r10: the partition-pruned point-lookup serve path through a full
    # build+merge lifecycle (promoted driver row, r9 verdict #3)
    "lookup_bucketed",
    # r11: the versioned pointer-table lifecycle (two dbt-build
    # materializations + rollback + time travel + audit manifest;
    # promoted driver row, r10 verdict #2)
    "versioned_mart",
]


def _cpu_probe(rounds: int = 3) -> float:
    """Fixed single-core calibration probe: SHA-256 over 64 MiB of
    constant bytes, min of ``rounds`` runs. Pure CPU, no Spark, no
    allocation growth — cross-round bench deltas can divide by this to
    normalize the host's documented 1.5-2x phase noise (r7 verdict #7)
    instead of guessing which movements are real."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(64):
            h.update(buf)
        h.digest()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def _spark_probe(spark, rounds: int = 2) -> float:
    """Fixed PARALLEL calibration probe: one all-core Spark job
    (sum of id*id over a fixed range), min of ``rounds``. The r8
    closing runs showed a host phase where every 32-core query drifted
    +10-30% together while the single-core SHA probe stayed flat —
    contention/throttle that only shows under parallel load. This
    probe moves WITH that phase, so cross-round deltas can be
    normalized against the probe that matches the workload shape."""
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        spark.range(200_000_000) \
            .selectExpr("sum(pmod(xxhash64(id), 1000000)) AS s") \
            .write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("cdc-bench")
    queries = {**catalog.extra_queries(), **catalog.queries()}

    # untimed warmup: JVM class loading, codegen compiler, noop sink,
    # Python/Arrow worker pool — one-time process costs, not per-query work
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode("overwrite").save()

    # two timed rounds per query, keep the min: single-runs on this
    # host vary up to 2x run-to-run (see BENCH_HISTORY.md); the min is
    # the honest steady-state cost of the PLAN, which is what the
    # benchmark compares. Disclosed via runs/agg fields.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    probe_before = _cpu_probe()
    spark_probe = _spark_probe(spark)
    timings: dict[str, float] = {}
    t_wall0 = time.time()
    for name in BENCH_QUERIES:
        best = None
        for _ in range(runs_per_query):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    wall = round(time.time() - t_wall0, 3)
    total = round(sum(timings.values()), 3)
    probe_after = _cpu_probe()

    # the delta report is a nicety — it must never fail the bench
    # contract (BENCH_r03 recorded rc=1 from a null "parsed" block).
    # It prints BEFORE the JSON line: the driver captures stdout+stderr
    # merged and parses the LAST JSON-looking line, so the JSON must be
    # the final thing this process writes (BENCH_r04 lost its parsed
    # block to the table landing after the JSON in the merged stream).
    try:
        _report_deltas(timings, sf, spark_probe)
    except Exception as exc:  # pragma: no cover - defensive
        print(f"(delta report skipped: {exc})", file=sys.stderr)
    sys.stderr.flush()

    print(json.dumps({
        # sum of per-query min-of-N timings (NOT end-to-end wall time —
        # that is wall_sec_all_runs, which includes every repeat run)
        "metric": "headline_queries_sum_min",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs_per_query,
        "agg": "min",
        "wall_sec_all_runs": wall,
        # single-core SHA-256 calibration (min-of-3) sampled before and
        # after the query loop: divide cross-round totals by the probe
        # ratio to separate host phase noise from real plan movement
        "cpu_probe_sec": probe_before,
        "cpu_probe_sec_after": probe_after,
        # all-core Spark job (min-of-2): the parallel-phase probe —
        # divide cross-round totals by ITS ratio when the single-core
        # probe is flat but everything drifted together
        "spark_probe_sec": spark_probe,
    }), flush=True)


def _report_deltas(timings: dict[str, float], sf: float,
                   spark_probe: float | None = None) -> None:
    """Per-query delta vs the most recent recorded round (BENCH_r*.json)
    on stderr — the stdout contract stays ONE JSON line.

    PROBE-NORMALIZED adjudication (r8 verdict #2): raw deltas on this
    host carry a documented 1.5-2x phase noise where every 32-core
    query drifts together. Both calibration probes bracket it — the
    single-core SHA probe (allocation/turbo phase) and the all-core
    Spark probe (parallel contention phase, the one that matches the
    workload shape). Each query's time is DIVIDED by the parallel
    probe ratio before judging, and only normalized regressions are
    flagged; the raw delta is still printed alongside."""
    import glob
    import re

    runs = sorted(glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")),
                  key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if not runs:
        return
    try:
        with open(runs[-1]) as f:
            prev = json.load(f).get("parsed") or {}
    except (OSError, json.JSONDecodeError):
        return
    if prev.get("sf") != sf or not prev.get("queries"):
        return
    label = os.path.basename(runs[-1])
    # host-phase normalization: this run's probes over the recorded
    # run's probes. The parallel (Spark) probe is the divisor for
    # per-query judgments; the serial probe is printed for the cases
    # where the two diverge (pure-driver or single-partition queries).
    cpu_ratio = None
    if prev.get("cpu_probe_sec"):
        cpu_ratio = _cpu_probe(rounds=1) / prev["cpu_probe_sec"]
    par_ratio = None
    if spark_probe and prev.get("spark_probe_sec"):
        par_ratio = spark_probe / prev["spark_probe_sec"]
    norm = par_ratio if par_ratio else (cpu_ratio or 1.0)
    note = ""
    if cpu_ratio:
        note += f", serial probe ratio {cpu_ratio:.2f}x"
    if par_ratio:
        note += f", parallel probe ratio {par_ratio:.2f}x (normalizing by it)"
    print(f"-- delta vs {label} (sf={sf}{note}) --", file=sys.stderr)
    flagged = []
    for name, t in timings.items():
        p = prev["queries"].get(name)
        if p:
            pct = 100.0 * (t - p) / p
            tn = t / norm
            pct_n = 100.0 * (tn - p) / p
            flag = ""
            if pct_n > 25 and tn - p > 0.5:
                flag = "  <-- NORMALIZED regression"
                flagged.append(name)
            print(f"{name:28s} {p:7.2f}s -> {t:7.2f}s  raw {pct:+6.1f}%"
                  f"  norm {pct_n:+6.1f}%{flag}", file=sys.stderr)
        else:
            print(f"{name:28s}    new -> {t:7.2f}s", file=sys.stderr)
    if flagged:
        print(f"normalized regressions: {flagged}", file=sys.stderr)
    else:
        print("no normalized regressions", file=sys.stderr)


if __name__ == "__main__":
    main()
