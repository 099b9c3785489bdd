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
    "minhash_lsh_pairs",
    "jaccard_pairs",
    "simhash_pairs",
    "topk_cosine",
    "ann_lsh_topk",
    "text_stats",
    "winnow_fingerprints",
    "media_features",
]


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

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    print(json.dumps({
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
