#!/usr/bin/env python
"""Targeted 32x soak (VERDICT r12 #7): the two rewritten merge
classifiers and the two one-pass count/posting paths, at the deepest
scale the sandbox fits — without paying for the full scale_soak
matrix at 32x.

Axes:
- scd2_feed_age at the standard fixture, structural counters young vs
  old after +100 commits (the r12 one-pass classification changed
  exactly this path; r13 slimmed its explode and fused its probes).
- feed_age (fact-merge twin) — same counters for the r13 one-pass
  upsert classification.
- bm25_topk and backoff_lm_score at 1x vs 32x corpus (shifted-key
  replicas): wall ratio + structural counters, pinning the postings
  parallelism fix and the fused n-gram counts at depth.

    python tools/soak32.py [N]          # default 32

Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

import scale_soak as ss  # noqa: E402
from cdc_data_pipeline_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _backoff(docs):
    from cdc_data_pipeline_spark.operators.lm import backoff_score
    from cdc_data_pipeline_spark.sources.readers import ensure_parallelism

    return backoff_score(ensure_parallelism(docs))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("soak32")
    spark.range(1000).selectExpr("sum(id) s") \
        .write.format("noop").mode("overwrite").save()
    tmp = tempfile.mkdtemp(prefix="soak32_")
    out = {"metric": "soak32", "n": n}
    try:
        li_1 = ss.replicate(spark, "lineitem", 1, tmp + "/x1",
                            ["l_orderkey"])
        doc_1 = ss.replicate(spark, "documents", 1, tmp + "/x1",
                             ["doc_id"])
        doc_n = ss.replicate(spark, "documents", n, tmp + "/xN",
                             ["doc_id"])
        d1 = spark.read.parquet(doc_1)
        dn = spark.read.parquet(doc_n)

        for label, fn in (("bm25_topk", ss._bm25),
                          ("backoff_lm_score", _backoff)):
            t0 = time.time()
            _noop(fn(d1))
            x1 = round(time.time() - t0, 2)
            s1 = ss.structural(spark, lambda: _noop(fn(d1)),
                               f"{label}-x1")
            t0 = time.time()
            _noop(fn(dn))
            xn = round(time.time() - t0, 2)
            sn = ss.structural(spark, lambda: _noop(fn(dn)),
                               f"{label}-xN")
            out[label] = {"x1_sec": x1, "xN_sec": xn,
                          "ratio": round(xn / max(x1, 0.05), 2),
                          "x1_structure": s1, "xN_structure": sn}

        out["feed_age"] = ss.run_feed_age_suite(spark, li_1)
        out["scd2_feed_age"] = ss.run_scd2_feed_age_suite(spark, li_1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
