"""Bloom-filter membership: exactness, FP bounds, map-only probe plan."""

import pytest
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import bloom as bl


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))


@pytest.fixture(scope="module")
def ref(spark):
    # every third key is "contaminated"
    return spark.range(0, 2000, 3).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))


def test_bloom_no_false_negatives(spark, ref):
    """Every inserted key must probe True — the defining guarantee."""
    m = bl.build_bloom(ref, "k")
    flagged = bl.might_contain(ref, m, "k")
    assert flagged.filter(~F.col("__maybe")).count() == 0


def test_bloom_fp_rate_within_bound(spark, ref):
    """Disjoint probes flag at ~the configured rate (3x slack for a
    2k-sample binomial)."""
    m = bl.build_bloom(ref, "k", fpp=0.01)
    probes = spark.range(100000, 102000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k"))
    fp = bl.might_contain(probes, m, "k").filter(F.col("__maybe")).count()
    assert fp / 2000 <= 0.03, f"FP rate {fp/2000} vs nominal {m.fp_rate}"


def test_bloom_semi_join_exact(spark, keys, ref):
    got = sorted(r.k for r in bl.bloom_semi_join(keys, ref, "k").collect())
    want = sorted(r.k for r in keys.join(ref, "k", "left_semi").collect())
    assert got == want


def test_bloom_anti_join_exact(spark, keys, ref):
    got = sorted(r.k for r in bl.bloom_anti_join(keys, ref, "k").collect())
    want = sorted(r.k for r in keys.join(ref, "k", "left_anti").collect())
    assert got == want


def test_bloom_probe_is_map_only(spark, keys, ref):
    """The prefilter stage must not shuffle the big side: no Exchange
    below the probe projection."""
    m = bl.build_bloom(ref, "k")
    flagged = bl.might_contain(keys, m, "k")
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_empty_reference(spark, keys):
    """An empty blocklist: anti join passes everything, semi join
    drops everything."""
    empty = keys.filter(F.lit(False))
    assert bl.bloom_anti_join(keys, empty, "k").count() == keys.count()
    assert bl.bloom_semi_join(keys, empty, "k").count() == 0


def test_bloom_build_collects_filter_not_keys(spark):
    """Scale headroom: the build's driver materialization is bounded
    by the FILTER size (ceil(m/64) packed words), never by the
    reference-key count. 50k keys squeezed into a deliberately tiny
    filter (high fpp) must collect orders of magnitude fewer rows
    than keys; duplicates must not change the artifact at all."""
    ref = spark.range(0, 50_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    m = bl.build_bloom(ref, "k", fpp=0.30)
    cap = (m.m + 63) // 64
    assert m.words_collected <= cap, "collected more rows than filter words"
    assert m.words_collected < 10_000 < 50_000, (
        f"driver saw {m.words_collected} rows for 50k keys — build is "
        f"collecting O(keys), not O(filter)")
    # duplicate keys re-set the same bits: same artifact, same bound
    dup = ref.union(ref).union(ref)
    m2 = bl.build_bloom(dup, "k", fpp=0.30, n_keys=50_000)
    assert m2.bits == m.bits and m2.words_collected == m.words_collected


def test_bloom_sketched_cardinality_skips_exact_count(spark, ref):
    """r3 verdict item #6: sizing from a KMV estimate must cost the
    build scan alone — supplying ``n_keys`` runs strictly fewer Spark
    jobs than the default exact ``distinct().count()`` path — and the
    resulting filter must keep the no-false-negative guarantee."""
    est = bl.kmv_n_keys(ref, "k")
    true_n = ref.select("k").distinct().count()
    assert 0.8 * true_n <= est <= 1.2 * true_n, (est, true_n)

    sc = spark.sparkContext
    sc.setJobGroup("bloom_exact", "default two-scan build")
    m_exact = bl.build_bloom(ref, "k")
    sc.setJobGroup("bloom_sketched", "one-scan build, sketched n")
    m_sk = bl.build_bloom(ref, "k", n_keys=est)
    sc.setJobGroup("bloom_done", "")
    tracker = sc.statusTracker()
    jobs_exact = len(tracker.getJobIdsForGroup("bloom_exact"))
    jobs_sk = len(tracker.getJobIdsForGroup("bloom_sketched"))
    assert jobs_sk < jobs_exact, (jobs_sk, jobs_exact)

    flagged = bl.might_contain(ref, m_sk, "k")
    assert flagged.filter(~F.col("__maybe")).count() == 0
    # sketch-sized filter lands near the exact-sized one
    assert 0.5 * m_exact.m <= m_sk.m <= 2.0 * m_exact.m
