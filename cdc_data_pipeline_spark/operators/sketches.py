"""Mergeable distinct-count sketches (KMV / k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its register state is engine-internal: not portable, not exactly
reproducible in an oracle, and partials aren't first-class values you
can store in a rollup table. KMV (Bar-Yossef et al. 2002) is the
deterministic alternative: hash every value to uniform [0,1), keep the
k smallest distinct hashes; with U_k the k-th smallest,

    distinct-estimate = (k - 1) / U_k        (exact count when < k)

The sketch IS its value set, so it is:
- exactly reproducible cross-engine (md5-based hash → SQL oracle),
- mergeable (k smallest of a union = k smallest of per-part sketches),
- storable per (group, time-bucket) for continuous rollups (pairs with
  ``operators.rollup``: merge by array-union + re-min).

Scale: a naive per-group window over ALL distinct hashes shuffles the
full distinct set. ``kmv_partials`` bounds that: salt into S shards,
take the k smallest per (group, shard) — per-window state is the
shard's share — then ``kmv_merge`` re-ranks the <= S*k survivors per
group. The k global minima always survive their own shard's cut, so
the two-stage result is EXACTLY the one-stage result.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.hashing import uniform_hash

SKETCH_COL = "kmv"


def _distinct_hashes(df: DataFrame, group_cols: Sequence[str], value_col: str,
                     seed: int, fast: bool) -> DataFrame:
    u = uniform_hash(value_col, seed, fast=fast).alias("__u")
    return df.select(*group_cols, u).distinct()


def kmv_estimate(df: DataFrame, group_cols: Sequence[str], value_col: str,
                 k: int = 64, seed: int = 0, fast: bool = False) -> DataFrame:
    """Per-group distinct-count estimate: columns ``group_cols`` +
    ``n_kept`` (sketch occupancy) + ``distinct_est`` (double).

    Exact below k (estimate = occupancy); (k-1)/U_k at/above. The
    hash-distinct is one shuffle with map-side combine; the rank
    window rides the same partitioning.
    """
    pts = _distinct_hashes(df, group_cols, value_col, seed, fast)
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    kept = (pts.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") <= k))
    return (kept.groupBy(*group_cols)
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.max("__u").alias("__uk"))
                .select(*group_cols, "n_kept",
                        F.round(
                            F.when(F.col("n_kept") < k,
                                   F.col("n_kept").cast("double"))
                             .otherwise((F.lit(float(k - 1)) / F.col("__uk"))),
                            4).alias("distinct_est")))


def kmv_partials(df: DataFrame, group_cols: Sequence[str], value_col: str,
                 k: int = 64, shards: int = 16, seed: int = 0,
                 fast: bool = False) -> DataFrame:
    """Per-(group, shard) sketch arrays — the storable/mergeable form.

    Sharding bounds per-window state for hot groups: each rank window
    sees ~1/shards of the group's distinct hashes.
    """
    pts = _distinct_hashes(df, group_cols, value_col, seed, fast)
    sharded = pts.withColumn(
        "__shard", F.pmod(F.hash("__u"), F.lit(shards)))
    w = Window.partitionBy(*group_cols, "__shard").orderBy(F.col("__u").asc())
    kept = (sharded.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") <= k))
    return (kept.groupBy(*group_cols, "__shard")
                .agg(F.sort_array(F.collect_list("__u")).alias(SKETCH_COL)))


def histogram(df: DataFrame, value_col: str, lo: float, hi: float,
              nbins: int = 32, group_cols: Sequence[str] = ()) -> DataFrame:
    """Equi-width histogram over [lo, hi): ``bin`` (0..nbins-1, with
    out-of-range values clamped to the edge bins) + ``n``. Trivially
    mergeable (counts add) so per-batch histograms roll up like the
    monoid aggregates in ``operators.rollup``; one shuffle with
    map-side combine."""
    width = (hi - lo) / nbins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (df.filter(F.col(value_col).isNotNull())
              .groupBy(*group_cols, bin_.alias("bin"))
              .agg(F.count(F.lit(1)).alias("n")))


def kmv_merge(partials: DataFrame, group_cols: Sequence[str],
              k: int = 64) -> DataFrame:
    """Merge sketch partials (any grouping of the data) into the same
    ``n_kept``/``distinct_est`` as a one-shot ``kmv_estimate``."""
    exploded = partials.select(*group_cols,
                               F.explode(SKETCH_COL).alias("__u")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    kept = (exploded.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= k))
    return (kept.groupBy(*group_cols)
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.max("__u").alias("__uk"))
                .select(*group_cols, "n_kept",
                        F.round(
                            F.when(F.col("n_kept") < k,
                                   F.col("n_kept").cast("double"))
                             .otherwise((F.lit(float(k - 1)) / F.col("__uk"))),
                            4).alias("distinct_est")))
