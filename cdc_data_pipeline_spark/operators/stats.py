"""Feature statistics for training-data preparation: per-group
normalization and single-pass correlation.

Reference parity: the reference's dbt marts compute only sums/counts
(SURVEY §2.4 R10); normalization and correlation are the feature-prep
siblings a training pipeline needs on the same tables (SURVEY §7.6).

Scale design (100 TB):

- ``normalize_features``: one groupBy over the grouping key produces a
  tiny stats table (rows = groups), broadcast back onto the fact — the
  big side is never shuffled. Z-score and min-max come out of the same
  pass.
- ``correlation_matrix``: every pairwise Pearson correlation from ONE
  full scan — a single aggregate computes n, per-column sums/squares
  and all cross products (map-side combined); the k*(k-1)/2 pair rows
  are assembled from that one result row. No per-pair passes, no
  shuffle of the input beyond the aggregate's partials.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_features(df: DataFrame, value_cols: Sequence[str],
                       by: Sequence[str] = (), keep: Sequence[str] = (),
                       ndigits: int = 6) -> DataFrame:
    """Append ``<col>_z`` (z-score, sample stddev) and ``<col>_mm``
    (min-max) for each value column, statistics computed per ``by``
    group (or globally when empty). Constant columns yield NULL z / mm
    (0/0), mirroring SQL semantics."""
    by = list(by)
    aggs = []
    for c in value_cols:
        aggs += [F.avg(c).alias(f"__mu_{c}"), F.stddev_samp(c).alias(f"__sd_{c}"),
                 F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
    joined = df.join(F.broadcast(stats), by) if by else df.crossJoin(F.broadcast(stats))
    out_cols = [F.col(c) for c in (*keep, *by)]
    zero = F.lit(0.0)
    for c in value_cols:
        # nullif(denominator, 0): constant columns yield NULL under
        # ANSI mode instead of DIVIDE_BY_ZERO
        out_cols.append(F.round(
            (F.col(c) - F.col(f"__mu_{c}"))
            / F.nullif(F.col(f"__sd_{c}"), zero), ndigits).alias(f"{c}_z"))
        out_cols.append(F.round(
            (F.col(c) - F.col(f"__lo_{c}"))
            / F.nullif(F.col(f"__hi_{c}") - F.col(f"__lo_{c}"), zero),
            ndigits).alias(f"{c}_mm"))
    return joined.select(*out_cols)


def correlation_matrix(df: DataFrame, cols: Sequence[str],
                       ndigits: int = 6) -> DataFrame:
    """All pairwise Pearson correlations: ``(col_a, col_b, corr)`` for
    a < b in the given order, from one scan. The textbook moment
    formula (n*Sxy - Sx*Sy normalized) is used identically by the SQL
    oracle, so results match at ``ndigits`` exactly."""
    cols = list(cols)
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for c in cols:
        aggs += [F.sum(F.col(c)).alias(f"__s_{c}"),
                 F.sum(F.col(c) * F.col(c)).alias(f"__ss_{c}")]
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"__sx_{a}_{b}"))
    st = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = F.col("__n") * F.col(f"__sx_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
            den = (F.sqrt(F.col("__n") * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}"))
                   * F.sqrt(F.col("__n") * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")))
            pairs.append(F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                                  F.round(num / F.nullif(den, F.lit(0.0)),
                                          ndigits).alias("corr")))
    return (st.select(F.explode(F.array(*pairs)).alias("__p"))
            .select("__p.col_a", "__p.col_b", "__p.corr"))


def approx_percentiles(df: DataFrame, value_col: str,
                       by: Sequence[str] = (),
                       percentiles: Sequence[float] = (0.5, 0.95),
                       accuracy: int = 10_000) -> DataFrame:
    """Percentiles via Spark's Greenwald-Khanna sketch
    (``approx_percentile``): bounded-memory, map-side mergeable — the
    100 TB path. Exact ``percentile`` (the `order_value_percentiles`
    entry) buffers every group value in one aggregation buffer, which
    is fine at fixture scale and a memory wall at corpus scale; the
    sketch guarantees rank error <= 1/accuracy with O(accuracy) state
    per group whatever the group size.

    Output columns: ``p<percent>`` per requested fraction + ``n``.
    """
    pcts = ", ".join(str(float(p)) for p in percentiles)
    aggs = [
        F.expr(f"approx_percentile({value_col}, array({pcts}), {accuracy})").alias("__q"),
        F.count(F.lit(1)).alias("n"),
    ]
    grouped = df.groupBy(*list(by)) if by else df.groupBy()
    out = grouped.agg(*aggs)
    cols = [*by] + [
        F.col("__q")[i].alias(f"p{str(p).replace('0.', '').ljust(2, '0')}")
        for i, p in enumerate(percentiles)
    ] + [F.col("n")]
    return out.select(*cols)


def global_ntile(df: DataFrame, buckets: int, order_cols: Sequence[str],
                 out_col: str = "bucket",
                 num_partitions: int | None = None) -> DataFrame:
    """``NTILE(buckets) OVER (ORDER BY order_cols)`` without the
    single-partition window Spark executes for an unpartitioned
    ``Window.orderBy`` (WindowExec moves EVERY row into one task).

    Distributed formulation, one even data shuffle total:

    - ``repartitionByRange`` + ``sortWithinPartitions`` is Spark's
      distributed sort — partition i holds keys ordered before
      partition i+1's, each sorted locally;
    - a zero-shuffle ``mapInPandas`` assigns partition-local row
      numbers (running counter across the partition's Arrow batches);
    - per-partition row counts are one bounded collect (#partitions
      rows — the watermark-read budget class), turned into broadcast
      rank offsets;
    - the NTILE bucket is then a closed form of the global rank
      (the first ``N mod buckets`` buckets get ``ceil(N/buckets)``
      rows, matching SQL NTILE's front-loaded remainder exactly).

    ``order_cols`` must be a total order (add a key tiebreaker) for
    deterministic output.
    """
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = list(df.columns)
    ranked = (df.repartitionByRange(nparts, *order_cols)
              .sortWithinPartitions(*order_cols)
              .withColumn("__pid", F.spark_partition_id()))

    def _local_rn(batches):
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__rn"] = range(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    from pyspark.sql import types as T

    # fresh StructType: .schema returns the frame's CACHED StructType
    # and StructType.add would mutate it in place, desyncing the
    # Python-side schema from the JVM plan
    out_schema = T.StructType(
        list(ranked.schema.fields) + [T.StructField("__rn", T.LongType())])
    with_rn = ranked.mapInPandas(_local_rn, schema=out_schema)

    counts = {r["__pid"]: r["cnt"] for r in
              ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n_total = sum(counts.values())
    if n_total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    offsets, acc = {}, 0
    for pid in range(nparts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    off_map = F.create_map(
        *[F.lit(x) for pid in range(nparts) for x in (pid, offsets[pid])])

    q, r = divmod(n_total, buckets)
    rn = F.col("__rn") + off_map[F.col("__pid")]
    head = r * (q + 1)  # rows living in the ceil-sized leading buckets
    if q == 0:
        bucket = rn  # fewer rows than buckets: one row per bucket
    else:
        bucket = F.when(
            rn <= F.lit(head), F.floor((rn - 1) / F.lit(q + 1)) + 1
        ).otherwise(
            F.lit(r) + F.floor((rn - F.lit(head) - 1) / F.lit(q)) + 1)
    return with_rn.withColumn(out_col, bucket.cast("int")).drop("__pid", "__rn")
