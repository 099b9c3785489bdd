"""Table maintenance: small-file compaction and Z-order clustering.

At 100 TB the dominant silent cost is LAYOUT, not compute: a CDC sink
that commits every micro-batch leaves thousands of KB-scale files
(each one a task + an open/close + a footer parse per query), and
row-groups whose min/max spans cover the whole key range skip nothing.
These operators are the maintenance pass a production table runs on a
schedule:

- ``table_stats`` / ``compact_parquet`` — measure file-size
  distribution; rewrite a directory into ~``target_bytes`` files
  (atomic staging swap, same write discipline as ``upsert_bucketed``).
- ``zorder_by`` — interleave the bits of rank-normalized columns into
  a Morton (Z-order) key and range-partition + sort by it, so each
  written file covers a small HYPER-RECTANGLE of the key space and
  parquet row-group min/max statistics prune multi-dimensional
  predicates. (A lexicographic sort only prunes its leading column.)

Scale: compaction reads once and writes ceil(bytes/target) files via
``repartition`` (AQE coalesces the shuffle); zorder's per-column rank
normalization is approxQuantile cut-points + map-side Bucketizer
binning — no global sort, no window, no single-partition stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.incremental import _replace_dir
from cdc_data_pipeline_spark.sources import fsutil


def table_stats(spark: SparkSession, path: str) -> dict:
    """File-count / size distribution of a parquet directory — the
    signal that schedules compaction (driver-side Hadoop-FS listing:
    metadata only, never data; works on file:// / hdfs:// / s3a://
    roots like every other sink)."""
    fs, jpath = fsutil._fs(spark, path)
    sizes = []
    if fs.exists(jpath):
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                sizes.append(st.getLen())
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "avg_bytes": 0,
                "min_bytes": 0, "max_bytes": 0}
    return {"n_files": len(sizes), "total_bytes": sum(sizes),
            "avg_bytes": sum(sizes) // len(sizes),
            "min_bytes": min(sizes), "max_bytes": max(sizes)}


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    partition_by: Sequence[str] | None = None) -> dict:
    """Rewrite ``path`` into ~``target_bytes`` parquet files.

    Reads the current layout, repartitions to ceil(total/target) and
    swaps atomically — readers see the old layout until the rename.
    Returns {before, after} stats. Partitioned tables pass
    ``partition_by`` to preserve the directory scheme (each partition
    compacts independently via the same write).
    """
    from cdc_data_pipeline_spark.operators.incremental import recover_swap

    recover_swap(spark, path)     # heal a crashed prior compact swap
    before = table_stats(spark, path)
    n_files = max(1, -(-before["total_bytes"] // target_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact__"
    fsutil.delete(spark, tmp)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _replace_dir(spark, path, tmp)
    return {"before": before, "after": table_stats(spark, path)}


def _interleave_bits(cols: Sequence, bits: int):
    """Morton-interleave ``bits``-wide integer columns into one long:
    output bit (i*len + j) takes bit i of column j. Pure bit
    arithmetic — codegen'd, no UDF."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 12) -> DataFrame:
    """Adds ``__z``: the Morton interleave of each column's quantile
    rank (rank-normalization makes the curve distribution-agnostic —
    skewed or categorical columns map onto a uniform 2^bits grid).

    Ranks come from ``approxQuantile`` cut-points (one aggregation
    pass; the driver holds only 2^bits scalars per column) binned
    JVM-side by ``Bucketizer`` (binary search per row). The whole key
    computation is map-only — no shuffle, no window, no
    single-partition global sort — so it parallelizes perfectly at
    any scale. Null key values rank lowest, matching a NULLS FIRST
    ordering.
    """
    from pyspark.ml.feature import Bucketizer

    n_tiles = 1 << bits
    probs = [i / n_tiles for i in range(1, n_tiles)]
    rel_err = 1.0 / (4 * n_tiles)

    dcols = [f"__d_{c}" for c in cols]
    out = df
    for c, dc in zip(cols, dcols):
        out = out.withColumn(dc, F.col(c).cast("double"))

    quantiles = out.approxQuantile(dcols, probs, rel_err)
    splits_arr = []
    for qs in quantiles:
        # Bucketizer needs strictly increasing splits; duplicates mean
        # a value spans multiple tiles — collapse them (fewer, wider
        # buckets for heavy hitters is the correct rank behavior).
        uniq = sorted(set(qs))
        splits_arr.append([float("-inf"), *uniq, float("inf")])

    rcols = [f"__r_{c}" for c in cols]
    bucketizer = Bucketizer(
        inputCols=dcols, outputCols=rcols,
        splitsArray=splits_arr, handleInvalid="keep")
    out = bucketizer.transform(out)
    # handleInvalid=keep sends nulls to the extra top bucket — remap to
    # rank 0 (NULLS FIRST) and clamp everything into [0, 2^bits).
    ranked = []
    for c, rc, splits in zip(cols, rcols, splits_arr):
        n_real = len(splits) - 1
        r = F.when(F.col(c).isNull(), F.lit(0)).otherwise(
            F.least(F.col(rc).cast("long"), F.lit(n_tiles - 1)))
        # stretch collapsed bucket ranges back onto the 2^bits grid so
        # each column still spends its full bit budget
        if n_real < n_tiles:
            r = F.floor(r * ((n_tiles - 1) / max(n_real - 1, 1))).cast("long")
        ranked.append(r)
    out = out.withColumn("__z", _interleave_bits(ranked, bits))
    return out.drop(*dcols, *rcols)


def zorder_write(df: DataFrame, path: str, cols: Sequence[str],
                 n_files: int, bits: int = 12) -> None:
    """Write ``df`` as ``n_files`` Z-order-clustered parquet files:
    range-partition on the Morton key, sort within partitions, drop
    the key. Each file then covers a compact hyper-rectangle of
    ``cols`` space, so min/max row-group stats prune predicates on ANY
    of the clustered columns, not just a lexicographic prefix."""
    keyed = zorder_key(df, cols, bits)
    (keyed.repartitionByRange(n_files, "__z")
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode("overwrite").parquet(path))


def file_span_stats(df_with_file: DataFrame, col: str) -> DataFrame:
    """Per-file (min,max) span of ``col`` relative to its global span —
    the data-skipping quality metric (lower mean span = more pruning).
    Input must carry ``__file`` (e.g. ``F.input_file_name()``)."""
    g = df_with_file.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    width = (g["hi"] - g["lo"]) or 1
    return (df_with_file.groupBy("__file")
            .agg(((F.max(col) - F.min(col)) / F.lit(float(width)))
                 .alias("span_frac")))
