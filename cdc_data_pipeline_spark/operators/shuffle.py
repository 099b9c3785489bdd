"""Deterministic global shuffle + sharding for training-data export.

Training runs consume a corpus as N shard files in a fixed random
order (sequence mixing across sources; reproducible data order for
resumable training). A naive ``ORDER BY rand()`` is wrong twice at
100 TB: ``rand()`` is partition-layout-dependent (a re-run or a
backfill re-deals every row), and a single global sort is an
all-to-all range shuffle whose only purpose is randomness.

This module gets the same statistical effect with ONE hash
partitioning and NO global sort:

- ``shard(row) = floor(u * n_shards)`` where ``u = uniform_hash(key)``
  — a pure function of the row key, so the assignment is identical
  across runs, cluster layouts, and engines (the md5-based
  ``uniform_hash`` has an exact DuckDB twin).
- within a shard, rows are ordered by ``(u, key)`` — hash order IS
  the shuffled order, and the sort is per-shard (bounded: corpus /
  n_shards rows), executed as ``repartition(shard)`` +
  ``sortWithinPartitions`` — never a global range exchange.

Reference parity: the reference engine has no training-export surface;
this extends SURVEY §2.9's north-star scope (corpus materialization)
alongside ``operators/packing.py``'s token-budget shard packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.hashing import uniform_hash


def deterministic_shuffle(df: DataFrame, key_col: str, n_shards: int,
                          seed: int = 0, fast: bool = False) -> DataFrame:
    """Adds ``shard_id`` (uniform in [0, n_shards)) and ``pos`` (the
    row's 0-based position inside its shard in shuffled order).

    ``key_col`` must be unique (a doc id). The (shard_id, pos) pair is
    a pure function of (key, seed, n_shards): re-runs, backfills and
    the SQL oracle all agree row-for-row. The ``pos`` ranking windows
    per shard — size shards via ``n_shards ~ corpus_rows / 4M`` so a
    single shard's sort stays comfortably inside one task.
    """
    u = uniform_hash(key_col, seed, fast=fast)
    with_shard = df.withColumn("__u", u).withColumn(
        "shard_id", F.floor(F.col("__u") * n_shards).cast("int"))
    w = Window.partitionBy("shard_id").orderBy(
        F.col("__u").asc(), F.col(key_col).asc())
    return (with_shard
            .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("__u"))


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, seed: int = 0,
                          fast: bool = False) -> None:
    """Materialize the shuffled corpus as ``shard_id=K`` parquet
    directories, one writer task per shard (``repartitionByRange`` on
    the shard id — contiguous ids map to distinct tasks, where a hash
    repartition would collide several shards into one task and leave
    others empty), rows stored in shuffled order so a trainer streams
    each shard file sequentially."""
    shuffled = deterministic_shuffle(df, key_col, n_shards, seed, fast=fast)
    (shuffled.repartitionByRange(n_shards, "shard_id")
             .sortWithinPartitions("shard_id", "pos")
             .write.mode("overwrite").partitionBy("shard_id").parquet(path))
