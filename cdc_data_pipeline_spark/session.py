"""SparkSession construction tuned for this engine.

Local mode is the test bed (``local[$SPARK_GRAFT_CPUS]``), but every
config here is chosen to also make sense on a multi-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing),
shuffle partitions sized to parallelism, Arrow for the Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdc_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally provided session.

    The driver hands us its own SparkSession; session timezone MUST be
    UTC so collected timestamps line up with DuckDB's naive timestamps
    (parquet stores UTC-normalized instants).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # A vanilla session defaults to 200 shuffle partitions — size to the
    # actual parallelism (AQE still coalesces below this at runtime).
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(spark.sparkContext.defaultParallelism))
    # bucketed/snapshot upserts rewrite only the partitions they touch
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in read_table (lossless — the
    # fixture's nanos are whole microseconds)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
