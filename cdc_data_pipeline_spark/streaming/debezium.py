"""Debezium/Kafka CDC source seam: envelope parsing + change-row
normalization, feeding the same upsert/SCD2 sinks as every other
source.

The reference polls Postgres/Mongo with watermark queries
(postgres_loader.py:73-153, mongo_loader.py:132-229) — log-based CDC
via Debezium is the push-shaped equivalent. The Kafka connector jar is
not present in this sandbox, so `read_kafka_stream` gates on it at
runtime; everything downstream of the raw (key, value) frame is pure
DataFrame code and fully tested on synthetic envelopes.

Scale notes: parsing is `from_json` per row — native, no Python; one
shuffle only where the sink keys it (the upsert bucket). Tombstones
and deletes keep their keys from the Kafka KEY (the value is null or
`op='d'` with `before` only), so compaction semantics survive.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_value_schema(payload_schema: T.StructType) -> T.StructType:
    """The standard Debezium envelope around a row payload."""
    return T.StructType([
        T.StructField("before", payload_schema, True),
        T.StructField("after", payload_schema, True),
        T.StructField("op", T.StringType(), True),        # c/u/d/r
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("source", T.MapType(T.StringType(), T.StringType()), True),
    ])


def parse_debezium(raw: DataFrame, payload_schema: T.StructType,
                   value_col: str = "value") -> DataFrame:
    """Raw Kafka ``value`` bytes/strings -> normalized change rows:
    payload columns + ``_op`` ('insert'|'update'|'delete') +
    ``_change_ts``. Deletes surface the BEFORE image (that's where the
    key lives); snapshot reads ('r') normalize to inserts. Kafka
    tombstones (null value) are dropped — the preceding op='d' event
    carries the delete.

    When the raw frame carries Kafka source coordinates (``partition``
    / ``offset`` — the Kafka source always emits them), they pass
    through as ``_src_partition`` / ``_src_offset`` so downstream
    latest-wins collapses have a total order: Debezium's ``ts_ms`` is
    millisecond-granular, and two changes to one key in the same
    millisecond are common under load. Same-key events share a Kafka
    partition, so the offset is the log order.
    """
    env = debezium_value_schema(payload_schema)
    src_cols = []
    if "partition" in raw.columns and "offset" in raw.columns:
        src_cols = [F.col("partition").cast("int").alias("_src_partition"),
                    F.col("offset").cast("long").alias("_src_offset")]
    parsed = (raw
              .withColumn("__env", F.from_json(F.col(value_col).cast("string"), env))
              .filter(F.col("__env").isNotNull() & F.col("__env.op").isNotNull()))
    op = (F.when(F.col("__env.op").isin("c", "r"), F.lit("insert"))
          .when(F.col("__env.op") == "u", F.lit("update"))
          .when(F.col("__env.op") == "d", F.lit("delete")))
    image = F.when(F.col("__env.op") == "d",
                   F.col("__env.before")).otherwise(F.col("__env.after"))
    out = (parsed
           .withColumn("__img", image)
           .filter(F.col("__img").isNotNull())
           .withColumn("_op", op)
           .withColumn("_change_ts", F.timestamp_millis(F.col("__env.ts_ms"))))
    return out.select("__img.*", "_op", "_change_ts", *src_cols)


_SRC_TIEBREAKERS = ("_src_partition", "_src_offset")


def apply_changes(target: DataFrame | None, changes: DataFrame,
                  keys: Sequence[str], order_col: str = "_change_ts") -> DataFrame:
    """Collapse a change batch to latest-per-key and apply it:
    upserts minus deletes — the pure merge every sink reuses
    (micro-batch body for `foreachBatch`, or a batch catch-up run).

    Kafka (partition, offset) coordinates, when present, tiebreak
    same-``order_col`` changes (insert-then-delete inside one
    millisecond must resolve to the delete, not to whichever payload
    struct compares larger).
    """
    from cdc_data_pipeline_spark.operators.incremental import latest_per_key

    tb = [c for c in _SRC_TIEBREAKERS if c in changes.columns]
    latest = latest_per_key(changes, list(keys), order_col, tiebreakers=tb)
    upserts = latest.filter(F.col("_op") != "delete").drop("_op", order_col, *tb)
    if target is None:
        return upserts
    kept = (target.join(F.broadcast(latest.select(*keys).distinct()),
                        list(keys), "left_anti"))
    return kept.unionByName(upserts)


def read_kafka_stream(spark, bootstrap_servers: str, topic: str,
                      starting_offsets: str = "latest") -> DataFrame:
    """The live-Kafka seam (requires the spark-sql-kafka package on the
    classpath — not shipped in this sandbox; everything downstream is
    testable without it via synthetic (key, value) frames)."""
    try:
        return (spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("subscribe", topic)
                .option("startingOffsets", starting_offsets)
                .load())
    except Exception as e:  # pragma: no cover - jar absent in sandbox
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10 to spark.jars.packages"
        ) from e
