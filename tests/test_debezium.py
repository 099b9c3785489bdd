"""Debezium envelope parsing + change application on synthetic Kafka
(key, value) frames — the full CDC path minus the absent connector jar."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_data_pipeline_spark.streaming.debezium import (
    apply_changes,
    parse_debezium,
)

PAYLOAD = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _env(op, before=None, after=None, ts=1700000000000):
    return json.dumps({"before": before, "after": after, "op": op, "ts_ms": ts})


def _raw(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_parse_debezium_ops_and_images(spark):
    raw = _raw(spark, [
        _env("c", after={"k": 1, "v": "a"}),
        _env("r", after={"k": 2, "v": "b"}),           # snapshot -> insert
        _env("u", before={"k": 1, "v": "a"}, after={"k": 1, "v": "a2"}, ts=1700000001000),
        _env("d", before={"k": 2, "v": "b"}, ts=1700000002000),
        None,                                           # tombstone -> dropped
        "not json",                                     # garbage -> dropped
    ])
    rows = {(r["k"], r["_op"]): r for r in parse_debezium(raw, PAYLOAD).collect()}
    assert (1, "insert") in rows and rows[(1, "insert")]["v"] == "a"
    assert (2, "insert") in rows
    assert rows[(1, "update")]["v"] == "a2"
    assert rows[(2, "delete")]["v"] == "b"              # before image kept
    assert len(rows) == 4
    assert rows[(2, "delete")]["_change_ts"] is not None


def test_apply_changes_latest_wins_and_deletes(spark):
    target = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, "gone")], "k long, v string")
    raw = _raw(spark, [
        _env("u", after={"k": 1, "v": "mid"}, ts=1700000001000),
        _env("u", after={"k": 1, "v": "new"}, ts=1700000002000),  # later wins
        _env("d", before={"k": 3, "v": "gone"}, ts=1700000001000),
        _env("c", after={"k": 4, "v": "ins"}, ts=1700000001000),
    ])
    changes = parse_debezium(raw, PAYLOAD)
    out = {r["k"]: r["v"] for r in apply_changes(target, changes, ["k"]).collect()}
    assert out == {1: "new", 2: "keep", 4: "ins"}      # 3 deleted


def test_apply_changes_delete_then_reinsert_same_batch(spark):
    raw = _raw(spark, [
        _env("d", before={"k": 7, "v": "x"}, ts=1700000001000),
        _env("c", after={"k": 7, "v": "back"}, ts=1700000002000),  # later
    ])
    changes = parse_debezium(raw, PAYLOAD)
    target = spark.createDataFrame([(7, "x")], "k long, v string")
    out = {r["k"]: r["v"] for r in apply_changes(target, changes, ["k"]).collect()}
    assert out == {7: "back"}


def test_apply_changes_streaming_foreachbatch(spark, tmp_path):
    """The parsed change stream drives a real foreachBatch merge into
    parquet across two micro-batches."""
    src = tmp_path / "dbz_src"
    src.mkdir()
    tgt = str(tmp_path / "dbz_tgt")

    b1 = [_env("c", after={"k": 1, "v": "a"}), _env("c", after={"k": 2, "v": "b"})]
    b2 = [_env("u", after={"k": 2, "v": "b2"}, ts=1700000005000),
          _env("d", before={"k": 1, "v": "a"}, ts=1700000005000)]
    _raw(spark, b1).write.parquet(str(src / "b1"))
    _raw(spark, b2).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema("value string")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    changes = parse_debezium(stream, PAYLOAD)

    def merge(batch_df, batch_id):
        import os
        cur = spark.read.parquet(tgt) if os.path.isdir(tgt) else None
        merged = apply_changes(cur, batch_df, ["k"])
        merged.persist().count()
        merged.write.mode("overwrite").parquet(tgt + ".staging")
        import shutil
        if os.path.isdir(tgt):
            shutil.rmtree(tgt)
        os.rename(tgt + ".staging", tgt)
        merged.unpersist()

    q = (changes.writeStream.foreachBatch(merge)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert out == {2: "b2"}
