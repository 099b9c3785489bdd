"""Versioned-table publish protocol: atomicity, time travel, rollback,
vacuum safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.sources.versioned import (
    current_version,
    list_versions,
    publish_pointer,
    publish_version,
    read_versioned,
    vacuum_versions,
)


def _df(spark, n, tag):
    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def test_publish_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert publish_version(_df(spark, 3, "a"), t) == 1
    assert publish_version(_df(spark, 5, "b"), t) == 2
    assert current_version(t) == 2
    assert read_versioned(spark, t).count() == 5
    assert read_versioned(spark, t, version=1).count() == 3
    assert [r["tag"] for r in read_versioned(spark, t, 1).limit(1).collect()] == ["a"]


def test_rollback_via_pointer(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "a"), t)
    publish_version(_df(spark, 5, "b"), t)
    publish_pointer(t, 1)  # instant rollback, no data rewrite
    assert read_versioned(spark, t).count() == 3
    assert list_versions(t) == [1, 2]


def test_reader_never_sees_partial_publish(spark, tmp_path):
    """A version dir that exists but is not yet pointed at is invisible
    to default reads (the crash-mid-publish state)."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "a"), t)
    # simulate an in-flight publish: dir written, pointer NOT moved
    _df(spark, 9, "partial").write.parquet(os.path.join(t, "v=2"))
    assert current_version(t) == 1
    assert read_versioned(spark, t).count() == 3


def test_vacuum_keeps_published_and_newer(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        publish_version(_df(spark, i + 1, f"t{i}"), t)
    publish_pointer(t, 2)  # rolled back; v3/v4 newer than pointer
    removed = vacuum_versions(t, keep_last=1)
    # v1 dropped; v2 (published), v3, v4 (newer than pointer) kept
    assert removed == [1]
    assert list_versions(t) == [2, 3, 4]
    assert read_versioned(spark, t).count() == 2


def test_pointer_update_is_atomic_file_replace(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 2, "a"), t)
    # no temp pointer litter after publish
    assert not [f for f in os.listdir(t) if f.startswith("._LATEST")]
