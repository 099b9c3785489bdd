"""The mock remote Hadoop FileSystem itself, plus the code paths only
a non-"file" scheme can force: ``fsutil.publish_text``'s stream-write
branch and ``versioned.published_row_count``'s Spark-count fallback.
The per-index roundtrips under ``mockfs://`` live in the existing
scheme-parameterized suites (test_text_index / test_dedup_index /
test_versioned / test_fsutil)."""

from __future__ import annotations

import os

import pytest

from conftest import MOCKFS_CLASSPATH
from cdc_data_pipeline_spark.sources import fsutil

pytestmark = pytest.mark.skipif(MOCKFS_CLASSPATH is None,
                                reason="javac/hadoop jars unavailable")


def test_mockfs_resolves_as_remote_scheme(spark, tmp_path):
    """The registered FS must report a non-``file`` scheme (that is
    the whole point) while storing on local disk."""
    root = "mockfs://" + str(tmp_path / "probe")
    fs, p = fsutil._fs(spark, root)
    assert fs.getUri().getScheme() == "mockfs"
    fsutil.mkdirs(spark, root)
    assert (tmp_path / "probe").is_dir()  # backed by local disk


def test_publish_text_takes_stream_branch_on_mockfs(spark, tmp_path):
    """Under a remote-resolving scheme the pointer publish must go
    through the Hadoop create-overwrite write (single PUT on S3-class
    stores), NOT the local tempfile+os.replace path — and a reader
    through the same scheme sees the new content."""
    ptr = "mockfs://" + str(tmp_path / "idx" / "BASE")
    fsutil.publish_text(spark, ptr, "gen-a")
    assert fsutil.read_text(spark, ptr) == "gen-a"
    fsutil.publish_text(spark, ptr, "gen-b")
    assert fsutil.read_text(spark, ptr) == "gen-b"
    # no local-branch tempfile residue: the stream branch stages nothing
    assert [n for n in os.listdir(tmp_path / "idx")
            if n.startswith(".ptr_")] == []
    # the bytes really landed on the backing local disk
    with open(tmp_path / "idx" / "BASE", encoding="utf-8") as f:
        assert f.read() == "gen-b"


def test_spark_parquet_roundtrip_on_mockfs(spark, tmp_path):
    """Executor-side reads and writes (not just driver metadata) must
    resolve the scheme: write a table through Spark, list it through
    fsutil, read it back through Spark."""
    path = "mockfs://" + str(tmp_path / "t")
    spark.range(100).withColumnRenamed("id", "k") \
        .write.mode("overwrite").parquet(path)
    assert any(n.endswith(".parquet") or n.startswith("part-")
               for n in fsutil.list_names(spark, path))
    assert spark.read.parquet(path).count() == 100


def test_versioned_row_count_falls_back_to_spark_on_mockfs(
        spark, tmp_path):
    """``published_row_count`` has no pyarrow view of a non-file
    scheme; it must fall back to a Spark metadata count instead of
    raising (the pre-round-7 behavior)."""
    from cdc_data_pipeline_spark.sources import versioned as vt

    path = "mockfs://" + str(tmp_path / "vt")
    v = vt.publish_version(spark.range(57).withColumnRenamed("id", "k"),
                           path)
    assert vt.published_row_count(path, v) == 57
