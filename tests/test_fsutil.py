"""Direct tests for the pointer-publish primitive the versioned-table
and text-index protocols stand on: atomic replace, crash cleanup,
old-or-new reader visibility, and scheme-root resolution through the
Hadoop FileSystem."""

from __future__ import annotations

import os

import pytest

from cdc_data_pipeline_spark.sources import fsutil


def test_publish_then_read_roundtrip(spark, tmp_path):
    ptr = str(tmp_path / "idx" / "BASE")
    assert fsutil.read_text(spark, ptr) is None
    fsutil.publish_text(spark, ptr, "base-0000000000")
    assert fsutil.read_text(spark, ptr) == "base-0000000000"
    fsutil.publish_text(spark, ptr, "base-0000000001")
    assert fsutil.read_text(spark, ptr) == "base-0000000001"
    # no tempfile residue from successful publishes
    assert [n for n in os.listdir(tmp_path / "idx")
            if n.startswith(".ptr_")] == []


def test_publish_crash_leaves_old_pointer_and_no_residue(
        spark, tmp_path, monkeypatch):
    """A writer killed mid-publish (the replace itself fails) must
    leave the previous pointer content fully intact and clean up its
    staged tempfile — a torn or half-visible pointer is the one state
    the protocol cannot tolerate."""
    ptr = str(tmp_path / "BASE")
    fsutil.publish_text(spark, ptr, "old")

    real_replace = os.replace

    def boom(src, dst):
        raise OSError("simulated crash at replace")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="simulated crash"):
        fsutil.publish_text(spark, ptr, "new")
    monkeypatch.setattr(os, "replace", real_replace)

    assert fsutil.read_text(spark, ptr) == "old"
    assert [n for n in os.listdir(tmp_path)
            if n.startswith(".ptr_")] == []


def test_publish_under_file_scheme_resolves_same_file(spark, tmp_path):
    """An explicit ``file://`` root must land on the SAME local file a
    bare path names (the Hadoop FileSystem resolves both to the local
    FS), and keep the os.replace atomic path — not fall back to the
    non-atomic stream write."""
    bare = str(tmp_path / "BASE")
    fsutil.publish_text(spark, "file://" + bare, "via-scheme")
    assert fsutil.read_text(spark, bare) == "via-scheme"
    with open(bare, encoding="utf-8") as f:
        assert f.read() == "via-scheme"
    fsutil.publish_text(spark, bare, "via-bare")
    assert fsutil.read_text(spark, "file://" + bare) == "via-bare"


def test_publish_creates_missing_parents(spark, tmp_path):
    deep = str(tmp_path / "a" / "b" / "c" / "BASE")
    fsutil.publish_text(spark, deep, "x")
    assert fsutil.read_text(spark, deep) == "x"


def test_path_join_keeps_scheme_roots():
    assert fsutil.path_join("s3a://bucket/root/", "delta", "b1") == \
        "s3a://bucket/root/delta/b1"
    assert fsutil.path_join("/local/root", "BASE") == "/local/root/BASE"


def test_every_primitive_under_mock_remote_scheme(spark, tmp_path):
    """All eight fsutil primitives through a REMOTE-resolving scheme
    (mockfs:// — RawLocalFileSystem behind a non-file URI): the shapes
    the reference's MinIO staging implies (base_loader.py:107-165).
    file:// proves Hadoop-API routing; only a non-file scheme proves
    nothing quietly falls back to os/glob local-path logic."""
    from conftest import MOCKFS_CLASSPATH
    if MOCKFS_CLASSPATH is None:
        pytest.skip("javac/hadoop jars unavailable")
    root = "mockfs://" + str(tmp_path / "r")

    fsutil.mkdirs(spark, fsutil.path_join(root, "d1"))
    assert fsutil.exists(spark, fsutil.path_join(root, "d1"))
    fsutil.write_text(spark, fsutil.path_join(root, "d1", "f.txt"), "v1")
    assert fsutil.read_text(
        spark, fsutil.path_join(root, "d1", "f.txt")) == "v1"
    fsutil.publish_text(spark, fsutil.path_join(root, "d1", "PTR"), "p1")
    assert fsutil.read_text(
        spark, fsutil.path_join(root, "d1", "PTR")) == "p1"
    assert sorted(fsutil.list_names(
        spark, fsutil.path_join(root, "d1"))) == ["PTR", "f.txt"]
    fsutil.rename(spark, fsutil.path_join(root, "d1"),
                  fsutil.path_join(root, "d2"))
    assert not fsutil.exists(spark, fsutil.path_join(root, "d1"))
    assert fsutil.read_text(
        spark, fsutil.path_join(root, "d2", "f.txt")) == "v1"
    local = tmp_path / "up.txt"
    local.write_text("uploaded")
    fsutil.put_file(spark, str(local),
                    fsutil.path_join(root, "d2", "up.txt"))
    assert fsutil.read_text(
        spark, fsutil.path_join(root, "d2", "up.txt")) == "uploaded"
    fsutil.delete(spark, fsutil.path_join(root, "d2"))
    assert not fsutil.exists(spark, fsutil.path_join(root, "d2"))
    fsutil.delete(spark, fsutil.path_join(root, "d2"))  # absent: no-op
