"""Versioned parquet tables: atomic publish + time travel on a plain
filesystem — the storage guarantee the reference gets from ClickHouse
atomic `ALTER TABLE` parts (base_loader.py:241-249 delete+insert) and
modern lakehouses get from Delta/Iceberg logs, rebuilt from two
primitives only: immutable version directories and an atomically
replaced pointer file.

Layout:

    <table>/v=1/part-*.parquet      (immutable once published)
    <table>/v=2/part-*.parquet
    <table>/_LATEST                 (text file: "2")

Publish protocol: write the new version dir fully (it is invisible to
readers — nothing references it), then `os.replace` the pointer.
Readers resolve the pointer first, then read ONLY that directory —
they see the old or the new version in full, never a mix, with zero
reader downtime and no lock. A crash mid-publish leaves an orphan
directory that the next `vacuum` removes; the pointer never references
partial data.

At 100 TB: the pointer swap is O(1) metadata whatever the table size;
on an object store, map `os.replace` to the store's atomic
put/rename. Old versions double as time travel and as instant
rollback (`publish_pointer(path, n-1)`).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VDIR = re.compile(r"^v=(\d+)$")


def list_versions(table_path: str) -> list[int]:
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(table_path: str) -> int | None:
    try:
        with open(os.path.join(table_path, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def publish_pointer(table_path: str, version: int) -> None:
    """Atomically repoint ``_LATEST`` (also the rollback primitive)."""
    if version not in list_versions(table_path):
        raise ValueError(f"version {version} does not exist at {table_path}")
    tmp = os.path.join(table_path, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table_path, _POINTER))


def publish_version(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the next version and atomically publish it.
    Returns the new version number."""
    os.makedirs(table_path, exist_ok=True)
    versions = list_versions(table_path)
    new_v = (versions[-1] if versions else 0) + 1
    vdir = os.path.join(table_path, f"v={new_v}")
    df.write.mode("error").parquet(vdir)
    publish_pointer(table_path, new_v)
    return new_v


def read_versioned(spark: SparkSession, table_path: str,
                   version: int | None = None) -> DataFrame:
    """Read the published version (default) or a pinned one."""
    v = version if version is not None else current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no published version at {table_path}")
    vdir = os.path.join(table_path, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} missing at {table_path}")
    return spark.read.parquet(vdir)


def vacuum_versions(table_path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions — never the
    published one, and never versions NEWER than the pointer (an
    in-flight publish's directory is not ours to delete). Returns the
    versions removed."""
    cur = current_version(table_path)
    versions = list_versions(table_path)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if cur is not None:
        keep.add(cur)
        keep.update(v for v in versions if v > cur)
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(table_path, f"v={v}"))
            removed.append(v)
    return removed
