"""Filesystem operations through the Hadoop FileSystem API, so every
path-taking sink works unchanged on ``file://``, ``hdfs://`` and
``s3a://`` roots — the object-store staging surface the reference
drives against MinIO (base_loader.py:107-165,261-273).

Bare local paths (no scheme) keep working: Hadoop's Path resolves them
against the default FS exactly as ``os.path`` would. Everything here
is driver-side metadata work (exists / rename / delete on directories
the atomic-swap sinks stage) — per-call cost is one FS RPC, the same
budget class as a pointer read.

s3a caveat (documented, inherent): object stores implement directory
rename as copy+delete, so the swap in ``_replace_dir`` is atomic only
on real filesystems; on s3a the same sequence is still correct
(fully-written before visible) but not instantaneous. Production
object-store deployments should prefer the versioned-pointer tables
(``sources/versioned.py``) whose publish is one small-file replace.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``'s scheme via the JVM gateway."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def path_join(base: str, *parts: str) -> str:
    """URI-safe join (os.path.join breaks scheme-qualified bases)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.exists(p)


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; no-op when absent."""
    fs, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory move. Hadoop rename returns False instead of raising
    on several failure shapes (missing parent, existing dst); surface
    those as errors — the atomic-swap protocol depends on knowing."""
    fs, jsrc = _fs(spark, src)
    _, jdst = _fs(spark, dst)
    if not fs.rename(jsrc, jdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ('' -> []). One listStatus RPC."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def glob_names(spark: SparkSession, path: str, pattern: str) -> list[str]:
    """Child names of ``path`` matching a glob ``pattern``. One
    globStatus RPC — server-side filtered on HDFS, a prefix LIST on
    object stores when the pattern starts with a literal prefix, so a
    seq-prefixed probe stays cheap however many siblings exist."""
    fs, p = _fs(spark, path_join(path, pattern))
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return [st.getPath().getName() for st in statuses]


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def mtime(spark: SparkSession, path: str) -> int | None:
    """Modification time (epoch millis) of ``path``; None when absent.
    One getFileStatus RPC — used to order racing writers' commits
    during feed reconciliation."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    return fs.getFileStatus(p).getModificationTime()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Small-file read (a pointer); None when absent. One JVM call for
    the whole payload (commons-io, bundled with Hadoop) — a per-byte
    ``stream.read()`` loop costs one py4j round-trip per byte, which
    turns a few-KB file into seconds of driver time."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Small-file overwrite write (a pointer). One create-overwrite
    call: a single atomic PUT on object stores (the pointer-table
    publish primitive there); on HDFS create+close is not atomic but
    the payload is a handful of bytes — local roots should prefer the
    ``os.replace`` path the caller already uses."""
    fs, p = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def publish_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomically publish a small pointer file: readers see either the
    old or the new complete content, never a torn write. Paths whose
    RESOLVED filesystem is local (bare paths under a local default FS,
    and explicit ``file://`` roots) go through tempfile +
    ``os.replace`` (POSIX-atomic); every other scheme uses
    ``write_text`` — one create-overwrite call, which is a single
    atomic PUT on S3-class stores and a few-byte window on HDFS (same
    contract as ``versioned.publish_pointer``). Resolution goes
    through the Hadoop FileSystem — a bare path when
    ``fs.defaultFS`` is remote must NOT land on the driver's local
    disk where no reader would ever find it."""
    fs, p = _fs(spark, path)
    if fs.getUri().getScheme() != "file":
        write_text(spark, path, text)
        return
    import os
    import tempfile

    local = fs.makeQualified(p).toUri().getPath()
    d = os.path.dirname(local) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".ptr_")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, local)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def put_file(spark: SparkSession, local_path: str, dst: str) -> None:
    """Upload one locally-staged file (copyFromLocal semantics),
    replacing any existing object."""
    jvm = spark._jvm
    fs, jdst = _fs(spark, dst)
    jsrc = jvm.org.apache.hadoop.fs.Path("file://" + local_path)
    fs.copyFromLocalFile(False, True, jsrc, jdst)
