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
directory ABOVE the pointer: invisible to readers, inventoried by
``fsck_versioned`` and reclaimable with
``vacuum_versions(sweep_unpublished=True)`` once the operator
confirms no concurrent publisher is mid-flight (the default vacuum
deliberately never touches dirs newer than the pointer — they are
indistinguishable from a competitor's in-flight publish). The pointer
never references partial data, and a crashed step REPLAYED (the same
at-least-once redelivery contract the bucketed tables honor)
converges to the same pointer-resolved content; version NUMBERS are
append-only audit, not part of the consumer contract — a replayed
publish mints a new version exactly like a dbt re-run mints a new
run (``tests/test_crash_versioned.py`` sweeps every FS mutation).

At 100 TB: the pointer swap is O(1) metadata whatever the table size;
on an object store, the pointer publish is one small-object PUT
(atomic on S3-class stores). Old versions double as time travel and
as instant rollback (`publish_pointer(path, n-1)`).

Path handling: bare local paths go through ``os`` (``os.replace``
pointer swap — atomic); scheme-qualified roots (``file://``,
``s3a://``, ``hdfs://``) route every metadata op through the Hadoop
FileSystem API (``sources/fsutil.py``) using the active SparkSession
— the same dual-path discipline as the bucketed sinks (r3 commit
141b974), now covering the versioned-table layer too.

Commit-protocol contract, per scheme (what "atomic publish" means):

- bare local / ``file://``: pointer lands via tempfile + os.replace —
  POSIX rename atomicity; readers see the old or new integer, never a
  torn file. Version directories appear fully before the pointer.
- ``s3a://`` (S3-class object stores): the pointer publish is ONE
  small-object PUT — atomic and read-after-write-consistent on S3;
  the version "directory" is a key prefix whose objects are all
  written before the PUT, so a reader resolving the pointer never
  lists a partial version.
- ``hdfs://``: create-overwrite of a few-byte file — not a rename,
  so there is a sub-millisecond window in which a reader can observe
  a zero-length pointer; ``current_version`` treats unparseable
  content as "no pointer" and readers should retry. Deployments
  needing strict HDFS atomicity can point ``fsutil.publish_text`` at
  a rename-based variant; the protocol above needs nothing else
  changed.
- All schemes: version directories are IMMUTABLE once the pointer
  names them; vacuum never deletes the published version or anything
  newer than it, so a crashed in-flight publish leaves only an
  orphan directory (invisible — nothing references it).

Concurrency contract (single-writer): the publish protocol assumes
ONE writer per table — concurrent publishers can elect the same next
version id, in which case the SECOND writer fails loudly before its
pointer ever moves (no lock/CAS, matching the pipeline-owned-table
model; the reference's ClickHouse accepts concurrent clients, this
layer deliberately does not arbitrate them). On bare local paths the
failure point is an ATOMIC ``os.mkdir`` claim of the version
directory — two same-id writers can never interleave bytes; on URI
roots it is Spark's ``mode=error`` existence check, which leaves a
same-instant window on stores without atomic-exclusive directory
creation (S3) — the single-writer contract covers that residue.
Publishers that lose the election re-run and mint the next free id.
Crash healing (``publish_version(heal_crashed=True)``, which deletes
torn dirs above the pointer to reuse their ids) is OPT-IN for exactly
this reason: from the filesystem a crashed publish's torn dir and a
live competitor's half-written dir are indistinguishable, so only a
caller that KNOWS it is the single writer (the ``materialize`` dbt
build, a Structured Streaming sink with its one-active-query
checkpoint guarantee) may sweep them — the same declaration
``vacuum_versions(sweep_unpublished=True)`` requires. Readers are
always safe — they only ever see fully-published versions.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VDIR = re.compile(r"^v=(\d+)$")


# ---- protocol FS-mutation seams (bare-local paths). Every mutation
# the publish protocol performs routes through one of these, so the
# crash-point fault-injection sweep (tests/test_crash_versioned.py)
# can arm a kill at EVERY mutation — the same proof discipline the
# bucketed-table and LSM protocols got in round 9. URI roots take the
# fsutil seams, which the sweep already intercepts.

def _replace_file(src: str, dst: str) -> None:
    """Atomic local publish primitive (pointer + run-record commits)."""
    os.replace(src, dst)


def _write_data(df: DataFrame, path: str) -> None:
    """The version-directory data write. An existing dir (a racing
    publisher's, or our own crashed attempt) is NEVER overwritten.

    Bare local paths CLAIM the directory first with ``os.mkdir`` —
    atomic-exclusive on POSIX — so two publishers electing the same id
    cannot both pass an existence check in the same instant: the loser
    fails HERE, before any bytes land, and the winner appends into the
    empty dir it owns. URI roots keep Spark's ``mode=error`` existence
    check (atomic-exclusive directory creation does not exist on
    S3-class stores; the single-writer contract covers the residual
    same-instant window there). A crash between the claim and the
    write leaves an empty marker-less dir — ordinary torn-publish
    debris (fsck warns, vacuum/heal reclaim)."""
    if _is_uri(path):
        df.write.mode("error").parquet(path)
        return
    os.mkdir(path)            # atomic claim; FileExistsError = loser
    df.write.mode("append").parquet(path)


def _is_uri(path: str) -> bool:
    return "://" in path


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "scheme-qualified table paths need an active SparkSession "
            "(Hadoop FileSystem access rides the JVM gateway)")
    return spark


def list_versions(table_path: str) -> list[int]:
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        names = fsutil.list_names(_active_spark(), table_path)
    elif not os.path.isdir(table_path):
        return []
    else:
        names = os.listdir(table_path)
    out = []
    for name in names:
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(table_path: str) -> int | None:
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        text = fsutil.read_text(
            _active_spark(), fsutil.path_join(table_path, _POINTER))
        try:
            return int(text.strip()) if text is not None else None
        except ValueError:
            return None
    try:
        with open(os.path.join(table_path, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def publish_pointer(table_path: str, version: int) -> None:
    """Atomically repoint ``_LATEST`` (also the rollback primitive).
    Bare local roots swap with ``os.replace``; scheme roots go through
    ``fsutil.publish_text``, which re-resolves to the same os.replace
    when the scheme lands on a local FS (``file://``) and otherwise
    publishes the pointer as ONE small-object overwrite write (a
    single atomic PUT on S3-class stores)."""
    if version not in list_versions(table_path):
        raise ValueError(f"version {version} does not exist at {table_path}")
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        fsutil.publish_text(_active_spark(),
                            fsutil.path_join(table_path, _POINTER),
                            str(version))
        return
    tmp = os.path.join(table_path, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    _replace_file(tmp, os.path.join(table_path, _POINTER))


def _vdir(table_path: str, version: int) -> str:
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        return fsutil.path_join(table_path, f"v={version}")
    return os.path.join(table_path, f"v={version}")


def _is_complete(table_path: str, version: int) -> bool:
    """A version dir is complete when the writer's ``_SUCCESS`` commit
    marker landed (Spark's output committer writes it last, on every
    FS). A dir without it is a torn write — a crashed publish."""
    marker = (f"{_vdir(table_path, version)}/_SUCCESS" if
              _is_uri(table_path) else
              os.path.join(table_path, f"v={version}", "_SUCCESS"))
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        return fsutil.exists(_active_spark(), marker)
    return os.path.exists(marker)


def publish_version(df: DataFrame, table_path: str,
                    heal_crashed: bool = False) -> int:
    """Write ``df`` as the next version and atomically publish it.
    Returns the new version number. By default SAFE BESIDE A RACING
    publisher (see module docstring): the id is minted PAST any
    existing directory — complete or torn — and a true same-id
    collision fails loudly on ``mode=error`` before the pointer moves;
    nothing another writer may own is ever deleted.

    ``heal_crashed=True`` is the single-writer replay mode (the same
    declaration ``vacuum_versions(sweep_unpublished=True)`` requires):
    INCOMPLETE dirs above the pointer — no ``_SUCCESS`` marker, i.e. a
    previous publish of OURS crashed mid-data-write — are swept before
    the version id is chosen, so the replayed publish reclaims the
    same id instead of stranding torn bytes in the time-travel
    history. Only callers that KNOW no concurrent publisher exists may
    pass it (``materialize``'s dbt build and the Structured Streaming
    versioned sink do — each holds a one-writer guarantee of its own);
    a second publisher mid-data-write would otherwise lose its
    directory to the sweep and both could then write the same id.
    COMPLETE dirs above the pointer are never touched in either mode
    (a racing competitor's finished-but-unpointed publish or a
    rolled-back fork); the id skips past them. Torn dirs left behind
    by the default mode are inventoried by ``fsck_versioned`` and
    reclaimed by ``vacuum_versions(sweep_unpublished=True)``."""
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        fsutil.mkdirs(_active_spark(), table_path)
    else:
        os.makedirs(table_path, exist_ok=True)
    if heal_crashed:
        cur = current_version(table_path)
        for v in list_versions(table_path):
            if ((cur is None or v > cur)
                    and not _is_complete(table_path, v)):
                if _is_uri(table_path):
                    from cdc_data_pipeline_spark.sources import fsutil

                    fsutil.delete(_active_spark(), _vdir(table_path, v))
                else:
                    shutil.rmtree(os.path.join(table_path, f"v={v}"))
    versions = list_versions(table_path)
    new_v = (versions[-1] if versions else 0) + 1
    _write_data(df, _vdir(table_path, new_v))
    publish_pointer(table_path, new_v)
    return new_v


def read_versioned(spark: SparkSession, table_path: str,
                   version: int | None = None) -> DataFrame:
    """Read the published version (default) or a pinned one."""
    v = version if version is not None else current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no published version at {table_path}")
    vdir = _vdir(table_path, v)
    if _is_uri(table_path):
        from cdc_data_pipeline_spark.sources import fsutil

        present = fsutil.exists(spark, vdir)
    else:
        present = os.path.isdir(vdir)
    if not present:
        raise FileNotFoundError(f"version {v} missing at {table_path}")
    return spark.read.parquet(vdir)


def vacuum_versions(table_path: str, keep_last: int = 2,
                    sweep_unpublished: bool = False) -> list[int]:
    """Drop all but the newest ``keep_last`` versions — never the
    published one, and by default never versions NEWER than the
    pointer (an in-flight publish's directory is not ours to delete:
    a crashed publish's orphan and a racing competitor's half-written
    version look identical from the filesystem). Deletions are
    idempotent garbage collection — a crash mid-vacuum re-runs
    harmlessly. Returns the versions removed.

    ``sweep_unpublished=True`` is the single-writer reclaim: when the
    operator KNOWS no concurrent publisher exists (the pipeline-owned
    table model), dirs above the pointer are crashed-publish debris or
    a rolled-back dead fork and are deleted too, as are INCOMPLETE
    (no ``_SUCCESS``) dirs below the pointer (a torn write the id
    minting skipped past — never published, nothing references it)
    and any stale pointer tmp file (``._LATEST.tmp``, a crash between
    the tmp write and its atomic replace). ``fsck_versioned``
    inventories all of these as warnings either way. The default mode
    touches NONE of them — from the filesystem each is
    indistinguishable from a live competitor's in-flight state (a
    half-written version dir, or a pointer publish between its tmp
    write and ``os.replace``), and vacuum must stay safe beside a
    live publisher."""
    cur = current_version(table_path)
    versions = list_versions(table_path)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if cur is not None:
        keep.add(cur)
        if not sweep_unpublished:
            keep.update(v for v in versions if v > cur)
        else:
            keep.difference_update(v for v in versions if v > cur)
            keep.difference_update(
                v for v in versions
                if v != cur and not _is_complete(table_path, v))
    elif sweep_unpublished:
        # no (readable) pointer: NOTHING is published, so under the
        # caller's single-writer declaration every incomplete dir is
        # crashed-publish debris — reclaim it (ADVICE r11: the
        # cur-is-None table previously never shed its torn dirs);
        # complete-but-unpointed dirs still honor keep_last
        keep.difference_update(
            v for v in versions if not _is_complete(table_path, v))
    removed = []
    for v in versions:
        if v not in keep:
            if _is_uri(table_path):
                from cdc_data_pipeline_spark.sources import fsutil

                fsutil.delete(_active_spark(), _vdir(table_path, v))
            else:
                shutil.rmtree(os.path.join(table_path, f"v={v}"))
            removed.append(v)
    if sweep_unpublished:
        # only under the declared single-writer mode: a concurrent
        # publish_pointer between its tmp write and os.replace would
        # otherwise crash on the vanished tmp file (ADVICE r10)
        tmp_ptr = f".{_POINTER}.tmp"
        if _is_uri(table_path):
            from cdc_data_pipeline_spark.sources import fsutil

            fsutil.delete(_active_spark(),
                          fsutil.path_join(table_path, tmp_ptr))
        else:
            try:
                os.remove(os.path.join(table_path, tmp_ptr))
            except FileNotFoundError:
                pass
    return removed


def fsck_versioned(spark: SparkSession | None, table_path: str,
                   deep: bool = False) -> dict:
    """READ-ONLY invariant audit of a versioned pointer table — the
    third member of the auditor family (``fsck_table`` for bucketed
    CDC tables, ``fsck_index`` for the LSM index families). Only
    REPORTS, never mutates, so it is always safe beside a live
    publisher; any malformed on-disk state (torn pointer, foreign
    entries) becomes a finding, never an exception out of the auditor.

    Structural checks (metadata listings, no data scan): the pointer
    parses and names an existing version dir; version dir names parse;
    unpublished dirs above the pointer are inventoried (crashed
    publish / rolled-back fork — reclaim with
    ``vacuum_versions(sweep_unpublished=True)``); stale pointer tmp
    files; foreign entries in the table root; versions present with
    NO pointer at all (readers cannot resolve anything).

    ``deep=True`` additionally opens every surviving version's parquet
    footers (local roots; a Spark read probe on URI roots): a
    PUBLISHED version that fails to read is an error — the protocol's
    core promise ("the pointer never references partial data") would
    be broken; an unreadable UNPUBLISHED dir is only a warning (it is
    exactly what a crashed in-flight publish leaves, and nothing
    references it).

    Returns the same report shape as the sibling auditors:
    ``{"ok", "errors", "warnings", "deep", "findings": [...]}``."""
    findings: list[dict] = []

    def add(severity: str, check: str, detail: str) -> None:
        findings.append({"severity": severity, "check": check,
                         "detail": detail})

    def report() -> dict:
        errors = sum(1 for f in findings if f["severity"] == "error")
        warnings = sum(1 for f in findings if f["severity"] == "warn")
        return {"path": table_path, "ok": errors == 0,
                "errors": errors, "warnings": warnings, "deep": deep,
                "findings": findings}

    uri = _is_uri(table_path)
    if uri:
        from cdc_data_pipeline_spark.sources import fsutil

        spark = spark or _active_spark()
        if not fsutil.exists(spark, table_path):
            add("error", "table_missing", "path does not exist")
            return report()
        names = fsutil.list_names(spark, table_path)
    else:
        if not os.path.isdir(table_path):
            add("error", "table_missing", "path does not exist")
            return report()
        names = os.listdir(table_path)

    versions: list[int] = []
    for name in names:
        m = _VDIR.match(name)
        if m:
            versions.append(int(m.group(1)))
        elif name == _POINTER or name == _RUNS_DIR:
            pass
        elif name == f".{_POINTER}.tmp":
            add("warn", "pointer_staging",
                "stale pointer tmp file — crash between the tmp write "
                "and its atomic replace (or a publish is in flight "
                "RIGHT NOW); the next publish overwrites it, "
                "vacuum_versions(sweep_unpublished=True) removes it")
        elif name.startswith("v="):
            add("error", "version_dir",
                f"unparseable version dir {name!r} — out-of-band write")
        elif not name.startswith("."):
            add("warn", "foreign_entry",
                f"unexpected entry {name!r} inside the table root")
    versions.sort()

    # --- pointer
    cur = None
    try:
        cur = current_version(table_path)
    except Exception as exc:   # current_version already tolerates most
        add("error", "pointer_corrupt",
            f"_LATEST unreadable ({type(exc).__name__}: {exc})")
    ptr_exists = _POINTER in names
    if ptr_exists and cur is None and not any(
            f["check"] == "pointer_corrupt" for f in findings):
        add("error", "pointer_corrupt",
            "_LATEST present but does not parse as an integer — torn "
            "write (HDFS create-overwrite window) or out-of-band edit; "
            "repair with publish_pointer(path, newest_good_version)")
    if cur is None:
        if versions:
            add("error", "no_pointer",
                f"{len(versions)} version dir(s) exist but no readable "
                "_LATEST — readers cannot resolve any version; "
                "publish_pointer() to the newest verified-complete "
                "version repairs")
        else:
            add("info", "empty", "no versions and no pointer — an "
                "empty (or never-published) table")
    else:
        if cur not in versions:
            add("error", "pointer_dangling",
                f"_LATEST names v={cur} but that directory is missing "
                "— out-of-band deletion of the published version; "
                "rollback (publish_pointer) to a surviving version")
        above = [v for v in versions if v > cur]
        if above:
            add("warn", "unpublished_versions",
                f"version dir(s) {above} above the pointer (v={cur}) — "
                "crashed publish debris or a rolled-back fork; "
                "invisible to readers; "
                "vacuum_versions(sweep_unpublished=True) reclaims "
                "under the single-writer contract")
        if cur in versions and not _is_complete(table_path, cur):
            add("error", "pointer_uncommitted",
                f"_LATEST names v={cur} but that directory has no "
                "_SUCCESS commit marker — the pointer references an "
                "uncommitted write (protocol bypassed); rollback "
                "(publish_pointer) to a complete version")
        torn_below = [v for v in versions
                      if v < cur and not _is_complete(table_path, v)]
        if torn_below:
            add("warn", "incomplete_version",
                f"version dir(s) {torn_below} below the pointer lack "
                "their _SUCCESS marker — torn writes the id minting "
                "skipped past; never published, invisible to the "
                "pointer; vacuum_versions(sweep_unpublished=True) "
                "reclaims under the single-writer contract")

    # --- deep: every surviving version must be complete/readable.
    # "Published" = the pointer names it now, or it sits below the
    # pointer WITH its _SUCCESS commit marker (the pointer only ever
    # moves after a completed data write, so a marker-less dir was
    # never pointer-visible wherever it sits — default-mode publishes
    # mint PAST torn dirs, leaving them below the new pointer).
    if deep and versions:
        for v in versions:
            vdir = _vdir(table_path, v)
            published = cur is not None and (
                v == cur or (v < cur and _is_complete(table_path, v)))
            try:
                if uri:
                    # a bare count() is satisfied from footers
                    spark.read.parquet(vdir).count()
                else:
                    if not os.path.exists(
                            os.path.join(vdir, "_SUCCESS")):
                        raise ValueError(
                            "missing _SUCCESS commit marker — "
                            "uncommitted/partial write")
                    published_row_count(table_path, v)   # footer probe
            except Exception as exc:
                if published:
                    add("error", "version_unreadable",
                        f"published v={v} fails to read "
                        f"({type(exc).__name__}: {exc}) — the pointer "
                        "references partial data; the publish protocol "
                        "was bypassed or the store lost objects")
                else:
                    add("warn", "orphan_incomplete",
                        f"unpublished v={v} fails to read — consistent "
                        "with a crashed in-flight publish; reclaimable")
    return report()


# ------------------------------------------------- run-level manifest

_RUNS_DIR = "_runs"


def published_row_count(table_path: str, version: int) -> int:
    """Exact row count of a published version from parquet footers —
    no Spark job, no data scan (reference parity: the rows_loaded
    metadata Dagster assets attach to every run,
    dagster_code/assets/extract_assets.py:148-159)."""
    import glob as _glob

    import pyarrow.parquet as pq

    if _is_uri(table_path):
        if not table_path.startswith("file://"):
            # no local pyarrow view of this scheme: count through a
            # Spark scan of the pinned version instead. Still cheap —
            # a bare parquet count() is satisfied from row-group
            # metadata (no column data is materialized), it just rides
            # the cluster's Hadoop FS instead of local footer reads.
            spark = _active_spark()
            return spark.read.parquet(_vdir(table_path, version)).count()
        table_path = table_path[len("file://"):]
    vdir = os.path.join(table_path, f"v={version}")
    return sum(pq.ParquetFile(p).metadata.num_rows
               for p in _glob.glob(os.path.join(vdir, "*.parquet")))


def append_run_record(base_path: str, record: dict) -> str:
    """Append one model-publish audit row to ``<base>/_runs`` as a
    single immutable parquet file (temp-write + atomic rename — the
    same publish discipline as the data). Readable as a normal table
    via :func:`read_runs`. Returns the file path."""
    import pandas as pd

    fname = f"run-{record['run_id']}-{record['model']}.parquet"
    if _is_uri(base_path):
        import tempfile

        from cdc_data_pipeline_spark.sources import fsutil

        spark = _active_spark()
        runs_dir = fsutil.path_join(base_path, _RUNS_DIR)
        fsutil.mkdirs(spark, runs_dir)
        final = fsutil.path_join(runs_dir, fname)
        with tempfile.NamedTemporaryFile(suffix=".parquet") as tmp:
            pd.DataFrame([record]).to_parquet(
                tmp.name, coerce_timestamps="us",
                allow_truncated_timestamps=True)
            # staged locally, shipped whole: the object appears fully
            # written or not at all
            fsutil.put_file(spark, tmp.name, final)
        return final
    runs_dir = os.path.join(base_path, _RUNS_DIR)
    os.makedirs(runs_dir, exist_ok=True)
    tmp = os.path.join(runs_dir, f".{fname}.tmp")
    # micros, not pandas' default nanos: sessions that enable
    # nanosAsLong (events fixture compat) would read ns as raw longs
    pd.DataFrame([record]).to_parquet(
        tmp, coerce_timestamps="us", allow_truncated_timestamps=True)
    final = os.path.join(runs_dir, fname)
    _replace_file(tmp, final)
    return final


def read_runs(spark: SparkSession, base_path: str) -> DataFrame:
    """The run-history manifest: one row per (run, model) publish with
    version, rows, duration — the after-the-fact audit surface the
    reference renders in Dagster's run history.

    Read as an explicit list of leaf files, not the bare ``_runs``
    directory: Spark's data-source path filter treats ``_``-prefixed
    root paths as hidden (it WARNs "all paths were ignored" and only
    accidentally still resolved the files), and a glob root makes the
    sink-metadata probe log a spurious FileNotFoundException — named
    leaf files hit neither. The listing is one metadata op on a
    manifest that holds one small file per (run, model)."""
    runs_dir = os.path.join(base_path, _RUNS_DIR)
    if _is_uri(base_path):
        from cdc_data_pipeline_spark.sources import fsutil

        runs_dir = fsutil.path_join(base_path, _RUNS_DIR)
        paths = [fsutil.path_join(runs_dir, n)
                 for n in fsutil.list_names(spark, runs_dir)
                 if n.startswith("run-") and n.endswith(".parquet")]
    else:
        paths = [os.path.join(runs_dir, n)
                 for n in sorted(os.listdir(runs_dir))
                 if n.startswith("run-") and n.endswith(".parquet")]
    if not paths:
        raise FileNotFoundError(f"no run records under {runs_dir}")
    return spark.read.parquet(*paths)
