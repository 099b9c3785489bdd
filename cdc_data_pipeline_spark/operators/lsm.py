"""Shared LSM storage protocol for the persisted indexes.

Every persisted index in this engine (inverted text, IVF, IVF-PQ)
faces the same storage problem: a build is one big shuffle whose
output must be served for a long time while CDC keeps mutating the
corpus underneath it. The answer is the same everywhere, so it lives
here once:

    <path>/BASE                    pointer file naming the CURRENT
                                   base generation (atomic publish via
                                   ``fsutil.publish_text``)
    <path>/base-<gen>/...          IMMUTABLE base tables
    <path>/base-<gen>/compacted.json  delta names folded INTO this
                                   generation (logical exclusion —
                                   effective the instant the pointer
                                   publish lands)
    <path>/delta/<digest>/...      one directory per committed batch;
                                   mutation deltas carry a
                                   ``tombstones`` table addressing
                                   victims as (id, root)
    <path>/delta/<digest>/_COMMIT  marker written LAST

Protocol guarantees (pinned by ``tests/test_text_index.py`` and
``tests/test_index.py``):

- **Snapshot consistency**: a reader resolves the ``BASE`` pointer
  ONCE per operation; that generation plus the delta set its manifest
  admits are immutable, so a concurrent compaction swapping the
  pointer mid-query cannot mix generations.
- **One-generation GC grace**: publishing generation G+1 deletes only
  generations < G and deltas G's own manifest had already excluded —
  a reader that resolved G keeps every directory it can reach until a
  SECOND compaction completes.
- **Structural idempotency**: the content digest of a (deduped) batch
  names its delta directory and the commit marker lands last, so an
  at-least-once replay either no-ops on the marker or re-overwrites
  the same partially-written directory and converges. Uncommitted
  directories are invisible.
- **Root-addressed tombstones**: a mutation names its victims as
  (id, root-name) — exploiting the invariant that an id has exactly
  one LIVE physical copy, so no cross-delta ordering metadata (LSN,
  sequence number) is ever needed. Compaction resolves all tombstones
  into a clean generation.
- **Orphan sweep**: a crash between staging ``base-<gen>`` and the
  pointer publish leaves an orphan directory no pointer references;
  the next successful publish's GC pass removes it.
- **Single maintenance writer, detected violations**: mutations and
  compactions assume ONE maintenance writer at a time (queries are
  lock-free and need no coordination) — the same external-locking
  contract as Hudi/Delta on stores without compare-and-swap. A
  compaction additionally records the pointer value it resolved and
  ``publish_base`` re-reads the pointer immediately before
  publishing: two racing compactions (or a compact racing a rebuild)
  turn from a SILENT lost update into a raised
  ``ConcurrentPublishError`` whose staged generation the next
  successful publish sweeps as an orphan. Staged generation names
  carry a random nonce (``next_gen_name``), so racing maintainers
  stage disjoint directories — the loser can abandon or be swept but
  never clobber the winner's published files. The detection remains
  best-effort (the check-to-publish window is not atomic without a
  CAS primitive); deploys wanting HARD exclusion opt into
  ``maintenance_lock`` — a create-exclusive marker with stale-TTL
  takeover, atomic on local/HDFS — or bring a lock service on
  S3-class stores.

Reference parity: this generalizes the reference's delete+insert CDC
merge (clickhouse_load_tool/base_loader.py:241-249) and its staged
object-store publish (base_loader.py:107-165) from plain tables to
index structures, re-expressed for immutable-file storage (parquet on
a Hadoop FileSystem) instead of a mutating DBMS.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join

COMMIT = "_COMMIT"
BASE_PTR = "BASE"
MAINT_LOCK = "_MAINT_LOCK"
_UNCHECKED = object()


class ConcurrentPublishError(RuntimeError):
    """Another maintenance writer published between this writer's
    snapshot resolve and its publish attempt; this writer's staged
    generation was NOT published (the next successful publish sweeps
    it as an orphan). Re-run the maintenance operation against the
    new snapshot."""


class MaintenanceLockHeld(RuntimeError):
    """Another maintenance writer holds the opt-in lock and the
    acquire timeout elapsed. The index is untouched; retry later or
    raise the timeout."""


def _try_create_exclusive(spark: SparkSession, path: str,
                          text: str) -> bool:
    """One atomic create-if-absent attempt; False when the file
    already exists. Paths whose RESOLVED filesystem is local go
    through ``os.open(O_CREAT|O_EXCL)`` — POSIX-atomic, where Hadoop's
    RawLocalFileSystem ``create(f, overwrite=false)`` is a NON-atomic
    exists-then-create that two racing writers both pass (observed in
    the serialize test). Remote schemes use the Hadoop
    create-no-overwrite, atomic on HDFS; S3 lacks atomic
    create-exclusive entirely, see ``maintenance_lock``."""
    import os

    fs, p = fsutil._fs(spark, path)
    if fs.getUri().getScheme() == "file":
        local = fs.makeQualified(p).toUri().getPath()
        os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
        try:
            fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(text)
        return True
    parent = p.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    try:
        stream = fs.create(p, False)
    except Exception as ex:  # py4j wraps FileAlreadyExistsException
        msg = str(ex)
        if "Exists" in msg or "already exists" in msg.lower():
            return False
        raise
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    return True


class maintenance_lock:
    """Opt-in HARD mutual exclusion for maintenance (compact /
    retrain / rebuild) — the escape hatch the detect-not-prevent
    contract documents. A create-exclusive marker file under the index
    root is the mutex: atomic on local filesystems and HDFS, which is
    exactly where deploys can get real exclusion without a lock
    service. On S3-class stores create-exclusive is not atomic — keep
    relying on ``ConcurrentPublishError`` detection there, or bring an
    external lock service (the same contract as Hudi/Delta).

    Blocking acquire: polls until the holder releases (two compactions
    under the lock SERIALIZE instead of one raising), with stale-TTL
    takeover — a holder that crashed without releasing is expired once
    the marker's modification time is older than ``ttl_sec``. Raises
    ``MaintenanceLockHeld`` when ``timeout_sec`` elapses first.
    Release deletes the marker only while it still carries this
    writer's token: a lock lost to a stale takeover is never
    double-released. Detection stays on as the backstop — a takeover
    that was wrong (the holder was alive, just slow) still ends in
    ``ConcurrentPublishError``, not silent loss.

        with lsm.maintenance_lock(spark, path):
            compact_text_index(spark, path)
    """

    def __init__(self, spark: SparkSession, path: str,
                 ttl_sec: float = 3600.0, timeout_sec: float = 60.0,
                 poll_sec: float = 0.25, owner: str | None = None):
        self._spark = spark
        self._lock_path = path_join(path, MAINT_LOCK)
        self._ttl = ttl_sec
        self._timeout = timeout_sec
        self._poll = poll_sec
        self._token = f"{owner or 'maint'}-{uuid.uuid4().hex}"

    def __enter__(self):
        import time

        spark = self._spark
        deadline = time.monotonic() + self._timeout
        expired_once = False
        while not _try_create_exclusive(spark, self._lock_path,
                                        self._token):
            fs, p = fsutil._fs(spark, self._lock_path)
            try:
                st = fs.getFileStatus(p)
                age = time.time() - st.getModificationTime() / 1000.0
            except Exception:
                # marker released between attempts — or the status
                # probe itself is failing (permissions, a transient FS
                # fault). Either way fall through to the deadline
                # check and the paced retry: a persistent probe fault
                # must end in MaintenanceLockHeld, never a busy-spin.
                age = None
            if age is not None and age > self._ttl:
                # crashed holder: expire the marker and retry the
                # create-exclusive (racing expirers then race the
                # create, which only one can win). The first expiry
                # retries IMMEDIATELY — a lock this writer just freed
                # must be acquirable even at an elapsed deadline, not
                # raise a 'held by another writer' that contradicts
                # the expiry it just performed. Only the first: a
                # delete that silently fails (permissions) must not
                # turn this branch into a deadline-free spin.
                fsutil.delete(spark, self._lock_path)
                if not expired_once:
                    expired_once = True
                    continue
            if time.monotonic() >= deadline:
                state = (f"held by another maintenance writer "
                         f"(marker age {age:.1f}s, ttl {self._ttl}s)"
                         if age is not None else
                         "marker status unavailable (released mid-probe "
                         "or a persistent filesystem fault)")
                raise MaintenanceLockHeld(f"{self._lock_path}: {state}")
            time.sleep(self._poll)
        return self

    def __exit__(self, exc_type, exc, tb):
        cur = fsutil.read_text(self._spark, self._lock_path)
        if cur == self._token:
            fsutil.delete(self._spark, self._lock_path)
        return False


def expected_ptr(cur_name: str | None) -> str | None:
    """The raw pointer value a resolved base name implies: legacy
    layouts (``"base"``/``"."``) predate the pointer file, so their
    expectation is 'no pointer exists yet'."""
    return None if cur_name in (None, ".", "base") else cur_name


def index_stats(spark: SparkSession, path: str) -> dict:
    """Maintenance signal for a compaction scheduler: the published
    generation, the committed-but-unfolded delta count (the read
    amplification every query pays — each delta is one more root to
    scan per probed bucket), how many of those deltas carry tombstones
    (dead rows inflating scans until the next fold), and how many
    generation directories sit on disk (>2 means grace + orphans
    awaiting GC). Kind-agnostic: works on any index built on this
    protocol (text / IVF / IVF-PQ / LSH), legacy layouts included."""
    kind = _detect_kind(spark, path)
    lock_age = _lock_age_sec(spark, path)
    cur = current_base_name(
        spark, path, legacy_probe=("base", "bands", "cells", "codes"),
        legacy_name="<legacy>")
    if cur is None:
        return {"kind": kind, "generation": None, "n_generations": 0,
                "n_deltas": 0, "n_tombstone_deltas": 0,
                "maintenance_lock_age_sec": lock_age}
    if cur == "<legacy>":
        # the legacy base root is kind-specific: the text index kept
        # its tables under <path>/base; ANN/LSH kept them at the index
        # root itself — resolve the way the per-index _resolve helpers do
        base_root = path_join(path, "base") if kind == "text" and \
            fsutil.exists(spark, path_join(path, "base")) else path
    else:
        base_root = path_join(path, cur)
    deltas = committed_deltas(spark, path, base_root)
    tomb = sum(1 for d in deltas
               if fsutil.exists(spark, path_join(d, "tombstones")))
    return {"kind": kind, "generation": cur,
            "n_generations": len(base_names(spark, path)),
            "n_deltas": len(deltas), "n_tombstone_deltas": tomb,
            "maintenance_lock_age_sec": lock_age}


def _lock_age_sec(spark: SparkSession, path: str) -> float | None:
    """Age of a held ``maintenance_lock`` marker (None when free) —
    the scheduler-facing signal distinguishing 'another maintainer is
    active' from 'a crashed holder awaits TTL takeover'."""
    import time

    fs, p = fsutil._fs(spark, path_join(path, MAINT_LOCK))
    try:
        st = fs.getFileStatus(p)
    except Exception:
        return None
    return round(time.time() - st.getModificationTime() / 1000.0, 3)


def _detect_kind(spark: SparkSession, path: str) -> str | None:
    """Index kind from ``meta.json``, falling back to structural
    detection for legacy pre-meta layouts (mirroring ``index._meta``'s
    legacy synthesis): root-level ``codes``/``cells`` is an ANN index,
    ``bands`` is LSH, ``base`` is the text index's old layout. This is
    what lets ``compact_index`` / the ``compact`` CLI migrate exactly
    the layouts the per-kind compactors document as their migration
    path."""
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    meta = json.loads(txt) if txt else {}
    kind = meta.get("kind", "text" if "n_buckets" in meta else None)
    if kind is not None:
        return kind
    if fsutil.exists(spark, path_join(path, "codes")):
        return "ivfpq"
    if fsutil.exists(spark, path_join(path, "cells")):
        return "ivf"
    if fsutil.exists(spark, path_join(path, "bands")):
        return "lsh"
    if fsutil.exists(spark, path_join(path, "base")):
        return "text"
    return None


def compact_index(spark: SparkSession, path: str, lock: bool = False,
                  lock_ttl_sec: float = 3600.0,
                  lock_timeout_sec: float = 60.0) -> dict:
    """Kind-dispatched compaction for any index on this protocol —
    the kind comes from ``meta.json`` (a text index's legacy meta
    carries only ``n_buckets``), or from structural layout detection
    for legacy pre-meta indexes. Imports are local: the index modules
    import this one. ``lock=True`` serializes against other locked
    maintainers via ``maintenance_lock`` (hard exclusion on
    local/HDFS; detection stays the backstop)."""
    if lock:
        with maintenance_lock(spark, path, ttl_sec=lock_ttl_sec,
                              timeout_sec=lock_timeout_sec):
            return compact_index(spark, path)
    kind = _detect_kind(spark, path)
    if kind == "lsh":
        from cdc_data_pipeline_spark.operators.dedup_index import (
            compact_lsh_index)
        return {"kind": kind, **compact_lsh_index(spark, path)}
    if kind in ("ivf", "ivfpq"):
        from cdc_data_pipeline_spark.operators.index import (
            compact_ann_index)
        return {"kind": kind, **compact_ann_index(spark, path)}
    if kind == "text":
        from cdc_data_pipeline_spark.operators.text_index import (
            compact_text_index)
        return {"kind": kind, **compact_text_index(spark, path)}
    raise ValueError(f"no index metadata at {path}")


def fsck_index(spark: SparkSession, path: str) -> dict:
    """READ-ONLY invariant audit of a persisted LSM index — the index
    counterpart of ``incremental.fsck_table``, kind-agnostic because
    every family (text / IVF / IVF-PQ / LSH) rides this one protocol.
    Structural checks only, from metadata listings (the serving
    invariants themselves — snapshot consistency, tombstone
    resolution, replay idempotency — are pinned by the crash-protocol
    sweep; this is the on-demand production diagnostic):

    - the ``BASE`` pointer resolves to a generation directory that
      EXISTS (a pointer to a missing directory bricks every read);
    - the published generation's ``compacted.json`` manifest parses;
    - staged-but-unpublished generations are inventoried (normal
      one-publish grace/orphans = info; they cost storage until the
      next publish's GC, never correctness);
    - delta directories carry their ``_COMMIT`` marker (uncommitted =
      invisible crash debris awaiting replay-overwrite or sweep);
    - deltas the manifest already folded but GC has not collected are
      inventoried (double-count-proof by the manifest, storage only);
    - a held ``maintenance_lock`` is surfaced with its age.

    Same report shape as ``fsck_table``: ``ok`` means no
    error-severity finding."""
    findings: list[dict] = []

    def add(severity: str, check: str, detail: str) -> None:
        findings.append({"severity": severity, "check": check,
                         "detail": detail})

    def report() -> dict:
        errors = sum(1 for f in findings if f["severity"] == "error")
        warns = sum(1 for f in findings if f["severity"] == "warn")
        return {"path": path, "ok": errors == 0, "errors": errors,
                "warnings": warns, "findings": findings}

    if not fsutil.exists(spark, path):
        add("error", "index_missing", "path does not exist")
        return report()
    kind = _detect_kind(spark, path)
    if kind is None:
        add("error", "kind",
            "no meta.json and no recognizable layout — not an index "
            "on this protocol")
        return report()

    ptr = fsutil.read_text(spark, path_join(path, BASE_PTR))
    gens = base_names(spark, path)
    folded: set = set()
    if ptr is None:
        if gens:
            add("error", "pointer_missing",
                f"generation directories exist ({gens[:3]}...) but no "
                f"{BASE_PTR} pointer — staged publishes with no "
                "published base; rebuild or restore the pointer")
        else:
            add("info", "legacy_layout",
                "pre-pointer legacy layout — the next compact_index "
                "migrates it onto the pointer protocol")
        base_root = None
    else:
        cur = ptr.strip()
        base_root = root_for(path, cur)
        if not fsutil.exists(spark, base_root):
            add("error", "pointer_dangling",
                f"{BASE_PTR} names {cur!r} but that directory does not "
                "exist — every read is bricked; restore the directory "
                "or republish from a rebuild")
            base_root = None
        else:
            try:
                txt = fsutil.read_text(
                    spark, path_join(base_root, "compacted.json"))
                if txt is not None:
                    folded = set(json.loads(txt))
            except Exception as exc:      # unparseable OR unreadable
                add("error", "manifest_corrupt",
                    f"{cur}/compacted.json unreadable or unparseable "
                    f"({type(exc).__name__}) — folded deltas would "
                    "double-count; restore it before the next read")
            cur_ord = _gen_ordinal(cur)
            for g in gens:
                if g == cur:
                    continue
                o = _gen_ordinal(g)
                if o is None or cur_ord is None or o <= cur_ord:
                    add("info", "generation_awaiting_gc",
                        f"{g} — superseded generation inside the "
                        "one-publish GC grace; the next publish sweeps "
                        "it")
                else:
                    add("info", "generation_orphan",
                        f"{g} — staged above the published ordinal (a "
                        "crashed or losing maintainer); swept by the "
                        "next successful publish")

    droot = path_join(path, "delta")
    n_committed = n_uncommitted = n_folded_present = 0
    if fsutil.exists(spark, droot):
        for name in fsutil.list_names(spark, droot):
            committed = fsutil.exists(spark, path_join(droot, name, COMMIT))
            if not committed:
                n_uncommitted += 1
                add("warn", "delta_uncommitted",
                    f"delta/{name} has no {COMMIT} marker — invisible "
                    "crash debris; an at-least-once replay of that "
                    "batch overwrites and commits it, else sweep it")
            elif name in folded:
                n_folded_present += 1
                add("info", "delta_awaiting_gc",
                    f"delta/{name} is folded into the published "
                    "generation (manifest) but not yet collected")
            else:
                n_committed += 1

    age = _lock_age_sec(spark, path)
    if age is not None:
        add("info", "maintenance_lock",
            f"lock marker held for {age}s — a maintainer is live, or "
            "crashed mid-hold (stale markers expire by TTL takeover)")
    out = report()
    out.update({"kind": kind, "generation": ptr.strip() if ptr else None,
                "n_deltas": n_committed,
                "n_uncommitted_deltas": n_uncommitted,
                "n_folded_awaiting_gc": n_folded_present})
    return out


def maybe_compact_index(spark: SparkSession, path: str,
                        over: int | None) -> dict | None:
    """Threshold-gated ``compact_index``: fold only when MORE than
    ``over`` committed deltas are unfolded (None disables). The
    in-stream maintenance hook — inside ``foreachBatch`` this is
    serialized with the sink's own mutations, so the
    single-maintenance-writer contract holds by construction."""
    if over is None or index_stats(spark, path)["n_deltas"] <= over:
        return None
    return compact_index(spark, path)


def gen_name(gen: int) -> str:
    return f"base-{gen:010d}"


def base_names(spark: SparkSession, path: str) -> list[str]:
    """Every staged-or-published base generation directory name,
    including a pre-pointer legacy ``base`` if one exists."""
    return [n for n in fsutil.list_names(spark, path)
            if n == "base" or n.startswith("base-")]


def _gen_ordinal(name: str) -> int | None:
    """Numeric ordinal of a ``base-<gen>[-<nonce>]`` directory name
    (None for the pre-pointer legacy ``base`` or anything foreign)."""
    if not name.startswith("base-"):
        return None
    head = name[5:].split("-", 1)[0]
    return int(head) if head.isdigit() else None


def next_gen_name(spark: SparkSession, path: str) -> str:
    """A COLLISION-PROOF name for a staged generation: the next
    ordinal after every staged-or-published generation on disk, plus a
    random nonce. Two maintainers that race the same directory listing
    derive the same ordinal but different nonces, so the loser stages
    (and, on crash, abandons) its OWN directory — it can never delete
    or write into a name another writer published. The loser's orphan
    is swept by the next successful publish's GC pass. Generation
    names, unlike delta digests, carry no replay-idempotency contract,
    so randomness here is safe: a crash-replayed maintenance run
    simply stages a fresh name against the same snapshot."""
    ords = [o for o in (_gen_ordinal(n) for n in base_names(spark, path))
            if o is not None]
    return (gen_name(max(ords, default=-1) + 1)
            + "-" + uuid.uuid4().hex[:8])


def current_base_name(spark: SparkSession, path: str,
                      legacy_probe: tuple[str, ...] = ("base",),
                      legacy_name: str = "base") -> str | None:
    """The published generation (pointer content), falling back to a
    legacy pre-pointer layout: if any of ``legacy_probe`` exists under
    ``path``, the index predates the pointer protocol and
    ``legacy_name`` is returned (``"base"`` for the text index's old
    ``<path>/base`` directory; ``"."`` for the ANN indexes, whose old
    layout kept tables at the index root itself)."""
    ptr = fsutil.read_text(spark, path_join(path, BASE_PTR))
    if ptr is not None:
        return ptr.strip()
    for probe in legacy_probe:
        if fsutil.exists(spark, path_join(path, probe)):
            return legacy_name
    return None


def root_for(path: str, name: str) -> str:
    """Directory for a root name (``"."`` = the index root itself —
    the ANN indexes' legacy layout)."""
    return path if name == "." else path_join(path, name)


def committed_deltas(spark: SparkSession, path: str,
                     base_root: str) -> list[str]:
    """Delta directories that are committed AND not already folded
    into this base generation. The generation's ``compacted.json``
    manifest (staged inside the directory BEFORE the pointer publish)
    excludes folded deltas logically the instant the publish lands —
    their later deletion is garbage collection, so a crash between the
    publish and the GC loop can never double-count them."""
    folded = set()
    txt = fsutil.read_text(spark, path_join(base_root, "compacted.json"))
    if txt is not None:
        folded = set(json.loads(txt))
    root = path_join(path, "delta")
    return sorted(
        path_join(root, name) for name in fsutil.list_names(spark, root)
        if name not in folded
        and fsutil.exists(spark, path_join(root, name, COMMIT)))


def root_pairs(spark: SparkSession, path: str, base_name: str,
               base_root: str) -> list[tuple[str, str]]:
    """(stable name, full path) for the readable roots: the resolved
    base generation plus its admitted deltas. The NAME (``base-<gen>``,
    ``"."`` for a legacy ANN root, or ``delta/<digest>``) is what
    tombstones record as their victim root — path-prefix-free, so an
    index copied or mounted elsewhere keeps its kill set valid."""
    out = [(base_name, base_root)]
    for d in committed_deltas(spark, path, base_root):
        out.append(("delta/" + d.rstrip("/").rsplit("/", 1)[-1], d))
    return out


def read_union(spark: SparkSession, roots: list[str], table: str,
               bucket_col: str | None = None,
               buckets: list[int] | None = None) -> DataFrame | None:
    """Union one sub-table across base + delta roots (absent dirs are
    skipped — an append whose batch was fully deduped away commits an
    empty directory). The bucket IN-filter applies per root, so the
    scan prunes unprobed partition directories in every root."""
    out = None
    for r in roots:
        p = path_join(r, table)
        if not fsutil.exists(spark, p):
            continue
        df = spark.read.parquet(p)
        if bucket_col is not None:
            df = df.filter(F.col(bucket_col).isin(buckets))
        out = df if out is None else out.unionByName(df)
    return out


def read_union_tagged(spark: SparkSession, pairs: list[tuple[str, str]],
                      table: str, bucket_col: str | None = None,
                      buckets: list[int] | None = None) -> DataFrame | None:
    """``read_union`` that stamps each row with its root's stable
    name (``__root``), the column tombstone kills match on."""
    out = None
    for name, r in pairs:
        p = path_join(r, table)
        if not fsutil.exists(spark, p):
            continue
        df = spark.read.parquet(p)
        if bucket_col is not None:
            df = df.filter(F.col(bucket_col).isin(buckets))
        df = df.withColumn("__root", F.lit(name))
        out = df if out is None else out.unionByName(df)
    return out


def kills(spark: SparkSession, pairs: list[tuple[str, str]],
          id_col: str, bucket_col: str | None = None,
          buckets: list[int] | None = None) -> DataFrame | None:
    """The kill set: every ``(id, __root)`` whose copy an upsert or
    delete tombstoned, unioned across roots and optionally pruned by
    the tombstone table's partition column (``db`` doc-hash buckets
    for the text index, ``cid`` cells for the ANN indexes — a
    tombstone only matters for a copy that can otherwise surface).
    ``buckets`` None means UNBOUNDED (the compaction fold). None
    result when no root carries tombstones — the append-only fast
    path."""
    paths = [p for _, p in pairs]
    t = read_union(spark, paths, "tombstones") if buckets is None else \
        read_union(spark, paths, "tombstones", bucket_col, buckets)
    if t is None:
        return None
    return t.select(F.col(id_col), F.col("victim").alias("__root"))


def visible(df: DataFrame | None, kill_set: DataFrame | None,
            id_col: str) -> DataFrame | None:
    """Apply the kill set to a ``__root``-tagged frame and drop the
    tag. An id appears in at most one LIVE root (the insert path
    anti-joins existing ids; the upsert path tombstones every prior
    visible copy), so after this filter per-id relations are unique
    again."""
    if df is None:
        return None
    if kill_set is not None:
        # no broadcast hint: the kill set is bounded by the candidate
        # bucket list on the read path but unbounded on the compaction
        # path — let AQE pick the strategy per call site
        df = df.join(kill_set, [id_col, "__root"], "left_anti")
    return df.drop("__root")


def _quote(col: str) -> str:
    return "`" + col.replace("`", "``") + "`"


def content_token(df: DataFrame, cols: list[str], kind: str) -> str:
    """Content digest naming a batch's delta directory: xor of
    structural row hashes (order-independent, overflow-free) + count.
    A pure function of the (deduped) batch content, so every
    redelivery of the same batch maps to the same directory. ``kind``
    prefixes the name per operation ("b" insert, "u" upsert, "d"
    delete) so the same payload replayed through a DIFFERENT operation
    can never alias an existing directory's commit marker. The
    structural multi-column hash means NULLs and separator characters
    inside string values cannot make distinct rows collide the way a
    concat-with-delimiter digest can; identifiers are backtick-quoted
    so exotic column names survive ``expr`` parsing."""
    hashed = ", ".join(_quote(c) for c in cols)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({hashed}))").alias("d")).collect()[0]
    return f"{kind}{row['n']}x{(row['d'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def salt_past_manifest(spark: SparkSession, base_root: str,
                       token: str) -> str:
    """A digest name the current generation's manifest has EXCLUDED
    must not be reused: a grace-retained folded directory may still
    carry a stale ``_COMMIT`` under it — trusting that marker would
    silently drop the new batch (the manifest keeps the name invisible
    forever and the next compact GCs the directory). Deterministic
    given the manifest, so crash-replays against the same generation
    re-derive the same salted name."""
    folded_txt = fsutil.read_text(spark, path_join(base_root,
                                                   "compacted.json"))
    folded = set(json.loads(folded_txt)) if folded_txt else set()
    while token in folded:
        token += "-r"
    return token


def write_tombstones(spark: SparkSession, ddir: str, victims: DataFrame,
                     id_col: str, bucket_expr) -> None:
    """Persist a delta's kill set, partitioned by ``bucket_expr``
    (a Column: doc-hash bucket for the text index, victim cell for the
    ANN indexes) so readers prune it the same way they prune the data
    tables. ``victims`` is (id, __root); the partition column is named
    after ``bucket_expr``'s alias, which the caller bakes in."""
    if victims.isEmpty():
        return
    out = victims.select(F.col(id_col), F.col("__root").alias("victim"),
                         bucket_expr)
    part = [c for c in out.columns if c not in (id_col, "victim")][0]
    out.write.mode("overwrite").partitionBy(part) \
        .parquet(path_join(ddir, "tombstones"))


def publish_base(spark: SparkSession, path: str, new_name: str,
                 keep: set[str], gc_deltas: list[str],
                 legacy_tables: tuple[str, ...] = (),
                 expect_ptr: str | None | object = _UNCHECKED) -> None:
    """Atomically publish ``new_name`` as the current generation, then
    garbage-collect: base generations outside ``keep``, the named
    delta dirs, and — when the grace set no longer includes the legacy
    pre-pointer root — the legacy layout's root-level tables.
    Everything deleted here is invisible to BOTH the new generation
    and the one it superseded (the grace generation), so a reader that
    resolved either pointer value never loses a directory it can reach
    — only a reader two compactions stale can.

    ``expect_ptr`` (compaction callers): the pointer value this writer
    resolved its snapshot from (``expected_ptr(cur_name)``). If the
    pointer moved since, raise ``ConcurrentPublishError`` BEFORE
    publishing — a racing maintainer won, and overwriting its pointer
    would silently discard everything it folded. Rebuilds skip the
    check: replacing whatever is current is their contract."""
    if expect_ptr is not _UNCHECKED:
        cur = fsutil.read_text(spark, path_join(path, BASE_PTR))
        cur = cur.strip() if cur is not None else None
        if cur != expect_ptr:
            raise ConcurrentPublishError(
                f"{path}: pointer moved {expect_ptr!r} -> {cur!r} during "
                f"maintenance; staged {new_name!r} left unpublished")
    fsutil.publish_text(spark, path_join(path, BASE_PTR), new_name)
    for name in base_names(spark, path):
        if name not in keep:
            fsutil.delete(spark, path_join(path, name))
    for name in gc_deltas:
        fsutil.delete(spark, path_join(path, "delta", name))
    if legacy_tables and "." not in keep and "base" not in keep:
        for t in legacy_tables:
            fsutil.delete(spark, path_join(path, t))


def rebuild_manifest(spark: SparkSession, path: str,
                     new_root: str) -> list[str]:
    """A rebuild supersedes every existing delta: write the staged
    generation's manifest naming them all (logical exclusion before
    the publish). Returns the names, for the caller's GC decision."""
    stale = fsutil.list_names(spark, path_join(path, "delta"))
    fsutil.write_text(spark, path_join(new_root, "compacted.json"),
                      json.dumps(sorted(stale)))
    return stale


def rebuild_gc_list(spark: SparkSession, path: str, cur_name: str | None,
                    stale: list[str]) -> list[str]:
    """Deltas safe to GC at a rebuild publish: only those the
    SUPERSEDED generation had already excluded — the rest stay one
    grace cycle for readers still holding the old pointer (invisible
    to new readers through the manifest either way)."""
    if cur_name is None:
        return []
    prev = fsutil.read_text(
        spark, path_join(root_for(path, cur_name), "compacted.json"))
    return [n for n in (json.loads(prev) if prev else []) if n in stale]


def compact_manifest(spark: SparkSession, path: str, base_root: str,
                     new_root: str, deltas: list[str]) -> list[str]:
    """Write the staged compaction generation's manifest: the folded
    deltas plus every still-on-disk name carried from the superseded
    generation's manifest (a folded-but-not-yet-GC'd delta from a
    previous cycle must stay excluded under the new generation too;
    names of fully deleted deltas are harmless residue, dropped here
    once their directory is gone). Returns the carried names — the GC
    set for the publish (both surviving manifests exclude them)."""
    prev = fsutil.read_text(spark, path_join(base_root, "compacted.json"))
    carried = [n for n in (json.loads(prev) if prev else [])
               if fsutil.exists(spark, path_join(path, "delta", n))]
    newly = sorted(d.rsplit("/", 1)[-1] for d in deltas)
    fsutil.write_text(spark, path_join(new_root, "compacted.json"),
                      json.dumps(sorted(set(carried) | set(newly))))
    return carried
