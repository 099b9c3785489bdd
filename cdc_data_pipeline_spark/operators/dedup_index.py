"""Persisted MinHash-LSH dedup index: incremental near-dup detection
under full CDC — on the shared LSM protocol (``operators/lsm.py``,
the same generation/pointer/tombstone machinery as the persisted
inverted text and ANN indexes).

CDC meets dedup: a 100 TB training corpus is not re-deduplicated per
ingest tick — documents arrive in micro-batches and must be
near-dup-checked against everything already ingested WITHOUT
recomputing (or even rescanning) the historical signatures. This
module persists the banded LSH signature table as an index:

    <path>/meta.json            {"kind": "lsh", "n_id_buckets": K}
    <path>/BASE                 pointer naming the CURRENT generation
    <path>/base-<gen>/params.json   banding parameters OF THIS
                                generation (signatures are only
                                comparable within one parameter space,
                                so params live with the generation —
                                like the IVF centroids)
    <path>/base-<gen>/bands/pfx=N/  (doc_id, band, bucket) rows,
                                partitioned by a bucket-hash prefix
    <path>/base-<gen>/ids/ib=K/     (doc_id, pfxs) by id-hash bucket
    <path>/base-<gen>/compacted.json  folded delta names
    <path>/delta/<digest>/bands|ids/ + tombstones/pfx=N/(doc_id,victim)
    <path>/delta/<digest>/_COMMIT   marker written LAST

- ``build_lsh_index`` signatures the corpus once and publishes it as
  a new generation (a rebuild: the staged manifest excludes every
  prior delta the instant the pointer lands — banding params may
  change across rebuilds, and rows from different parameter spaces
  must never mix).
- ``query_lsh_index`` signatures ONLY the incoming batch, derives the
  touched prefixes (driver-side: at most ``n_prefixes`` scalars, like
  the IVF probe set in ``operators.index``), and reads just those
  directories of the resolved snapshot — partition pruning makes
  historical lookup cost proportional to the BATCH, not the corpus.
- ``append_lsh_index`` (insert), ``upsert_lsh_index`` (latest-wins
  replace — a re-ingested document whose text CHANGED tombstones its
  old signature rows, found via the id-hash-bucketed ids side table
  in O(batch)), and ``delete_from_lsh_index`` each commit ONE
  content-digest-named delta with a last-written marker —
  structurally idempotent under at-least-once replay, invisible until
  committed, never rewriting an existing file.
- ``compact_lsh_index`` folds base + deltas into a clean new
  generation (resolving all tombstones), carries the banding params
  forward unchanged, and publishes atomically with the one-generation
  GC grace; it is also the migration path for the legacy pre-pointer
  layout (root-level ``bands`` + parquet ``meta``).

The candidate semantics are identical to ``dedup.lsh_candidate_pairs``
(reference CDC dedup analogue: keep-latest upsert in
``base_loader.py:340-475`` — here generalized from key-equality to
near-duplicate text): full-corpus candidates = index-vs-batch pairs
(this module) + within-batch pairs (``lsh_candidate_pairs`` on the
batch), which the equivalence test pins.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators.dedup import banded_signatures
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join

PFX = "pfx"
COMMIT = lsm.COMMIT
# the legacy pre-pointer layout kept these at the index root
_LEGACY_TABLES = ("bands", "meta")
_DEFAULT_ID_BUCKETS = 32


def _with_pfx(banded: DataFrame, n_prefixes: int) -> DataFrame:
    # xxhash64: engine-internal partitioning key, no oracle needs to
    # reproduce it (cheaper than md5)
    return banded.withColumn(
        PFX, F.pmod(F.xxhash64("band", "bucket"), F.lit(n_prefixes)).cast("int"))


def _ib(col, n_id_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_id_buckets)).cast("int")


def _resolve(spark: SparkSession, path: str):
    """(base_name, base_root, root_pairs) for the published snapshot.
    The pointer is read ONCE per operation; the legacy layout resolves
    to the index root itself under the stable name ``"."``."""
    name = lsm.current_base_name(spark, path, legacy_probe=("bands",),
                                 legacy_name=".")
    if name is None:
        raise FileNotFoundError(f"LSH index has no published base: {path}")
    root = lsm.root_for(path, name)
    return name, root, lsm.root_pairs(spark, path, name, root)


def _params(spark: SparkSession, path: str,
            base_root: str) -> tuple[int, int, int, int]:
    """The RESOLVED generation's banding parameters (num_hashes,
    bands, shingle_k, n_prefixes). A legacy root predates params.json
    and keeps them in a one-row parquet ``meta`` table instead."""
    txt = fsutil.read_text(spark, path_join(base_root, "params.json"))
    if txt is not None:
        p = json.loads(txt)
        return (p["num_hashes"], p["bands"], p["shingle_k"],
                p["n_prefixes"])
    m = spark.read.parquet(path_join(path, "meta")).first()
    return m["num_hashes"], m["bands"], m["shingle_k"], m["n_prefixes"]


def _pin_id_buckets(spark: SparkSession, path: str, requested: int) -> int:
    """The ids side table's bucket modulus must agree between every
    writer and reader for the life of the index — the FIRST build pins
    it; later builds reuse the pinned value."""
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is not None:
        return int(json.loads(txt).get("n_id_buckets", requested))
    return requested


def _n_id_buckets(spark: SparkSession, path: str) -> int:
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is not None:
        return int(json.loads(txt).get("n_id_buckets",
                                       _DEFAULT_ID_BUCKETS))
    return _DEFAULT_ID_BUCKETS


def _dedup_batch(batch: DataFrame, text_col: str,
                 id_col: str) -> DataFrame:
    """Deterministic within-batch dedup: one row per id (min payload
    hash as the tiebreak). CDC callers with a real version column
    should pre-apply ``incremental.latest_per_key``."""
    return (batch.select(id_col, text_col)
            .groupBy(id_col)
            .agg(F.min_by(text_col, F.xxhash64(text_col)).alias(text_col)))


def _ids_rows(banded: DataFrame, id_col: str,
              n_id_buckets: int) -> DataFrame:
    """The (id -> touched prefixes) side-table rows for a banded
    frame — id-hash-bucketed so mutations look up victims reading
    only their own buckets, and carrying each doc's prefix set so a
    tombstone can be partitioned exactly where the victim's rows
    live."""
    return (banded.groupBy(id_col)
            .agg(F.sort_array(F.collect_set(PFX)).alias("pfxs"))
            .withColumn("ib", _ib(F.col(id_col), n_id_buckets)))


def _write_root(spark: SparkSession, root: str, banded: DataFrame | None,
                id_col: str, n_id_buckets: int) -> None:
    """Write a root's bands table (partitioned by prefix) and its ids
    side table. Empty frames are skipped entirely (a parquet dir with
    no part files cannot be re-read); ``read_union`` treats the
    absent directory as zero rows."""
    if banded is None or banded.isEmpty():
        return
    banded.write.mode("overwrite").partitionBy(PFX) \
        .parquet(path_join(root, "bands"))
    _ids_rows(banded, id_col, n_id_buckets).write.mode("overwrite") \
        .partitionBy("ib").parquet(path_join(root, "ids"))


def _visible_ids(spark: SparkSession, pairs, ibs: list[int] | None,
                 id_col: str) -> DataFrame | None:
    """Currently-VISIBLE (id, pfxs, __root) rows for the mutation
    paths, pruned to the batch's id-hash buckets via the ids side
    tables. A legacy root (no ids table) falls back to a column-pruned
    scan of its bands table. The kill set here is read UNBOUNDED by
    prefix (tombstone volume is bounded by mutations since the last
    compact, which is the table the next compact empties)."""
    out = None
    for name, r in pairs:
        if fsutil.exists(spark, path_join(r, "ids")):
            df = spark.read.parquet(path_join(r, "ids"))
            if ibs is not None:
                df = df.filter(F.col("ib").isin(ibs))
            df = df.select(id_col, "pfxs")
        elif fsutil.exists(spark, path_join(r, "bands")):
            df = (spark.read.parquet(path_join(r, "bands"))
                  .groupBy(id_col)
                  .agg(F.sort_array(F.collect_set(PFX)).alias("pfxs")))
        else:
            continue
        df = df.withColumn("__root", F.lit(name))
        out = df if out is None else out.unionByName(df)
    if out is None:
        return None
    kills = lsm.kills(spark, pairs, id_col)
    if kills is not None:
        out = out.join(kills, [id_col, "__root"], "left_anti")
    return out


# ------------------------------------------------------------- build

def build_lsh_index(spark: SparkSession, docs: DataFrame, path: str,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_hashes: int = 8, bands: int = 4, shingle_k: int = 3,
                    n_prefixes: int = 64,
                    n_id_buckets: int = _DEFAULT_ID_BUCKETS) -> dict:
    """Signature the corpus once and publish it as a NEW base
    generation behind the atomic ``BASE`` pointer (a rebuild: every
    pre-existing delta is excluded by the staged manifest the instant
    the publish lands — banding parameters may change across rebuilds,
    so rows signed under the old parameters must never mix in).

    Returns {n_docs, n_band_rows}. The generation's ``params.json``
    stores the banding parameters so queries and appends against a
    resolved snapshot always sign with ITS parameter space, even while
    a rebuild with different parameters is publishing concurrently.
    """
    n_id_buckets = _pin_id_buckets(spark, path, n_id_buckets)
    banded = _with_pfx(
        banded_signatures(docs, text_col, id_col, num_hashes, bands,
                          shingle_k),
        n_prefixes).localCheckpoint(eager=True)  # one signature pass
    cur = lsm.current_base_name(spark, path, legacy_probe=("bands",),
                                legacy_name=".")
    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    fsutil.write_text(spark, path_join(new, "params.json"),
                      json.dumps({"num_hashes": num_hashes, "bands": bands,
                                  "shingle_k": shingle_k,
                                  "n_prefixes": n_prefixes}))
    _write_root(spark, new, banded, id_col, n_id_buckets)
    stale = lsm.rebuild_manifest(spark, path, new)
    fsutil.write_text(spark, path_join(path, "meta.json"),
                      json.dumps({"kind": "lsh",
                                  "n_id_buckets": n_id_buckets}))
    gc = lsm.rebuild_gc_list(spark, path, cur, stale)
    keep = {new_name} | ({cur} if cur else set())
    lsm.publish_base(spark, path, new_name, keep, gc,
                     legacy_tables=_LEGACY_TABLES)
    stats = banded.agg(F.countDistinct(id_col).alias("d"),
                       F.count(F.lit(1)).alias("r")).first()
    return {"n_docs": stats["d"], "n_band_rows": stats["r"]}


# ------------------------------------------------------------- query

def query_lsh_index(spark: SparkSession, path: str, batch: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id_existing, id_new) candidate near-dup pairs between the
    persisted corpus and the incoming batch. READ-ONLY and
    SNAPSHOT-CONSISTENT alongside maintenance (pointer resolved once;
    immutable roots; one-generation GC grace).

    Only the batch is signatured — with the RESOLVED generation's
    banding parameters; the index read is pruned to the batch's
    bucket-hash prefixes at the directory level (the collected prefix
    list is bounded by n_prefixes — scalar-scale, the same legitimate
    driver-side collect as the IVF probe set), and the tombstone kill
    set is pruned by the SAME prefix list (a kill only matters for a
    row that can otherwise surface).
    """
    _, base_root, pairs = _resolve(spark, path)
    num_hashes, bands, shingle_k, n_prefixes = _params(spark, path,
                                                       base_root)
    # cache: the batch signatures are consumed twice (prefix collect +
    # join) and the batch is micro-batch-sized by construction
    qb = _with_pfx(
        banded_signatures(batch, text_col, id_col, num_hashes, bands,
                          shingle_k),
        n_prefixes).cache()
    prefixes = [r[0] for r in qb.select(PFX).distinct().collect()]
    idx = lsm.read_union_tagged(spark, pairs, "bands", PFX, prefixes)
    if idx is None:
        idt = dict(batch.dtypes)[id_col]
        return spark.createDataFrame([], f"id_existing {idt}, id_new {idt}")
    kills = lsm.kills(spark, pairs, id_col, PFX, prefixes)
    idx = lsm.visible(idx, kills, id_col)
    joined = idx.alias("i").join(
        qb.alias("q"),
        (F.col("i.band") == F.col("q.band"))
        & (F.col("i.bucket") == F.col("q.bucket"))
        & (F.col(f"i.{id_col}") != F.col(f"q.{id_col}")))
    return (joined.select(F.col(f"i.{id_col}").alias("id_existing"),
                          F.col(f"q.{id_col}").alias("id_new"))
            .distinct())


def read_index_docs(spark: SparkSession, path: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Every VISIBLE doc id of the published snapshot — the CDC-aware
    way to inspect index membership (a raw parquet read of one root
    would see dead copies and miss deltas)."""
    _, _, pairs = _resolve(spark, path)
    rows = lsm.read_union_tagged(spark, pairs, "bands")
    if rows is None:
        return None
    return (lsm.visible(rows, lsm.kills(spark, pairs, id_col), id_col)
            .select(id_col).distinct())


# -------------------------------------------- incremental maintenance

def append_lsh_index(spark: SparkSession, path: str, batch: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """CDC-shape insert: signature the batch with the published
    generation's parameters and commit it as ONE delta directory —
    new files land only under the batch's prefixes; history is never
    rewritten.

    IDEMPOTENT under at-least-once redelivery at EVERY crash point:
    the content digest of the (deduped) batch names the delta
    directory; a replay after full commit sees the marker and no-ops,
    and a replay after a partial write overwrites the same directory —
    uncommitted directories are invisible. Ids already VISIBLE in the
    index are anti-joined away reading only the batch's own id-hash
    buckets of the ids side tables (an id whose only copies are
    tombstoned counts as absent — a deleted document is legitimately
    re-insertable). Returns {appended, batch}."""
    return _mutate(spark, path, batch, text_col, id_col, kind="b")


def upsert_lsh_index(spark: SparkSession, path: str, batch: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """CDC upsert (latest wins): every document in the batch becomes
    the LIVE version — ids already visible have their prior signature
    rows tombstoned, even though the new text signs into DIFFERENT
    band buckets (the ids side table finds the victim's prefixes in
    O(batch)). One delta commits atomically with the batch's band
    rows, its ids rows, and a ``tombstones`` table naming each victim
    as (id, root), partitioned by the VICTIM's prefixes so queries
    prune it with their probed-prefix list. Idempotent like append
    (op-prefixed digest; victims recomputed from committed roots
    only). Returns {upserted, replaced, batch}."""
    return _mutate(spark, path, batch, text_col, id_col, kind="u")


def delete_from_lsh_index(spark: SparkSession, path: str, ids: DataFrame,
                          id_col: str = "doc_id") -> dict:
    """CDC delete: tombstone the visible signature rows of ``ids``
    (an id-only frame) in one committed delta — no data rewrite
    anywhere. Ids not present are ignored. Returns {deleted, batch}."""
    n_ib = _n_id_buckets(spark, path)
    ids0 = ids.select(id_col).distinct().localCheckpoint(eager=True)
    _, base_root, pairs = _resolve(spark, path)
    token = lsm.salt_past_manifest(
        spark, base_root, lsm.content_token(ids0, [id_col], "d"))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"deleted": 0, "batch": token}
    ibs = [r[0] for r in ids0.select(
        _ib(F.col(id_col), n_ib).alias("ib")).distinct().collect()]
    vis = _visible_ids(spark, pairs, ibs, id_col)
    victims = None
    n_kill = 0
    if vis is not None:
        victims = vis.join(ids0, id_col).localCheckpoint(eager=True)
        n_kill = victims.count()
    if n_kill == 0:
        # nothing visible matched: commit nothing — replaying a no-op
        # delete is itself a no-op, and committing an empty marker
        # would add one delta dir per no-op delete until the next
        # compact (see index.delete_from_ivf_index).
        fsutil.delete(spark, ddir)  # clears a crashed partial stage
        return {"deleted": 0, "batch": token}
    _write_tombstones(spark, ddir, victims, id_col)
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"deleted": n_kill, "batch": token}


def _write_tombstones(spark: SparkSession, ddir: str, victims: DataFrame,
                      id_col: str) -> None:
    """One tombstone row per (victim id, root, prefix-the-victim-
    touches), partitioned by prefix so the query-path kill set prunes
    exactly like the bands read."""
    lsm.write_tombstones(
        spark, ddir,
        victims.select(id_col, "__root",
                       F.explode("pfxs").alias(PFX)),
        id_col, F.col(PFX).alias(PFX))


def _mutate(spark: SparkSession, path: str, batch: DataFrame,
            text_col: str, id_col: str, kind: str) -> dict:
    """Shared insert/upsert delta commit."""
    n_ib = _n_id_buckets(spark, path)
    batch0 = _dedup_batch(batch, text_col, id_col) \
        .localCheckpoint(eager=True)
    _, base_root, pairs = _resolve(spark, path)
    token = lsm.salt_past_manifest(
        spark, base_root,
        lsm.content_token(batch0, [id_col, text_col], kind))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"appended": 0, "batch": token} if kind == "b" else \
            {"upserted": 0, "replaced": 0, "batch": token}
    num_hashes, bands, shingle_k, n_prefixes = _params(spark, path,
                                                       base_root)
    ibs = [r[0] for r in batch0.select(
        _ib(F.col(id_col), n_ib).alias("ib")).distinct().collect()]
    vis = _visible_ids(spark, pairs, ibs, id_col)

    if kind == "b":
        fresh = batch0 if vis is None else \
            batch0.join(vis.select(id_col), id_col, "left_anti") \
                  .localCheckpoint(eager=True)
        banded = _with_pfx(
            banded_signatures(fresh, text_col, id_col, num_hashes, bands,
                              shingle_k), n_prefixes)
        _write_root(spark, ddir, banded, id_col, n_ib)
        fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
        return {"appended": fresh.count(), "batch": token}

    victims = None
    n_kill = 0
    if vis is not None:
        victims = vis.join(batch0.select(id_col), id_col) \
            .localCheckpoint(eager=True)
        n_kill = victims.count()
    banded = _with_pfx(
        banded_signatures(batch0, text_col, id_col, num_hashes, bands,
                          shingle_k), n_prefixes)
    _write_root(spark, ddir, banded, id_col, n_ib)
    if n_kill:
        _write_tombstones(spark, ddir, victims, id_col)
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"upserted": batch0.count(), "replaced": n_kill, "batch": token}


# --------------------------------------------------------- compaction

def compact_lsh_index(spark: SparkSession, path: str,
                      id_col: str = "doc_id") -> dict:
    """Offline maintenance: fold the current base + committed deltas
    into a NEW generation (resolving all tombstones — killed rows are
    dropped and the new generation carries no tombstones at all),
    carry the banding parameters forward UNCHANGED (folded rows were
    all signed in this parameter space), atomically publish, and
    garbage-collect with the one-generation grace. Also the migration
    path for a legacy pre-pointer index: the first compact publishes
    generation 0, the second garbage-collects the legacy root-level
    tables. Returns {n_docs, compacted_deltas}."""
    n_ib = _n_id_buckets(spark, path)
    cur_name, base_root, pairs = _resolve(spark, path)
    num_hashes, bands, shingle_k, n_prefixes = _params(spark, path,
                                                       base_root)
    deltas = lsm.committed_deltas(spark, path, base_root)
    rows0 = lsm.read_union_tagged(spark, pairs, "bands")
    kills = lsm.kills(spark, pairs, id_col)
    rows = lsm.visible(rows0, kills, id_col)
    if rows is not None:
        rows = rows.localCheckpoint(eager=True)

    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    fsutil.write_text(spark, path_join(new, "params.json"),
                      json.dumps({"num_hashes": num_hashes, "bands": bands,
                                  "shingle_k": shingle_k,
                                  "n_prefixes": n_prefixes}))
    _write_root(spark, new, rows, id_col, n_ib)
    # a legacy index has no meta.json yet: write one so every later
    # mutation buckets ids with the modulus this fold just used
    if fsutil.read_text(spark, path_join(path, "meta.json")) is None:
        fsutil.write_text(spark, path_join(path, "meta.json"),
                          json.dumps({"kind": "lsh",
                                      "n_id_buckets": n_ib}))
    carried = lsm.compact_manifest(spark, path, base_root, new, deltas)
    lsm.publish_base(spark, path, new_name, {new_name, cur_name},
                     carried, legacy_tables=_LEGACY_TABLES,
                     expect_ptr=lsm.expected_ptr(cur_name))
    n = rows.select(id_col).distinct().count() if rows is not None else 0
    return {"n_docs": n, "compacted_deltas": len(deltas)}
