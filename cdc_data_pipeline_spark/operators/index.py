"""Persisted IVF / IVF-PQ indexes: build once, query with partition
pruning, maintain under full CDC — on the shared LSM protocol
(``operators/lsm.py``, the same generation/pointer/tombstone machinery
as the persisted inverted text index).

``operators/similarity.ivf_topk`` recomputes the coarse quantization
per query batch — right for one-shot jobs, wrong for a serving corpus
that is written once and queried forever. This module materializes the
index as TABLES:

    <path>/meta.json          {"kind", "n_cells", "n_id_buckets", ...}
    <path>/BASE               pointer naming the CURRENT generation
    <path>/base-<gen>/centroids/            n_cells rows
    <path>/base-<gen>/codebooks/            (ivfpq) m*ksub rows
    <path>/base-<gen>/cells/centroid_id=N/  (id, embedding)   [ivf]
    <path>/base-<gen>/codes/centroid_id=N/  (id, codes)       [ivfpq]
    <path>/base-<gen>/ids/ib=K/             (id, cid) by id-hash
    <path>/base-<gen>/compacted.json        folded delta names
    <path>/delta/<digest>/cells|codes/centroid_id=N/  + ids/ib=K/
    <path>/delta/<digest>/tombstones/cid=N/ (id, victim root)
    <path>/delta/<digest>/_COMMIT           marker written LAST

so a query batch (1) assigns itself to cells against the resolved
generation's broadcast centroid table, (2) reads ONLY the probed cell
partitions of the base + its admitted deltas — Spark's partition
pruning turns ``WHERE centroid_id IN (...)`` into a directory-level
skip, the disk analogue of FAISS's inverted lists — and (3) filters
candidates through the tombstone kill set and scores within cells.
``nprobe`` trades recall for partitions touched, the standard IVF
knob.

CDC-complete: ``append_to_*`` (insert), ``upsert_into_*``
(latest-wins replace — the reference's delete+insert merge,
base_loader.py:241-249), and ``delete_from_*`` all commit one
content-digest-named delta directory with a last-written marker —
structurally idempotent under at-least-once replay, invisible until
committed, never rewriting an existing file. An upserted embedding
may land in a DIFFERENT cell than the copy it replaces; the
id-hash-bucketed ``ids`` side table (id -> cell) makes the victim
lookup O(batch) — mutation cost never scans the corpus. Tombstones
address victims as (id, root): an id has exactly one live copy, so no
cross-delta ordering metadata is needed; queries prune the kill set
by their probed cells exactly like the data read. Compaction folds
everything into a clean new generation behind the atomic pointer
(snapshot-consistent for concurrent readers, one-generation GC
grace).

Centroids (and PQ codebooks) belong to a GENERATION: every root a
generation admits was assigned/encoded in that generation's centroid
space (appends assign against the current base; a rebuild retrains
and excludes all prior deltas via its manifest; compaction carries
the centroids forward unchanged), so a resolved snapshot is always
internally consistent. The legacy pre-pointer layout (tables at the
index root) still reads, takes deltas, and is migrated — then
garbage-collected — by the first two compactions.

Scale: centroids are trained with the deterministic Lloyd's machinery
from ``operators.clustering`` on a hash-sample (training never needs
the full corpus); the corpus-side assignment is a literal-centroid
projection (no join); the only full-corpus shuffle ever is the
partitioned write itself.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.vectors import cosine
from cdc_data_pipeline_spark.operators import clustering as cl
from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators.sampling import hash_sample
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join

CELL = "centroid_id"
COMMIT = lsm.COMMIT
# legacy pre-pointer layouts kept these tables at the index root
_LEGACY_TABLES = ("cells", "codes", "centroids", "codebooks", "ids")


def _ib(col, n_id_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_id_buckets)).cast("int")


def _meta(spark: SparkSession, path: str) -> dict:
    """Index metadata; synthesized for a legacy pre-pointer index
    (which has no meta.json — kind is recovered from which data table
    exists, and n_id_buckets falls back to the default)."""
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is not None:
        return json.loads(txt)
    if fsutil.exists(spark, path_join(path, "codes")):
        return {"kind": "ivfpq", "n_id_buckets": 32}
    if fsutil.exists(spark, path_join(path, "cells")):
        return {"kind": "ivf", "n_id_buckets": 32}
    raise FileNotFoundError(f"not a persisted ANN index: {path}")


def _resolve(spark: SparkSession, path: str):
    """(base_name, base_root, root_pairs) for the published snapshot.
    The pointer is read ONCE per operation; the legacy layout resolves
    to the index root itself under the stable name ``"."``."""
    name = lsm.current_base_name(spark, path,
                                 legacy_probe=("cells", "codes"),
                                 legacy_name=".")
    if name is None:
        raise FileNotFoundError(f"ANN index has no published base: {path}")
    root = lsm.root_for(path, name)
    return name, root, lsm.root_pairs(spark, path, name, root)


def train_centroids(corpus: DataFrame, n_cells: int, iters: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_fraction: float = 1.0,
                    seed: int = 0) -> list[tuple[int, list[float]]]:
    """Lloyd's iterations on a deterministic hash-sample of the corpus
    (IVF training is insensitive to sampling; FAISS trains on ~256
    vectors per cell)."""
    train = corpus if sample_fraction >= 1.0 else \
        hash_sample(corpus, sample_fraction, id_col, seed=seed, fast=True)
    cents = cl.init_centroids(train, n_cells, vec_col, id_col, seed)
    for _ in range(iters):
        assigned = cl.assign_clusters(train, cents, vec_col, id_col)
        cents = cl.recompute_centroids(assigned, vec_col)
    return cents


def _dedup_batch(batch: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Deterministic within-batch dedup: one row per id (min payload
    hash as the tiebreak). CDC callers with a real version column
    should pre-apply ``incremental.latest_per_key``."""
    return (batch.select(id_col, vec_col)
            .groupBy(id_col)
            .agg(F.min_by(vec_col, F.xxhash64(vec_col)).alias(vec_col)))


def _ids_rows(rows: DataFrame, id_col: str, n_id_buckets: int) -> DataFrame:
    """The (id -> cell) side-table rows for a data frame carrying
    ``CELL`` — id-hash-bucketed so mutations look up victims reading
    only their own buckets, never the corpus."""
    return (rows.select(F.col(id_col), F.col(CELL).alias("cid"))
            .withColumn("ib", _ib(F.col(id_col), n_id_buckets)))


def _write_root(spark: SparkSession, root: str, table: str,
                rows: DataFrame | None, id_col: str,
                n_id_buckets: int) -> None:
    """Write a root's data table (cells|codes, partitioned by cell)
    and its ids side table. Empty frames are skipped entirely (a
    parquet dir with no part files cannot be re-read); ``read_union``
    treats the absent directory as zero rows."""
    if rows is None or rows.isEmpty():
        return
    rows.write.mode("overwrite").partitionBy(CELL) \
        .parquet(path_join(root, table))
    _ids_rows(rows, id_col, n_id_buckets).write.mode("overwrite") \
        .partitionBy("ib").parquet(path_join(root, "ids"))


def _write_centroids(spark: SparkSession, root: str, cents,
                     vec_col: str) -> None:
    rows = [(cid, [float(x) for x in v]) for cid, v in cents]
    spark.createDataFrame(rows, f"{CELL} int, {vec_col} array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(path_join(root, "centroids"))


def _visible_id_cells(spark: SparkSession, pairs, ibs: list[int] | None,
                      id_col: str, table: str) -> DataFrame | None:
    """Currently-VISIBLE (id, cid, __root) rows for the mutation
    paths, pruned to the batch's id-hash buckets via the ids side
    table. A legacy root (no ids table) falls back to a column-pruned
    id+cell scan of its data table. The kill set here is read
    UNBOUNDED by cells (a victim can sit in any cell) — tombstone
    volume is bounded by mutations since the last compact, which is
    the table the next compact empties."""
    out = None
    for name, r in pairs:
        if fsutil.exists(spark, path_join(r, "ids")):
            df = spark.read.parquet(path_join(r, "ids"))
            if ibs is not None:
                df = df.filter(F.col("ib").isin(ibs))
            df = df.select(id_col, "cid")
        elif fsutil.exists(spark, path_join(r, table)):
            df = (spark.read.parquet(path_join(r, table))
                  .select(F.col(id_col), F.col(CELL).alias("cid")))
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

def build_ivf_index(spark: SparkSession, corpus: DataFrame, path: str,
                    n_cells: int = 64, iters: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_fraction: float = 1.0, seed: int = 0,
                    n_id_buckets: int = 32,
                    centroids: DataFrame | None = None,
                    centroid_id_col: str = "centroid_id") -> dict:
    """Train, assign, and persist as a NEW base generation, then
    atomically publish the ``BASE`` pointer (a rebuild: every
    pre-existing delta is excluded by the staged manifest the instant
    the publish lands — retraining changes the cell space, so old
    assignments must never mix in). ``n_cells`` may change across
    rebuilds (each generation is self-describing); ``n_id_buckets``
    is index-lifetime metadata, immutable once set.

    ``centroids`` (optional, a ``(centroid_id, vector)`` frame —
    broadcast-small by the IVF contract) skips training and freezes
    the coarse quantizer to the given cells: the
    pretrained-quantizer pattern (FAISS ``IndexIVF`` with an
    externally trained ``quantizer``), and what makes the index's
    full CDC lifecycle exactly SQL-oracle-checkable (the
    ``ivf_index_topk`` catalog row). Returns {n_cells, n_vectors}."""
    n_id_buckets = _pin_id_buckets(spark, path, n_id_buckets)
    if centroids is not None:
        cents = sorted(
            (int(r[0]), [float(x) for x in r[1]]) for r in
            centroids.select(centroid_id_col, vec_col).collect())
    else:
        cents = train_centroids(corpus, n_cells, iters, vec_col, id_col,
                                sample_fraction, seed)
    assigned = (cl.assign_clusters(corpus, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int"))
                .select(id_col, vec_col, CELL))
    n = _publish_rebuild(spark, path, "cells", assigned, cents, None,
                         vec_col, id_col, n_id_buckets,
                         {"kind": "ivf", "n_cells": len(cents)})
    return {"n_cells": len(cents), "n_vectors": n}


def build_ivfpq_index(spark: SparkSession, corpus: DataFrame, path: str,
                      dim: int, n_cells: int = 64, m: int = 4,
                      ksub: int = 8, iters: int = 3, pq_iters: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      sample_fraction: float = 1.0, seed: int = 0,
                      n_id_buckets: int = 32,
                      centroids: DataFrame | None = None,
                      centroid_id_col: str = "centroid_id",
                      codebooks=None) -> dict:
    """The serving form of ``pq.ivfpq_topk``: coarse centroids + PQ
    codebooks + a cell-partitioned CODE table (m small ints per
    vector — the raw embeddings are not stored at all, the PQ memory
    win made durable), published as a generation like
    ``build_ivf_index``. Returns {n_cells, m, ksub, n_vectors}.

    ``centroids`` (a ``(centroid_id, vector)`` frame) and
    ``codebooks`` (``pq.Codebooks`` — per-subspace [(cid, vector)]
    lists) optionally skip training and freeze the quantizers — the
    FAISS pretrained-quantizer pattern, and what makes the persisted
    index's CDC lifecycle exactly SQL-oracle-checkable (the
    ``ivfpq_index_topk`` catalog row)."""
    from cdc_data_pipeline_spark.operators import pq

    n_id_buckets = _pin_id_buckets(spark, path, n_id_buckets)
    if centroids is not None:
        cents = sorted(
            (int(r[0]), [float(x) for x in r[1]]) for r in
            centroids.select(centroid_id_col, vec_col).collect())
    else:
        cents = train_centroids(corpus, n_cells, iters, vec_col, id_col,
                                sample_fraction, seed)
    if codebooks is not None:
        books = codebooks
    else:
        train = corpus if sample_fraction >= 1.0 else \
            hash_sample(corpus, sample_fraction, id_col, seed=seed,
                        fast=True)
        books = pq.train_pq_codebooks(train, dim, m, ksub, pq_iters,
                                      vec_col, id_col, seed)
    assigned = (cl.assign_clusters(corpus, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int")))
    encoded = pq.pq_encode(assigned, books, dim, vec_col, id_col,
                           keep_cols=(CELL,))
    n = _publish_rebuild(spark, path, "codes", encoded, cents, books,
                         vec_col, id_col, n_id_buckets,
                         {"kind": "ivfpq", "n_cells": len(cents),
                          "m": m, "ksub": ksub, "dim": dim})
    return {"n_cells": len(cents), "m": m, "ksub": ksub, "n_vectors": n}


def _pin_id_buckets(spark: SparkSession, path: str, requested: int) -> int:
    """The ids side table's bucket modulus must agree between every
    writer and reader for the life of the index (like the text
    index's n_buckets) — the FIRST build pins it; later builds reuse
    the pinned value."""
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is not None:
        return int(json.loads(txt).get("n_id_buckets", requested))
    return requested


def _publish_rebuild(spark: SparkSession, path: str, table: str,
                     rows: DataFrame, cents, books, vec_col: str,
                     id_col: str, n_id_buckets: int, meta: dict) -> int:
    rows = rows.localCheckpoint(eager=True)  # one assignment/encode pass
    cur = lsm.current_base_name(spark, path,
                                legacy_probe=("cells", "codes"),
                                legacy_name=".")
    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    _write_centroids(spark, new, cents, vec_col)
    if books is not None:
        _write_codebooks(spark, new, books)
    _write_root(spark, new, table, rows, id_col, n_id_buckets)
    stale = lsm.rebuild_manifest(spark, path, new)
    fsutil.write_text(spark, path_join(path, "meta.json"),
                      json.dumps({**meta, "n_id_buckets": n_id_buckets}))
    gc = lsm.rebuild_gc_list(spark, path, cur, stale)
    keep = {new_name} | ({cur} if cur else set())
    lsm.publish_base(spark, path, new_name, keep, gc,
                     legacy_tables=_LEGACY_TABLES)
    return rows.count()


def _write_codebooks(spark: SparkSession, root: str, books) -> None:
    rows = [(s, cid, [float(x) for x in v])
            for s, cb in enumerate(books) for cid, v in cb]
    spark.createDataFrame(rows, "sub int, cid int, vector array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(path_join(root, "codebooks"))


# ------------------------------------------------------------- query

def _assign_queries(queries: DataFrame, cent_df: DataFrame, nprobe: int,
                    vec_col: str, id_col: str) -> DataFrame:
    """Top-``nprobe`` cells per query by centroid cosine (broadcast
    join + rank window — query batches are small by construction)."""
    c = F.broadcast(cent_df.select(CELL, F.col(vec_col).alias("__centv")))
    scored = (queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("__qv"))
              .join(c, F.lit(True))
              .withColumn("__sim", F.round(cosine("__qv", "__centv"), 9)))
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(),
                                               F.col(CELL).asc())
    return (scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= nprobe)
            .select("query_id", "__qv", CELL))


def query_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                    k: int = 5, nprobe: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Top-k per query over the persisted index, touching only probed
    cell partitions of the resolved generation + its admitted deltas.
    READ-ONLY and SNAPSHOT-CONSISTENT alongside maintenance (pointer
    resolved once; immutable roots; one-generation GC grace).

    The probed cell set (<= n_queries * nprobe ids, driver-side and
    tiny) becomes a static IN-filter, so every root's scan prunes
    unprobed directories before any file is opened; the tombstone
    kill set is pruned by the SAME cell list (a kill only matters for
    a copy that can otherwise surface). Output matches
    ``similarity.ivf_topk``'s shape (query_id, neighbor_id, cos,
    rank)."""
    from cdc_data_pipeline_spark.operators.similarity import _rank_topk

    _, base_root, pairs = _resolve(spark, path)
    cent_df = spark.read.parquet(path_join(base_root, "centroids"))
    probes = _assign_queries(queries, cent_df, nprobe, vec_col, id_col)
    cell_ids = [r[0] for r in probes.select(CELL).distinct().collect()]

    cells = lsm.read_union_tagged(spark, pairs, "cells", CELL, cell_ids)
    if cells is None:
        idt = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"query_id {idt}, neighbor_id {idt}, cos double, rank int")
    kills = lsm.kills(spark, pairs, id_col, "cid", cell_ids)
    cells = lsm.visible(cells, kills, id_col)
    scored = (cells.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("__cv"), CELL)
              .join(F.broadcast(probes), CELL)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
              .select("query_id", "neighbor_id", "cos"))
    # skew-safe final ranking (map-local cut before the rank window —
    # a hot probed cell never lands whole in one window task)
    return _rank_topk(scored, k, "query_id")


def load_codebooks(spark: SparkSession, path: str):
    """The published generation's codebooks in ``pq.Codebooks`` form
    (sorted, exact floats)."""
    _, base_root, _ = _resolve(spark, path)
    rows = spark.read.parquet(path_join(base_root, "codebooks")).collect()
    m = 1 + max(r["sub"] for r in rows)
    books = [[] for _ in range(m)]
    for r in sorted(rows, key=lambda r: (r["sub"], r["cid"])):
        books[r["sub"]].append((int(r["cid"]),
                                [float(x) for x in r["vector"]]))
    return books


def query_ivfpq_index(spark: SparkSession, path: str, queries: DataFrame,
                      dim: int, k: int = 5, nprobe: int = 2,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """ADC top-k over the persisted code table, touching only probed
    cell partitions of the resolved snapshot (same read protocol and
    kill-set pruning as ``query_ivf_index``). Output matches
    ``pq.ivfpq_topk``'s shape (query_id, neighbor_id, dist_sq, rank);
    ranking goes through the shared map-local cut."""
    from cdc_data_pipeline_spark.operators import pq

    _, base_root, pairs = _resolve(spark, path)
    cent_df = spark.read.parquet(path_join(base_root, "centroids"))
    rows = spark.read.parquet(path_join(base_root, "codebooks")).collect()
    m = 1 + max(r["sub"] for r in rows)
    books = [[] for _ in range(m)]
    for r in sorted(rows, key=lambda r: (r["sub"], r["cid"])):
        books[r["sub"]].append((int(r["cid"]),
                                [float(x) for x in r["vector"]]))
    probes = (_assign_queries(queries, cent_df, nprobe, vec_col, id_col)
              .withColumnRenamed("__qv", vec_col)
              .withColumn("__qp", F.concat_ws(
                  "#", F.col("query_id"), F.col(CELL))))
    cell_ids = [r[0] for r in probes.select(CELL).distinct().collect()]
    codes = lsm.read_union_tagged(spark, pairs, "codes", CELL, cell_ids)
    if codes is None:
        idt = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"query_id {idt}, neighbor_id {idt}, dist_sq double, "
                f"rank int")
    kills = lsm.kills(spark, pairs, id_col, "cid", cell_ids)
    codes = (lsm.visible(codes, kills, id_col)
             .select(F.col(id_col).alias("neighbor_id"), CELL,
                     F.posexplode("codes").alias("sub", "cid")))
    # one ADC table row set per (query, probed cell): the composite
    # string key rides through the table build, then the join back to
    # probes recovers the TYPED query id and cell
    dtab = (pq.adc_distance_table(probes.select("__qp", vec_col),
                                  books, dim, vec_col, "__qp", "__qp")
            .join(probes.select("__qp", "query_id", CELL), "__qp")
            .drop("__qp"))
    scored = (codes.join(F.broadcast(dtab), [CELL, "sub", "cid"])
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("dl").alias("__dl")))
    return pq._rank_adc(scored, k, "query_id")


def read_index_rows(spark: SparkSession, path: str) -> DataFrame:
    """Every VISIBLE row of the published snapshot (id, payload,
    cell) — the CDC-aware way to inspect index contents (a raw
    parquet read of one root would see dead copies and miss
    deltas)."""
    _, _, pairs = _resolve(spark, path)
    table = "codes" if _meta(spark, path)["kind"] == "ivfpq" else "cells"
    rows = lsm.read_union_tagged(spark, pairs, table)
    if rows is None:
        raise FileNotFoundError(f"ANN index has no data rows: {path}")
    return lsm.visible(rows, lsm.kills(spark, pairs,
                                       _id_col_of(rows)), _id_col_of(rows))


def _id_col_of(rows: DataFrame) -> str:
    fixed = {CELL, "embedding", "codes", "__root"}
    return next(c for c in rows.columns if c not in fixed)


# -------------------------------------------- incremental maintenance

def append_to_ivf_index(spark: SparkSession, path: str, batch: DataFrame,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> dict:
    """CDC-shape insert: assign a NEW vector batch against the
    published generation's centroids and commit it as ONE delta
    directory — no retrain, no rewrite of any existing file. The
    standard serving trade-off applies and is the caller's contract:
    cells drift as the corpus distribution drifts; rebuild when
    recall degrades.

    IDEMPOTENT under at-least-once redelivery at EVERY crash point:
    the content digest of the (deduped) batch names the delta
    directory; a replay after full commit sees the marker and no-ops,
    and a replay after a partial write overwrites the same directory
    — uncommitted directories are invisible. Ids already VISIBLE in
    the index are anti-joined away reading only the batch's own
    id-hash buckets of the ids side tables (an id whose only copies
    are tombstoned counts as absent — a deleted vector is
    legitimately re-insertable). Returns {appended, batch}."""
    return _mutate(spark, path, batch, None, vec_col, id_col, kind="b")


def append_to_ivfpq_index(spark: SparkSession, path: str, batch: DataFrame,
                          dim: int, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> dict:
    """Same insert shape for the IVF-PQ index: encode the new batch
    with the PUBLISHED codebooks (codes stay comparable with every
    existing code row — retraining books would silently corrupt old
    codes) and commit one delta. Idempotent like
    ``append_to_ivf_index``. Returns {appended, batch}."""
    return _mutate(spark, path, batch, dim, vec_col, id_col, kind="b")


def upsert_into_ivf_index(spark: SparkSession, path: str, batch: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> dict:
    """CDC upsert (latest wins): every vector in the batch becomes the
    LIVE version — ids already visible have their prior copy
    tombstoned, even when the new embedding assigns to a DIFFERENT
    cell (the ids side table finds the victim's cell in O(batch)).
    One delta commits atomically with the batch's rows, its ids rows,
    and a ``tombstones`` table naming each victim as (id, root),
    partitioned by the VICTIM's cell so queries prune it with their
    probed-cell list. Idempotent like append (op-prefixed digest;
    victims recomputed from committed roots only). Returns
    {upserted, replaced, batch}."""
    return _mutate(spark, path, batch, None, vec_col, id_col, kind="u")


def upsert_into_ivfpq_index(spark: SparkSession, path: str,
                            batch: DataFrame, dim: int,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> dict:
    """Latest-wins upsert for the IVF-PQ index (see
    ``upsert_into_ivf_index``); the replacement rows are encoded with
    the published codebooks. Returns {upserted, replaced, batch}."""
    return _mutate(spark, path, batch, dim, vec_col, id_col, kind="u")


def delete_from_ivf_index(spark: SparkSession, path: str, ids: DataFrame,
                          id_col: str = "vec_id") -> dict:
    """CDC delete: tombstone the visible copies of ``ids`` (an
    id-only frame) in one committed delta — no data rewrite anywhere.
    Works identically for both index forms (the delta carries only
    tombstones). Ids not present are ignored. Returns
    {deleted, batch}."""
    meta = _meta(spark, path)
    table = "codes" if meta["kind"] == "ivfpq" else "cells"
    n_ib = int(meta["n_id_buckets"])
    ids0 = ids.select(id_col).distinct().localCheckpoint(eager=True)
    _, base_root, pairs = _resolve(spark, path)
    token = lsm.salt_past_manifest(
        spark, base_root, lsm.content_token(ids0, [id_col], "d"))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"deleted": 0, "batch": token}
    ibs = [r[0] for r in ids0.select(
        _ib(F.col(id_col), n_ib).alias("ib")).distinct().collect()]
    vis = _visible_id_cells(spark, pairs, ibs, id_col, table)
    victims = None
    n_kill = 0
    if vis is not None:
        victims = vis.join(ids0, id_col).localCheckpoint(eager=True)
        n_kill = victims.count()
    if n_kill == 0:
        # nothing visible matched: commit nothing. The marker's only
        # job is replay idempotency and replaying a no-op delete is
        # itself a no-op (foreachBatch never redelivers a batch older
        # than a later committed one, so the marker never needs to
        # fence a later re-insert). Without this, every no-op delete
        # added a tombstone-less delta dir until the next compact —
        # unbounded read amplification for streams that delete ids
        # that may not exist.
        fsutil.delete(spark, ddir)  # clears a crashed partial stage
        return {"deleted": 0, "batch": token}
    lsm.write_tombstones(spark, ddir,
                         victims.select(id_col, "__root", "cid"),
                         id_col, F.col("cid").alias("cid"))
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"deleted": n_kill, "batch": token}


delete_from_ivfpq_index = delete_from_ivf_index


def _mutate(spark: SparkSession, path: str, batch: DataFrame,
            dim: int | None, vec_col: str, id_col: str,
            kind: str) -> dict:
    """Shared insert/upsert delta commit for both index forms
    (``dim`` non-None selects the IVF-PQ encode path)."""
    meta = _meta(spark, path)
    table = "codes" if meta["kind"] == "ivfpq" else "cells"
    n_ib = int(meta["n_id_buckets"])
    batch0 = _dedup_batch(batch, vec_col, id_col).localCheckpoint(eager=True)
    _, base_root, pairs = _resolve(spark, path)
    token = lsm.salt_past_manifest(
        spark, base_root,
        lsm.content_token(batch0, [id_col, vec_col], kind))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"appended": 0, "batch": token} if kind == "b" else \
            {"upserted": 0, "replaced": 0, "batch": token}
    ibs = [r[0] for r in batch0.select(
        _ib(F.col(id_col), n_ib).alias("ib")).distinct().collect()]
    vis = _visible_id_cells(spark, pairs, ibs, id_col, table)

    if kind == "b":
        fresh = batch0 if vis is None else \
            batch0.join(vis.select(id_col), id_col, "left_anti") \
                  .localCheckpoint(eager=True)
        rows = _assign_encode(spark, base_root, fresh, dim, vec_col,
                              id_col, meta)
        _write_root(spark, ddir, table, rows, id_col, n_ib)
        fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
        return {"appended": fresh.count(), "batch": token}

    victims = None
    n_kill = 0
    if vis is not None:
        victims = vis.join(batch0.select(id_col), id_col) \
            .localCheckpoint(eager=True)
        n_kill = victims.count()
    rows = _assign_encode(spark, base_root, batch0, dim, vec_col,
                          id_col, meta)
    _write_root(spark, ddir, table, rows, id_col, n_ib)
    if n_kill:
        lsm.write_tombstones(spark, ddir,
                             victims.select(id_col, "__root", "cid"),
                             id_col, F.col("cid").alias("cid"))
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"upserted": batch0.count(), "replaced": n_kill, "batch": token}


def _assign_encode(spark: SparkSession, base_root: str, rows: DataFrame,
                   dim: int | None, vec_col: str, id_col: str,
                   meta: dict) -> DataFrame:
    """Assign (and for IVF-PQ, encode) a batch against the PUBLISHED
    generation's centroids/codebooks — the centroid read is n_cells
    rows; the assignment is a literal-centroid projection."""
    from cdc_data_pipeline_spark.operators.similarity import collect_cents

    cent_df = spark.read.parquet(path_join(base_root, "centroids"))
    cents, _ = collect_cents(cent_df, vec_col, CELL)
    assigned = (cl.assign_clusters(rows, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int")))
    if dim is None:
        return assigned.select(id_col, vec_col, CELL)
    from cdc_data_pipeline_spark.operators import pq

    books_rows = spark.read.parquet(
        path_join(base_root, "codebooks")).collect()
    m = 1 + max(r["sub"] for r in books_rows)
    books = [[] for _ in range(m)]
    for r in sorted(books_rows, key=lambda r: (r["sub"], r["cid"])):
        books[r["sub"]].append((int(r["cid"]),
                                [float(x) for x in r["vector"]]))
    return pq.pq_encode(assigned, books, dim, vec_col, id_col,
                        keep_cols=(CELL,))


def retrain_ivf_index(spark: SparkSession, path: str,
                      n_cells: int | None = None, iters: int = 3,
                      seed: int = 0,
                      vec_col: str = "embedding") -> dict:
    """Drift response for the raw-vector IVF form — compact + retrain
    in ONE publish: read the VISIBLE (id, vector) set from the
    published snapshot (base + admitted deltas, tombstones resolved),
    train FRESH centroids on it, and publish as a rebuild (the staged
    manifest excludes every delta — their rows are already inside the
    new generation, re-assigned in the new cell space). The standard
    answer when appended batches have drifted the distribution and
    recall degraded: cells re-balance around the corpus as it is NOW.
    Exactly equivalent to ``build_ivf_index`` over the net corpus with
    the same (n_cells, iters, seed) — k-means init is content-hashed,
    not order-dependent — which the test pins.

    ``n_cells`` defaults to the current generation's cell count.
    IVF-PQ cannot retrain in place (codes are not invertible back to
    vectors); rebuild it from the source corpus instead."""
    meta = _meta(spark, path)
    if meta["kind"] != "ivf":
        raise ValueError(
            f"retrain needs stored raw vectors; index at {path} is "
            f"{meta['kind']!r} (codes are not invertible) — rebuild "
            f"from the source corpus instead")
    _, base_root, pairs = _resolve(spark, path)
    rows0 = lsm.read_union_tagged(spark, pairs, "cells")
    if rows0 is None:
        raise FileNotFoundError(f"no cells table at {path}")
    id_col = _id_col_of(rows0)
    rows = (lsm.visible(rows0, lsm.kills(spark, pairs, id_col), id_col)
            .select(id_col, vec_col).localCheckpoint(eager=True))
    if n_cells is None:
        n_cells = spark.read.parquet(
            path_join(base_root, "centroids")).count()
    return build_ivf_index(spark, rows, path, n_cells=n_cells,
                           iters=iters, vec_col=vec_col, id_col=id_col,
                           seed=seed)


def compact_ann_index(spark: SparkSession, path: str) -> dict:
    """Offline maintenance for either index form: fold the current
    base + committed deltas into a NEW generation (resolving all
    tombstones — killed copies are dropped and the new generation
    carries no tombstones at all), carry the centroids/codebooks
    forward UNCHANGED (the cell space must stay consistent with every
    folded row), atomically publish, and garbage-collect with the
    one-generation grace. Also the migration path for a legacy
    pre-pointer index: the first compact publishes generation 0, the
    second garbage-collects the legacy root-level tables. Returns
    {n_vectors, compacted_deltas}."""
    meta = _meta(spark, path)
    table = "codes" if meta["kind"] == "ivfpq" else "cells"
    n_ib = int(meta["n_id_buckets"])
    cur_name, base_root, pairs = _resolve(spark, path)
    deltas = lsm.committed_deltas(spark, path, base_root)
    rows0 = lsm.read_union_tagged(spark, pairs, table)
    id_col = _id_col_of(rows0) if rows0 is not None else "vec_id"
    kills = lsm.kills(spark, pairs, id_col)
    rows = lsm.visible(rows0, kills, id_col)
    if rows is not None:
        rows = rows.localCheckpoint(eager=True)

    cent_df = spark.read.parquet(path_join(base_root, "centroids"))
    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    cent_df.coalesce(1).write.mode("overwrite") \
        .parquet(path_join(new, "centroids"))
    if fsutil.exists(spark, path_join(base_root, "codebooks")):
        spark.read.parquet(path_join(base_root, "codebooks")) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(path_join(new, "codebooks"))
    _write_root(spark, new, table, rows, id_col, n_ib)
    # a legacy index has no meta.json yet: write one so every later
    # reader prunes with the modulus this fold just wrote
    if fsutil.read_text(spark, path_join(path, "meta.json")) is None:
        fsutil.write_text(spark, path_join(path, "meta.json"),
                          json.dumps({**meta, "n_id_buckets": n_ib}))
    carried = lsm.compact_manifest(spark, path, base_root, new, deltas)
    lsm.publish_base(spark, path, new_name, {new_name, cur_name},
                     carried, legacy_tables=_LEGACY_TABLES,
                     expect_ptr=lsm.expected_ptr(cur_name))
    return {"n_vectors": rows.count() if rows is not None else 0,
            "compacted_deltas": len(deltas)}
