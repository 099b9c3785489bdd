"""Persisted IVF index: build once, query with partition pruning.

``operators/similarity.ivf_topk`` recomputes the coarse quantization
per query batch — right for one-shot jobs, wrong for a serving corpus
that is written once and queried forever. This module materializes the
index as TABLES:

    <path>/centroids/            k rows (centroid_id, embedding)
    <path>/cells/centroid_id=N/  the corpus, partitioned by cell

so a query batch (1) assigns itself to cells against the broadcast
centroid table, (2) reads ONLY the probed cell partitions — Spark's
partition pruning turns ``WHERE centroid_id IN (...)`` into a
directory-level skip, the disk analogue of FAISS's inverted lists —
and (3) scores within cells. ``nprobe`` trades recall for partitions
touched, the standard IVF knob.

Scale: centroids are trained with the deterministic Lloyd's machinery
from ``operators.clustering`` on a hash-sample (training never needs
the full corpus); the corpus-side assignment is a literal-centroid
projection (no join); the only full-corpus shuffle ever is the
partitioned write itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from cdc_data_pipeline_spark.functions.vectors import cosine
from cdc_data_pipeline_spark.operators import clustering as cl
from cdc_data_pipeline_spark.operators.sampling import hash_sample

CELL = "centroid_id"


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


def build_ivf_index(spark: SparkSession, corpus: DataFrame, path: str,
                    n_cells: int = 64, iters: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_fraction: float = 1.0, seed: int = 0) -> dict:
    """Train, assign, and persist. Returns {n_cells, n_vectors}.

    The cells table is partitioned by ``centroid_id`` so probes prune
    at the directory level; within a cell, files hold (id, embedding)
    only — score-ready without a second lookup.
    """
    cents = train_centroids(corpus, n_cells, iters, vec_col, id_col,
                            sample_fraction, seed)
    cent_rows = [(cid, [float(x) for x in v]) for cid, v in cents]
    cent_df = spark.createDataFrame(
        cent_rows, f"{CELL} int, {vec_col} array<double>")
    cent_df.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids"))

    assigned = (cl.assign_clusters(corpus, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int"))
                .select(id_col, vec_col, CELL))
    assigned.write.mode("overwrite").partitionBy(CELL) \
        .parquet(os.path.join(path, "cells"))
    return {"n_cells": len(cents), "n_vectors": corpus.count()}


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
    cell partitions.

    The probed cell set (<= n_queries * nprobe ids, driver-side and
    tiny) becomes a static IN-filter, so the scan prunes unprobed
    directories before any file is opened. Scoring joins on the cell
    id; output matches ``similarity.ivf_topk``'s shape
    (query_id, neighbor_id, cos, rank).
    """
    from cdc_data_pipeline_spark.operators.similarity import _rank_topk

    cent_df = spark.read.parquet(os.path.join(path, "centroids"))
    probes = _assign_queries(queries, cent_df, nprobe, vec_col, id_col)
    cell_ids = [r[0] for r in probes.select(CELL).distinct().collect()]

    cells = (spark.read.parquet(os.path.join(path, "cells"))
             .filter(F.col(CELL).isin(cell_ids)))
    scored = (cells.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("__cv"), CELL)
              .join(F.broadcast(probes), CELL)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
              .select("query_id", "neighbor_id", "cos"))
    # skew-safe final ranking (map-local cut before the rank window —
    # a hot probed cell never lands whole in one window task)
    return _rank_topk(scored, k, "query_id")


# ------------------------------------------------ persisted IVF-PQ index

def build_ivfpq_index(spark: SparkSession, corpus: DataFrame, path: str,
                      dim: int, n_cells: int = 64, m: int = 4,
                      ksub: int = 8, iters: int = 3, pq_iters: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      sample_fraction: float = 1.0, seed: int = 0) -> dict:
    """The serving form of ``pq.ivfpq_topk``: coarse centroids + PQ
    codebooks + a cell-partitioned CODE table (m small ints per
    vector — the raw embeddings are not stored at all, the PQ memory
    win made durable):

        <path>/centroids/            n_cells rows (centroid_id, embedding)
        <path>/codebooks/            m*ksub rows (sub, cid, vector)
        <path>/codes/centroid_id=N/  (id, codes array<int>) per cell

    A query batch probes nprobe cells (directory-level partition
    pruning), broadcasts its integer ADC table, and scans only probed
    cells' code rows. Training runs on a hash-sample; the only
    full-corpus work is one encode projection + the partitioned write.
    """
    from cdc_data_pipeline_spark.operators import pq

    cents = train_centroids(corpus, n_cells, iters, vec_col, id_col,
                            sample_fraction, seed)
    cent_rows = [(cid, [float(x) for x in v]) for cid, v in cents]
    spark.createDataFrame(cent_rows, f"{CELL} int, {vec_col} array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids"))

    train = corpus if sample_fraction >= 1.0 else \
        hash_sample(corpus, sample_fraction, id_col, seed=seed, fast=True)
    books = pq.train_pq_codebooks(train, dim, m, ksub, pq_iters,
                                  vec_col, id_col, seed)
    book_rows = [(s, cid, [float(x) for x in v])
                 for s, cb in enumerate(books) for cid, v in cb]
    spark.createDataFrame(book_rows, "sub int, cid int, vector array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "codebooks"))

    assigned = (cl.assign_clusters(corpus, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int")))
    (pq.pq_encode(assigned, books, dim, vec_col, id_col, keep_cols=(CELL,))
       .write.mode("overwrite").partitionBy(CELL)
       .parquet(os.path.join(path, "codes")))
    return {"n_cells": len(cents), "m": m, "ksub": ksub,
            "n_vectors": corpus.count()}


def load_codebooks(spark: SparkSession, path: str):
    """Codebooks back in ``pq.Codebooks`` form (sorted, exact floats)."""
    rows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    m = 1 + max(r["sub"] for r in rows)
    books = [[] for _ in range(m)]
    for r in sorted(rows, key=lambda r: (r["sub"], r["cid"])):
        books[r["sub"]].append((int(r["cid"]), [float(x) for x in r["vector"]]))
    return books


def query_ivfpq_index(spark: SparkSession, path: str, queries: DataFrame,
                      dim: int, k: int = 5, nprobe: int = 2,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """ADC top-k over the persisted code table, touching only probed
    cell partitions. Output matches ``pq.ivfpq_topk``'s shape
    (query_id, neighbor_id, dist_sq, rank); ranking goes through the
    shared map-local cut."""
    from cdc_data_pipeline_spark.operators import pq

    cent_df = spark.read.parquet(os.path.join(path, "centroids"))
    books = load_codebooks(spark, path)
    probes = (_assign_queries(queries, cent_df, nprobe, vec_col, id_col)
              .withColumnRenamed("__qv", vec_col)
              .withColumn("__qp", F.concat_ws(
                  "#", F.col("query_id"), F.col(CELL))))
    cell_ids = [r[0] for r in probes.select(CELL).distinct().collect()]
    codes = (spark.read.parquet(os.path.join(path, "codes"))
             .filter(F.col(CELL).isin(cell_ids))
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


# -------------------------------------------- incremental index maintenance

def append_to_ivf_index(spark: SparkSession, path: str, batch: DataFrame,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> dict:
    """CDC-shape index maintenance: assign a NEW vector batch against
    the STORED centroids and append its rows to the cell partitions —
    no retrain, no rewrite of existing cells (dynamic partition
    overwrite is deliberately not used: append mode only ever adds
    files). The standard serving trade-off applies and is the
    caller's contract: cells drift as the corpus distribution drifts;
    rebuild (``build_ivf_index``) when recall degrades.

    Touches only the batch's own cells' directories; the centroid read
    is n_cells rows.

    IDEMPOTENT: before appending, the batch anti-joins on id against
    the existing rows of ITS OWN target cells, so a replayed batch
    (foreachBatch is at-least-once — a crash between the parquet
    commit and the streaming checkpoint re-delivers the batch) or a
    re-sent CDC row appends nothing the second time. The dedup scan
    reads only the touched cells' partitions."""
    return _append_assigned(spark, path, batch, "cells", vec_col, id_col,
                            encode=None)


def append_to_ivfpq_index(spark: SparkSession, path: str, batch: DataFrame,
                          dim: int, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> dict:
    """Same maintenance shape for the IVF-PQ index: encode the new
    batch with the STORED codebooks (codes stay comparable with every
    existing code row — retraining books would silently corrupt old
    codes) and append to the probed cell partitions. Idempotent under
    replay like ``append_to_ivf_index``."""
    from cdc_data_pipeline_spark.operators import pq

    books = load_codebooks(spark, path)

    def encode(assigned: DataFrame) -> DataFrame:
        return pq.pq_encode(assigned, books, dim, vec_col, id_col,
                            keep_cols=(CELL,))

    return _append_assigned(spark, path, batch, "codes", vec_col, id_col,
                            encode=encode)


def _append_assigned(spark: SparkSession, path: str, batch: DataFrame,
                     table: str, vec_col: str, id_col: str,
                     encode) -> dict:
    from cdc_data_pipeline_spark.operators.similarity import collect_cents

    cent_df = spark.read.parquet(os.path.join(path, "centroids"))
    cents, _ = collect_cents(cent_df, vec_col, CELL)
    assigned = (cl.assign_clusters(batch, cents, vec_col, id_col)
                .withColumn(CELL, F.col("cluster").cast("int")))
    rows = encode(assigned) if encode is not None else \
        assigned.select(id_col, vec_col, CELL)
    # replay/redelivery dedup: drop ids already present in the target
    # cells (reads only the touched partitions), then pin ONCE so the
    # count and the write don't each re-run the batch's lineage
    cell_ids = [r[0] for r in rows.select(CELL).distinct().collect()]
    # bootstrap: an index built over an empty/zero-partition corpus
    # leaves cells|codes without part files — treat an unreadable
    # table as "no existing rows" (mirrors text_index._read_union)
    try:
        existing = (spark.read.parquet(os.path.join(path, table))
                    .filter(F.col(CELL).isin(cell_ids)).select(id_col))
        fresh = rows.join(existing, id_col, "left_anti")
    except AnalysisException:
        fresh = rows.select(*rows.columns)
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy(CELL) \
            .parquet(os.path.join(path, table))
    return {"appended": n}
