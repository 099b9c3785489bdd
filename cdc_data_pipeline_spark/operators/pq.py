"""Product quantization (PQ) for embedding search at corpus scale.

Jegou et al. 2011 ("Product Quantization for Nearest Neighbor
Search"): split each ``dim``-vector into ``m`` contiguous subvectors,
k-means each subspace into ``ksub`` centroids, and store a vector as
its ``m`` centroid ids — ``m`` small ints instead of ``dim`` floats
(64-dim float → 4-byte codes at m=4/ksub<=256: a 64x shrink). Query
scoring is ADC (asymmetric distance computation): the query precomputes
its distance to every (subspace, centroid) once, and each corpus
vector's distance is just ``m`` table lookups + adds.

Why this is THE 100 TB shape (complements IVF in
``operators/similarity.py:65`` and hyperplane LSH at
``similarity.py:141``):
- The corpus-side scan touches ONLY the code table (m ints per
  vector) — the raw embeddings are never re-read after encoding.
- Corpus-side query work has NO per-dimension float math: the
  distance table (n_queries * m * ksub rows — kilobytes) is
  broadcast, the scan is a lookup join + a map-side partially
  aggregated integer sum. Per (query, vector) cost drops from
  ``dim`` float ops to ``m`` integer adds.
- Encoding is a pure projection against plan-literal centroids (the
  same no-join/no-shuffle shape as ``clustering.assign_clusters``).

Determinism (what makes an exact SQL oracle possible — same contract
as ``operators/clustering.py``): per-subspace k-means reuses the
hash-min init / 6dp-rounded distance / lowest-id tiebreak machinery of
``clustering``; ADC cell distances are rounded to integer micro-units
(1e-6) so the per-vector sum is exact 64-bit integer arithmetic —
no float summation-order drift, and ranking compares integers.

Reference parity: the reference engine has no PQ; this extends its
vector-search surface (SURVEY §2.9) the way a production
training-data pipeline needs at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.clustering import _argmin_cluster

Codebooks = list[list[tuple[int, list[float]]]]   # [subspace][cid] -> centroid


def _slice(vec_col: str, sub: int, d_sub: int) -> F.Column:
    return F.slice(F.col(vec_col), sub * d_sub + 1, d_sub)


def train_pq_codebooks(df: DataFrame, dim: int, m: int = 4, ksub: int = 8,
                       iters: int = 2, vec_col: str = "embedding",
                       id_col: str = "vec_id", seed: int = 0) -> Codebooks:
    """Per-subspace deterministic k-means (hash-min init, ``iters``
    assignment rounds), with every subspace trained in the SAME Spark
    jobs: one corpus pass elects all m inits, and one pass per Lloyd
    iteration recomputes all m codebooks (exploded (subspace, cluster,
    pos) keys, map-side combined) — 1 + (iters-1) scans total instead
    of m * iters. Values are bit-identical to training each subspace
    alone (same per-subspace ``seed + s`` hash init, same 6dp-rounded
    argmin / means), so the SQL oracle is unchanged. Training traffic
    stays m * ksub * d_sub scalars — independent of corpus size.
    """
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    d_sub = dim // m
    from cdc_data_pipeline_spark.functions.hashing import uniform_hash

    # joint init: per subspace, the ksub smallest (hash, id); cluster
    # id = rank in that order (exactly clustering.init_centroids)
    slices = df.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("s"),
                 uniform_hash(id_col, seed + s).alias("u"),
                 F.col(id_col).alias("i"),
                 _slice(vec_col, s, d_sub).alias("v"))
        for s in range(m)])).alias("x")).select("x.s", "x.u", "x.i", "x.v")
    w = Window.partitionBy("s").orderBy(F.col("u").asc(), F.col("i").asc())
    top = (slices.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= ksub).collect())
    books: Codebooks = [[] for _ in range(m)]
    for r in sorted(top, key=lambda r: (r["s"], r["rn"])):
        books[r["s"]].append((r["rn"] - 1, [float(x) for x in r["v"]]))

    for _ in range(iters - 1):
        # joint recompute: one scan assigns every subspace (plan-literal
        # argmin, no shuffle) and aggregates all m codebooks' means
        parts = []
        for s, cents in enumerate(books):
            v = _slice(vec_col, s, d_sub)
            parts.append(F.struct(F.lit(s).alias("s"),
                                  _argmin_cluster(v, cents).alias("c"),
                                  v.alias("v")))
        ex = (df.select(F.explode(F.array(*parts)).alias("x"))
              .select("x.s", "x.c", F.posexplode("x.v").alias("pos", "val")))
        rows = (ex.groupBy("s", "c", "pos")
                .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mval"))
                .groupBy("s", "c")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
                .collect())
        books = [[] for _ in range(m)]
        for r in sorted(rows, key=lambda r: (r["s"], r["c"])):
            books[r["s"]].append((int(r["c"]),
                                  [float(e["mval"]) for e in r["pm"]]))
    return books


def pq_encode(df: DataFrame, codebooks: Codebooks, dim: int,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>): nearest centroid id per subspace.

    Pure projection — every centroid is a plan literal, argmin via
    ``least`` over 6dp-rounded distances with lowest-cid tiebreak
    (identical semantics to ``clustering.assign_clusters``). No join,
    no shuffle; whole-stage codegen end to end.
    """
    m = len(codebooks)
    d_sub = dim // m
    code_cols = [
        _argmin_cluster(_slice(vec_col, s, d_sub), cents).cast("int")
        for s, cents in enumerate(codebooks)
    ]
    return df.select(F.col(id_col), F.array(*code_cols).alias("codes"))


def adc_distance_table(queries: DataFrame, codebooks: Codebooks, dim: int,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       query_id_col: str = "query_id") -> DataFrame:
    """(query_id, sub, cid, dl): squared L2 from each query subvector
    to each centroid, in integer micro-units (round(d * 1e6)).

    n_queries * m * ksub rows — broadcast-sized by construction.
    """
    m = len(codebooks)
    d_sub = dim // m
    entries = []
    for s, cents in enumerate(codebooks):
        v = _slice(vec_col, s, d_sub)
        for cid, c in cents:
            # plain (unrounded) squared distance -> micro-units; one
            # ROUND total so the oracle can reproduce it exactly
            arr = F.array(*[F.lit(float(x)) for x in c])
            diffs = F.zip_with(v, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
            d = F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x)
            entries.append(F.struct(
                F.lit(s).alias("sub"), F.lit(cid).alias("cid"),
                F.round(d * 1e6, 0).cast("long").alias("dl")))
    return (queries
            .select(F.col(id_col).alias(query_id_col),
                    F.explode(F.array(*entries)).alias("e"))
            .select(query_id_col, "e.sub", "e.cid", "e.dl"))


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                m: int = 4, ksub: int = 8, k: int = 5, iters: int = 2,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id", seed: int = 0,
                codebooks: Codebooks | None = None) -> DataFrame:
    """Approximate top-k nearest (squared-L2) neighbors via PQ + ADC.

    Plan shape (the part that must survive 100x): the corpus appears
    once, as its code table; per subspace-code row it hash-joins the
    broadcast distance table and partially aggregates a LONG sum keyed
    (query, vector) — map-side combine collapses the m subspace rows
    before the only shuffle. Ranking shuffles one row per (query,
    vector) pair, cut to k per query by integer order (ties to the
    lower neighbor id). Approximate by quantization, deterministic by
    construction -> exact SQL oracle.

    At production scale the code table is materialized once
    (``pq_encode``) and reused across every query batch; pair it with
    IVF cell pruning (``similarity.ivf_topk``) to skip whole
    partitions before the ADC scan.
    """
    books = codebooks if codebooks is not None else train_pq_codebooks(
        corpus, dim, m, ksub, iters, vec_col, id_col, seed)
    # materialize the code table before the ADC join — the production
    # design stores codes once and scans them per query batch; inline,
    # this also stops the broadcast/AQE phases re-deriving the encode
    # projection (m*ksub rounded-fold argmins) several times over
    code_tab = pq_encode(corpus, books, dim, vec_col, id_col) \
        .localCheckpoint(eager=False)
    codes = code_tab.select(F.col(id_col).alias("neighbor_id"),
                            F.posexplode("codes").alias("sub", "cid"))
    dtab = adc_distance_table(queries, books, dim, vec_col, id_col, query_id_col)
    scored = (codes.join(F.broadcast(dtab), ["sub", "cid"])
              .filter(F.col(query_id_col) != F.col("neighbor_id"))
              .groupBy(query_id_col, "neighbor_id")
              .agg(F.sum("dl").alias("__dl")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__dl").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id",
                    F.round(F.col("__dl") / 1e6, 6).alias("dist_sq"), "rank"))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
               dim: int, m: int = 4, ksub: int = 8, k: int = 5,
               iters: int = 2, vec_col: str = "embedding",
               id_col: str = "vec_id", query_id_col: str = "query_id",
               seed: int = 0, codebooks: Codebooks | None = None) -> DataFrame:
    """IVF + PQ composite (the FAISS ``IVFx,PQy`` shape without the
    residual step): coarse-quantize every vector to its nearest cell
    (``similarity.ivf_assign``, broadcast centroids), then ADC-score a
    query ONLY against the code rows of its own cell.

    This is the 100 TB endgame of the ANN family: IVF cell pruning
    cuts the scanned fraction to ~1/n_cells and PQ cuts the per-row
    cost of what remains to ``m`` integer adds — multiplicative wins.
    At production scale the (cell, codes) table is materialized once,
    partitioned by cell, so a query batch touches only its cells'
    partitions; here the cell id rides the broadcast-join key
    (cell, sub, cid), so the corpus still never shuffles and the only
    exchange is the (query, neighbor) partial-sum aggregation.

    Deterministic end to end (9dp-rounded coarse sims with centroid-id
    tiebreak, the ``clustering`` k-means contract for codebooks,
    integer ADC) -> exact SQL oracle.
    """
    from cdc_data_pipeline_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    q_assigned = ivf_assign(queries, centroids, vec_col, id_col) \
        .withColumnRenamed(id_col, query_id_col)
    books = codebooks if codebooks is not None else train_pq_codebooks(
        corpus, dim, m, ksub, iters, vec_col, id_col, seed)
    # materialized (cell, codes) table — see pq_adc_topk
    code_tab = (pq_encode(assigned, books, dim, vec_col, id_col)
                .join(assigned.select(id_col, "centroid_id"), id_col)
                .localCheckpoint(eager=False))
    codes = code_tab.select(F.col(id_col).alias("neighbor_id"), "centroid_id",
                            F.posexplode("codes").alias("sub", "cid"))
    dtab = (adc_distance_table(q_assigned.drop("centroid_id"), books, dim,
                               vec_col, query_id_col, query_id_col)
            .join(q_assigned.select(query_id_col, "centroid_id"),
                  query_id_col))
    scored = (codes.join(F.broadcast(dtab), ["centroid_id", "sub", "cid"])
              .filter(F.col(query_id_col) != F.col("neighbor_id"))
              .groupBy(query_id_col, "neighbor_id")
              .agg(F.sum("dl").alias("__dl")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__dl").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id",
                    F.round(F.col("__dl") / 1e6, 6).alias("dist_sq"), "rank"))
