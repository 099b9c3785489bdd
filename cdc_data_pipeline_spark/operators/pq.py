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

from cdc_data_pipeline_spark.functions.vectors import lit_id_vector_array
from cdc_data_pipeline_spark.operators.clustering import _argmin_cluster
from cdc_data_pipeline_spark.operators.sampling import group_topk, local_topk_cut

Codebooks = list[list[tuple[int, list[float]]]]   # [subspace][cid] -> centroid


def _rank_adc(scored: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Skew-safe final ADC ranking shared by ``pq_adc_topk`` and
    ``ivfpq_topk``: a map-local cut keeps k survivors per query per
    Arrow batch before the exact rank window, so a per-query window
    partition holds k * batches rows — never the corpus's full
    (query, vector) score set. ``scored`` is
    (query_id, neighbor_id, __dl)."""
    partial = local_topk_cut(scored, [query_id_col], k,
                             [("__dl", True), ("neighbor_id", True)])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__dl").asc(), F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id",
                    F.round(F.col("__dl") / 1e6, 6).alias("dist_sq"), "rank"))


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
    # id = rank in that order (exactly clustering.init_centroids).
    # Elected via group_topk over SCALARS ONLY — the hash depends on
    # (id, seed+s), never on the vector, so the election explodes
    # (s, u, id) triples and the map-local cut keeps ksub rows per
    # subspace per Arrow batch (the old bare partitionBy("s") window
    # funneled the WHOLE exploded corpus — vectors included — into m
    # tasks: a full corpus sort at 100x). The winners' vectors come
    # from one second scan pruned to <= m*ksub ids (pushed-down IN
    # filter), sliced driver-side with the same _slice offsets.
    ids = df.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("s"),
                 uniform_hash(id_col, seed + s).alias("u"),
                 F.col(id_col).alias("i"))
        for s in range(m)])).alias("x")).select("x.s", "x.u", "x.i")
    top = group_topk(ids, ["s"], ksub,
                     [("u", True), ("i", True)], rank_col="rn").collect()
    elected = sorted({r["i"] for r in top})
    vecs = {r[0]: [float(x) for x in r[1]] for r in
            df.filter(F.col(id_col).isin(elected))
              .select(id_col, vec_col).collect()}
    books: Codebooks = [[] for _ in range(m)]
    for r in sorted(top, key=lambda r: (r["s"], r["rn"])):
        s = r["s"]
        books[s].append((r["rn"] - 1,
                         vecs[r["i"]][s * d_sub:(s + 1) * d_sub]))

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
              vec_col: str = "embedding", id_col: str = "vec_id",
              keep_cols: Sequence[str] = ()) -> DataFrame:
    """(id, *keep_cols, codes array<int>): nearest centroid id per
    subspace.

    Pure projection — every centroid is a plan literal, argmin via
    ``array_min`` over 6dp-rounded distances with lowest-cid tiebreak
    (identical semantics to ``clustering.assign_clusters``). No join,
    no shuffle; whole-stage codegen end to end. ``keep_cols`` carries
    payload columns (e.g. an IVF cell id) through the projection so
    callers never need a self-join to re-attach them.
    """
    m = len(codebooks)
    d_sub = dim // m
    code_cols = [
        _argmin_cluster(_slice(vec_col, s, d_sub), cents).cast("int")
        for s, cents in enumerate(codebooks)
    ]
    return df.select(F.col(id_col), *[F.col(c) for c in keep_cols],
                     F.array(*code_cols).alias("codes"))


def adc_distance_table(queries: DataFrame, codebooks: Codebooks, dim: int,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       query_id_col: str = "query_id") -> DataFrame:
    """(query_id, sub, cid, dl): squared L2 from each query subvector
    to each centroid, in integer micro-units (round(d * 1e6)).

    n_queries * m * ksub rows — broadcast-sized by construction.
    """
    m = len(codebooks)
    d_sub = dim // m
    # one transform-fold per SUBSPACE (not per centroid): the codebook
    # rides as a literal array of (cid, vector) structs and the
    # distance lambda runs over it at runtime — m fold expressions in
    # the plan instead of m * ksub (see _argmin_cluster for why this
    # matters: plan compile was the PQ family's dominant fixed cost).
    # Per-element arithmetic is unchanged: plain (unrounded) squared
    # distance -> micro-units with ONE round, oracle-exact.
    per_sub = []
    for s, cents in enumerate(codebooks):
        v = _slice(vec_col, s, d_sub)
        carr = lit_id_vector_array(cents, "INT")
        # single-arg lambda: pyspark would bind a second parameter to
        # the array index, not a default; transform builds the
        # expression eagerly so capturing the loop's s/v is safe
        per_sub.append(F.transform(
            carr,
            lambda e: F.struct(
                F.lit(s).alias("sub"), e["c"].alias("cid"),
                F.round(F.aggregate(
                    F.zip_with(v, e["v"],
                               lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                    F.lit(0.0), lambda a, x: a + x) * 1e6, 0)
                 .cast("long").alias("dl"))))
    return (queries
            .select(F.col(id_col).alias(query_id_col),
                    F.explode(F.flatten(F.array(*per_sub))).alias("e"))
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
    return _rank_adc(scored, k, query_id_col)


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
               dim: int, m: int = 4, ksub: int = 8, k: int = 5,
               iters: int = 2, vec_col: str = "embedding",
               id_col: str = "vec_id", query_id_col: str = "query_id",
               seed: int = 0, codebooks: Codebooks | None = None,
               residual: bool = False, nprobe: int = 1) -> DataFrame:
    """IVF + PQ composite (the FAISS ``IVFx,PQy`` shape):
    coarse-quantize every vector to its nearest cell
    (``similarity.ivf_assign``, collected centroids), then ADC-score a
    query ONLY against the code rows of its own cell.

    This is the 100 TB endgame of the ANN family: IVF cell pruning
    cuts the scanned fraction to ~1/n_cells and PQ cuts the per-row
    cost of what remains to ``m`` integer adds — multiplicative wins.
    At production scale the (cell, codes) table is materialized once,
    partitioned by cell, so a query batch touches only its cells'
    partitions; here the cell id rides the broadcast-join key
    (cell, sub, cid), so the corpus still never shuffles and the only
    exchange is the (query, neighbor) partial-sum aggregation.

    ``residual=False`` (default, the oracle-exact path): PQ encodes
    the raw vectors. Deterministic end to end (9dp-rounded coarse sims
    with centroid-id tiebreak, the ``clustering`` k-means contract for
    codebooks, integer ADC) -> exact SQL oracle.

    ``residual=True`` (full FAISS shape, Jegou et al. 2011 §IV): PQ
    encodes ``v - centroid(cell(v))`` and queries score their
    cell-relative residual — within a shared cell the coarse centroid
    cancels, so ||q_res - code||^2 approximates ||q - v||^2 with the
    codebook spending its budget on the (much tighter) residual
    distribution: better recall at the same m/ksub. Same deterministic
    construction but no exported SQL oracle (the residual column is an
    intermediate); recall is pinned against the non-residual variant
    in ``test_pq.py``.

    ``nprobe`` (FAISS knob, default 1 — the oracle-checked
    configuration): each query scores the code rows of its ``nprobe``
    nearest cells. The query side builds one tiny branch per probe
    rank (a query has ONE residual per probed cell, so the ADC table
    is per-rank); a corpus vector lives in exactly one cell, so each
    (query, neighbor) pair appears in at most one branch and the
    union needs no dedup before the final cut.
    """
    from cdc_data_pipeline_spark.functions.vectors import lit_id_vector_map
    from cdc_data_pipeline_spark.operators.similarity import (
        collect_cents, ivf_assign, ivf_probe_cells)

    cents = collect_cents(centroids, vec_col)
    if not cents[0]:
        # no cells -> no candidates; short-circuit (the residual path
        # would otherwise fail analysis on an empty centroid map)
        return queries.filter(F.lit(False)).select(
            F.col(id_col).alias(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("dist_sq"),
            F.lit(0).alias("rank"))
    assigned = ivf_assign(corpus, cents, vec_col, id_col)
    probes = ivf_probe_cells(queries, cents, nprobe, vec_col, id_col,
                             rank_col="__pr") \
        .withColumnRenamed(id_col, query_id_col)
    enc_vec = vec_col
    if residual:
        cmap = lit_id_vector_map(*cents)
        res = F.zip_with(F.col(vec_col),
                         F.element_at(cmap, F.col("centroid_id")),
                         lambda x, y: x.cast("double") - y)
        enc_vec = "__rv"
        # pin the residual corpus: training makes several passes over it
        assigned = assigned.withColumn(enc_vec, res) \
                           .localCheckpoint(eager=False)
        probes = probes.withColumn(enc_vec, res)
        train_src = assigned
    else:
        train_src = corpus
    books = codebooks if codebooks is not None else train_pq_codebooks(
        train_src, dim, m, ksub, iters, enc_vec if residual else vec_col,
        id_col, seed)
    # materialized (cell, codes) table — see pq_adc_topk. keep_cols
    # carries the cell id through the encode projection, so the coarse
    # assignment appears ONCE in the plan (the old self-join re-derived
    # the whole corpus assign subtree a second time)
    code_tab = (pq_encode(assigned, books, dim, enc_vec, id_col,
                          keep_cols=("centroid_id",))
                .localCheckpoint(eager=False))
    codes = code_tab.select(F.col(id_col).alias("neighbor_id"), "centroid_id",
                            F.posexplode("codes").alias("sub", "cid"))
    parts = []
    for p in range(nprobe):
        q_p = probes.filter(F.col("__pr") == p).drop("__pr")
        dtab_p = (adc_distance_table(q_p.drop("centroid_id"), books, dim,
                                     enc_vec, query_id_col, query_id_col)
                  .join(q_p.select(query_id_col, "centroid_id"),
                        query_id_col))
        parts.append(codes.join(F.broadcast(dtab_p),
                                ["centroid_id", "sub", "cid"]))
    joined = parts[0]
    for part in parts[1:]:
        joined = joined.unionByName(part)
    scored = (joined
              .filter(F.col(query_id_col) != F.col("neighbor_id"))
              .groupBy(query_id_col, "neighbor_id")
              .agg(F.sum("dl").alias("__dl")))
    return _rank_adc(scored, k, query_id_col)
