"""Similarity search over embedding columns (north-star, SURVEY §7.6).

Brute-force cosine top-k as the exactness baseline; IVF
(inverted-file / coarse-quantizer) and random-hyperplane LSH variants
as the 100 TB scale paths.

Scale design: brute force is queries × corpus — fine when the query set
is small (broadcast the queries, stream the corpus: one pass, no
shuffle of the corpus). IVF assigns every vector to its nearest
centroid ONCE (broadcast centroid join), then probes only matching
cells: the expensive join is keyed on cell id.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.vectors import (
    cosine, lit_double_array, lit_id_vector_array)
from cdc_data_pipeline_spark.operators.sampling import local_topk_cut


def _rank_topk(scored: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Shared skew-safe final ranking for the similarity family: a
    map-local cut (k survivors per query per Arrow batch) feeds the
    exact rank window, so no per-query window partition ever holds a
    corpus-sized score set. ``scored`` must be exactly
    (query_id, neighbor_id, cos) — project the vector payload away
    BEFORE calling so the cut doesn't ship embeddings through Arrow."""
    partial = local_topk_cut(scored, [query_id_col], k,
                             [("cos", False), ("neighbor_id", True)])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id", "cos", "rank"))


def topk_cosine(corpus: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    The query side is broadcast (small by construction), so the corpus
    is scanned once with no shuffle. Ranking is two-phase partial
    top-k: a map-local cut keeps at most k rows per query per Arrow
    batch (so the only shuffle is k × queries × batches survivor rows
    — never the corpus × queries score set, and never a single skewed
    per-query partition holding every corpus score), then an exact
    merge ranks the survivors. The per-query ordering
    (cos desc, neighbor_id asc) is total, so the global top-k is a
    subset of the union of local top-ks — the cut loses nothing.
    Similarity is rounded to 6dp with id tiebreak for determinism.
    """
    q = F.broadcast(queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")))
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
        .join(q, F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
        .select(query_id_col, "neighbor_id", "cos")
    )
    return _rank_topk(scored, k, query_id_col)


def collect_cents(centroids, vec_col: str = "embedding",
                  centroid_id_col: str = "centroid_id"):
    """Collect the centroid side once as ``(sorted [(cid, [float...])],
    id_sql_type)`` — broadcast-small by the IVF contract. Pass the
    result to ``ivf_assign`` in place of the DataFrame so a caller
    assigning BOTH a corpus and a query set against the same centroids
    pays one collect job, not two. A tuple passed in comes back as-is."""
    if isinstance(centroids, tuple):
        return centroids
    ctype = centroids.schema[centroid_id_col].dataType.simpleString()
    cents = sorted((int(r[0]), [float(x) for x in r[1]]) for r in
                   centroids.select(centroid_id_col, vec_col).collect())
    return cents, ctype


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               centroid_id_col: str = "centroid_id",
               engine: str = "native") -> DataFrame:
    """Assign each vector to its nearest centroid (coarse quantization):
    argmax of 9dp-rounded cosine, ties to the lowest centroid id.

    Centroids are collected either way (broadcast-small by the IVF
    contract, n_cells ~ sqrt(corpus) — the same watermark-budget
    collect class as k-means centroids and PQ codebooks).

    - ``native`` (default): one literal array of (cid, vector)
      structs and a single runtime ``transform`` + ``array_max``
      projection — NO join, NO groupBy, NO shuffle, and exactly one
      cosine-fold expression in the plan regardless of n_cells. (The
      r3 shape cross-joined the broadcast centroids and argmax-grouped
      on the embedding column: 2.9s of row-materialization overhead at
      a 2k x 40 fixture, and a corpus-wide exchange keyed on a 64-dim
      array.) Arithmetic is unchanged — same cosine fold over the
      same doubles, same 9dp round, same lowest-cid tiebreak — so the
      SQL oracles hold bit-for-bit. Plan literals grow with
      n_cells * dim: right for oracle-checked configurations.
    - ``arrow``: each Arrow batch scores one numpy (batch, cells)
      cosine matrix — O(1) plan size; the production path when
      n_cells * dim is large. Same 9dp HALF_UP rounding grid
      (``functions/rounding.py``) and lowest-cid tiebreak; summation
      order still differs from the native fold, so equality is pinned
      empirically by ``test_ivf_assign_engines_agree`` on the
      fixtures — native stays the oracle-checked path.
    """
    if engine == "native":
        cents, ctype = collect_cents(centroids, vec_col, centroid_id_col)
        if not cents:
            # no centroids -> no assignments (the old join semantics)
            return corpus.filter(F.lit(False)).select(
                id_col, vec_col, F.lit(None).cast(ctype).alias(centroid_id_col))
        carr = lit_id_vector_array(cents, ctype)
        packed = F.transform(
            carr,
            lambda e: F.struct(
                F.round(cosine(F.col(vec_col), e["v"]), 9).alias("s"),
                (-e["c"]).alias("tb"), e["c"].alias("cid")))
        return corpus.select(
            id_col, vec_col,
            F.array_max(packed).getField("cid").alias(centroid_id_col))

    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents, _ = collect_cents(centroids, vec_col, centroid_id_col)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    cn = np.sqrt(np.einsum("ij,ij->i", C, C))

    src = corpus.select(F.col(id_col), F.col(vec_col))
    out_schema = StructType(list(src.schema.fields)
                            + [StructField(centroid_id_col, IntegerType())])

    def _assign(batches):
        for pdf in batches:
            if len(pdf):
                X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                xn = np.sqrt(np.einsum("ij,ij->i", X, X))
                denom = np.outer(xn, cn)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(denom > 0, (X @ C.T) / denom, 0.0)
                # HALF_UP — matches native F.round (functions/rounding)
                from cdc_data_pipeline_spark.functions.rounding import round_half_up
                sims = round_half_up(sims, 9)
                pdf = pdf.assign(**{centroid_id_col:
                                    cids[np.argmax(sims, axis=1)].astype("int32")})
            else:
                import pandas as _pd
                pdf = pdf.assign(**{centroid_id_col: _pd.array([], dtype="int32")})
            yield pdf

    return src.mapInPandas(_assign, schema=out_schema)


def ivf_probe_cells(queries: DataFrame, centroids, nprobe: int = 1,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    centroid_id_col: str = "centroid_id",
                    rank_col: str | None = None) -> DataFrame:
    """One row per (query, probed cell): the query's ``nprobe``
    nearest cells by the same 9dp-rounded cosine / lowest-cid order as
    ``ivf_assign`` (nprobe=1 reproduces its assignment exactly). Pure
    projection + explode — no join, no shuffle; the FAISS nprobe knob
    that trades scanned fraction (~nprobe/n_cells) for recall.
    ``rank_col`` adds the 0-based probe rank (0 = nearest cell)."""
    cents, ctype = collect_cents(centroids, vec_col, centroid_id_col)
    if not cents:
        # no cells -> no probes (matches ivf_assign's empty semantics)
        out = queries.filter(F.lit(False)).select(
            id_col, vec_col, F.lit(None).cast(ctype).alias(centroid_id_col))
        return out if rank_col is None else out.withColumn(rank_col, F.lit(0))
    carr = lit_id_vector_array(cents, ctype)
    packed = F.transform(
        carr,
        lambda e: F.struct(
            (-F.round(cosine(F.col(vec_col), e["v"]), 9)).alias("d"),
            e["c"].alias("cid")))
    # ascending lexicographic sort of (-sim, cid) = sim desc, cid asc
    top = F.slice(F.array_sort(packed), 1, nprobe)
    out = (queries
           .select(id_col, vec_col, F.posexplode(top).alias("__pr", "__p"))
           .select(id_col, vec_col, F.col("__p.cid").alias(centroid_id_col),
                   F.col("__pr")))
    if rank_col is None:
        return out.drop("__pr")
    return out.withColumnRenamed("__pr", rank_col)


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", nprobe: int = 1) -> DataFrame:
    """IVF-style ANN: search the query's ``nprobe`` nearest centroid
    cells (default 1 — the oracle-checked configuration).

    At scale the assignment is precomputed/materialized partitioned by
    cell, so a query touches nprobe partitions instead of the whole
    corpus. Final ranking goes through the shared map-local cut
    (``_rank_topk``) — a hot cell's scores never land whole in one
    window task.
    """
    cents = collect_cents(centroids, vec_col)
    assigned = ivf_assign(corpus, cents, vec_col, id_col)
    q_probe = ivf_probe_cells(queries, cents, nprobe, vec_col, id_col) \
        .select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv"), F.col("centroid_id"))
    scored = (
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "centroid_id")
        .join(F.broadcast(q_probe), "centroid_id")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
        .select(query_id_col, "neighbor_id", "cos")
    )
    return _rank_topk(scored, k, query_id_col)


def hyperplane_signature(df: DataFrame, planes: list[list[float]],
                         vec_col: str = "embedding") -> "F.Column":
    """LSH bit signature: bit j = sign(v . plane_j). Returns a Column
    (integer bucket id in [0, 2^nbits)). All native zip_with/aggregate
    arithmetic — one JVM pass, no Python per row."""
    from cdc_data_pipeline_spark.functions.vectors import dot

    sig = F.lit(0)
    for j, p in enumerate(planes):
        plane = lit_double_array(p)
        sig = sig + F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def _gaussian_planes(nbits: int, dim: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def _packed_signature_udf(nbits: int, tables: int, dim: int, seed: int):
    """All tables' hyperplane bits in ONE Arrow-batched matmul, packed
    into a single long (table t's bucket = bits [t*nbits, (t+1)*nbits)).

    The native-HOF formulation costs one interpreted aggregate per
    plane per row (~40µs each — 5s for 2k rows x 64 planes); the numpy
    path is one (batch x dim) @ (dim x planes) product per Arrow batch.
    Planes are re-derived from the seed inside each executor: no
    closure capture drift, deterministic everywhere.
    """
    assert nbits * tables <= 64
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        import numpy as np

        planes = []
        for t in range(tables):
            planes += _gaussian_planes(nbits, dim, seed + t)
        P = np.asarray(planes, dtype=np.float64)          # (bits, dim)
        X = np.stack(v.to_numpy())                        # (n, dim)
        bits = (X.astype(np.float64) @ P.T >= 0).astype(np.uint64)
        weights = np.left_shift(np.uint64(1), np.arange(nbits * tables, dtype=np.uint64))
        packed = (bits * weights).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.astype(np.int64))

    return sig


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
                 nbits: int = 8, tables: int = 4, seed: int = 42,
                 multiprobe: bool = True, vec_col: str = "embedding",
                 id_col: str = "vec_id", query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``tables`` independent hash tables of ``nbits`` hyperplanes each;
    a vector lands in one bucket per table (at scale: a materialized
    table partitioned by (table, bucket)). A query probes, per table,
    its own bucket plus — with ``multiprobe`` — every bucket at
    Hamming distance 1. Scanned fraction ≈ tables*(nbits+1)/2^nbits of
    the corpus (14% at the defaults) instead of all of it; recall
    grows as 1-(1-p)^tables. Hyperplanes are seeded driver-side
    constants: deterministic across runs and executors. Approximate by
    design -> rows-only correctness check; recall is pinned against
    brute force in tests.
    """
    sig_udf = _packed_signature_udf(nbits, tables, dim, seed)
    mask = (1 << nbits) - 1

    def table_bucket(sig, t: int):
        return F.shiftrightunsigned(sig, nbits * t).bitwiseAND(F.lit(mask))

    csig = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        sig_udf(F.col(vec_col)).alias("__sig"),
    ).select(
        "neighbor_id", "__cv",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), table_bucket(F.col("__sig"), t).alias("bucket"))
            for t in range(tables)
        ])).alias("tb"),
    ).select("neighbor_id", "__cv", "tb.tbl", "tb.bucket")
    qsig = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv"),
        sig_udf(F.col(vec_col)).alias("__sig"),
    ).select(
        query_id_col, "__qv",
        *[table_bucket(F.col("__sig"), t).alias(f"__s{t}") for t in range(tables)],
    )
    probe_structs = []
    for t in range(tables):
        s = F.col(f"__s{t}")
        probes = [s] + ([s.bitwiseXOR(F.lit(1 << j)) for j in range(nbits)] if multiprobe else [])
        probe_structs += [F.struct(F.lit(t).alias("tbl"), p.alias("bucket")) for p in probes]
    q = qsig.select(query_id_col, "__qv", F.explode(F.array(*probe_structs)).alias("pb")) \
        .select(query_id_col, "__qv", "pb.tbl", "pb.bucket")
    # candidates dedup BEFORE the cosine: a pair colliding in several
    # tables must be scored once
    cand = (
        csig.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id", "__qv", "__cv")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.withColumn("cos", F.round(cosine("__qv", "__cv"), 6)) \
                 .select(query_id_col, "neighbor_id", "cos")
    # ~tables*(nbits+1)/2^nbits of the corpus survives per query — the
    # map-local cut keeps the final rank window off that skewed key
    return _rank_topk(scored, k, query_id_col)


def rrf_fuse(ranked: list[DataFrame], k: int = 5, k_rrf: int = 60,
             weights: list[float] | None = None,
             query_id_col: str = "query_id",
             neighbor_id_col: str = "neighbor_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N per-query
    top-k rankings — the standard hybrid-retrieval combiner (e.g.
    lexical BM25 + dense cosine ANN, the Elasticsearch/Vespa hybrid
    default): ``rrf = sum over sources of w_i/(k_rrf + rank)``, with a
    source contributing 0 when the candidate is absent from its list.
    ``weights`` (default all 1.0 — the classic unweighted RRF) biases
    the fusion toward a source, the standard production tuning knob
    when one retriever is known-stronger for the workload.

    Inputs are (query_id, neighbor_id, rank) frames (any extra columns
    ignored); ranks must be 1-based. Scores are combined in list order
    via a fixed left-fold of coalesced terms, so the double sum is
    order-deterministic and an SQL oracle reproduces it bit-for-bit.

    Scale: each input is already top-k-bounded per query by its
    producer (every ranker in this module ends in a map-local-cut
    rank), so the fused candidate set is <= sum(k_i) rows per query —
    the final rank window is bounded by construction and needs no
    skew cut. The full-outer joins are keyed on (query, neighbor):
    high-cardinality, no hot key.

    Returns ``(query_id, neighbor_id, rrf, rank)``.
    """
    assert len(ranked) >= 2, "fusion needs at least two rankings"
    if weights is None:
        weights = [1.0] * len(ranked)
    assert len(weights) == len(ranked), "one weight per ranking"
    base = None
    for i, df in enumerate(ranked):
        d = df.select(F.col(query_id_col), F.col(neighbor_id_col),
                      F.col(rank_col).alias(f"__r{i}"))
        base = d if base is None else base.join(
            d, [query_id_col, neighbor_id_col], "full_outer")
    score = None
    for i, w in enumerate(weights):
        term = F.coalesce(F.lit(float(w)) / (F.lit(k_rrf) + F.col(f"__r{i}")),
                          F.lit(0.0))
        score = term if score is None else score + term
    fused = base.withColumn("rrf", score)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf").desc(), F.col(neighbor_id_col).asc())
    return (fused.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(query_id_col, neighbor_id_col, "rrf", "rank"))


def ann_recall(truth: DataFrame, approx: DataFrame,
               query_id_col: str = "query_id",
               neighbor_id_col: str = "neighbor_id") -> DataFrame:
    """Per-query recall of an approximate top-k against an exact one:
    (query_id, n_truth, n_hit, recall). The evaluation loop every ANN
    deployment runs to tune nprobe/m/ksub/tables — in-engine, so a
    recall sweep over a 10^9-vector corpus is one job per setting, not
    a driver-side comparison. Both inputs are (query, neighbor) top-k
    frames (e.g. ``topk_cosine`` vs ``ivf_topk``); the join is keyed
    on the pair, grouped per query with map-side combine."""
    t = truth.select(query_id_col, neighbor_id_col)
    a = (approx.select(query_id_col, neighbor_id_col)
         .withColumn("__hit", F.lit(1)))
    joined = t.join(a, [query_id_col, neighbor_id_col], "left")
    return (joined.groupBy(query_id_col)
            .agg(F.count(F.lit(1)).alias("n_truth"),
                 F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                  .cast("long").alias("n_hit"))
            .withColumn("recall",
                        F.round(F.col("n_hit") / F.col("n_truth"), 6)))
