"""Embedding clustering (Lloyd's k-means) and semantic deduplication.

SemDeDup (Abbas et al. 2023) is the embedding-space complement of
MinHash dedup: cluster the corpus with k-means, then compare vectors
ONLY within their cluster — near-duplicate pairs are overwhelmingly
co-clustered, so the quadratic all-pairs cost collapses to
sum(cluster_size^2) with learned (data-adaptive) blocking instead of
the hash-random blocking of LSH.

Determinism (what makes an exact SQL oracle possible):
- init centroids = the k vectors with the smallest md5 key-hash
  (``uniform_hash``) — a pure function of ids, not of partitioning;
- every distance and every recomputed centroid coordinate is ROUNDed
  (6 dp) before it feeds a comparison, so float summation-order noise
  (~1e-15) can't flip an argmin across engines or runs;
- argmin ties break on the lower cluster id.

Scale: assignment is a narrow map — k*dim literal constants compiled
into the plan (broadcast-by-codegen), no shuffle, no join. The only
shuffles are the per-iteration centroid recompute (groupBy cluster —
k rows out) and the final cluster-keyed self-join in semdedup. The
k*dim driver collect per iteration is scalar-scale (MLlib's KMeans
does the same); iterations are bounded and each materializes only k
centroids, so lineage stays flat.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.hashing import uniform_hash
from cdc_data_pipeline_spark.functions.rounding import round_half_up
from cdc_data_pipeline_spark.functions.vectors import (
    cosine, lit_double_array, lit_id_vector_array)


def _dist_sq_to(vec: Column, centroid: Sequence[float]) -> Column:
    """ROUND(sum((v_i - c_i)^2), 6) against a literal centroid —
    left-to-right fold, same order as the oracle's list_sum."""
    arr = lit_double_array(centroid)
    diffs = F.zip_with(vec, arr,
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.round(F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x), 6)


def assign_clusters(df: DataFrame, centroids: Sequence[tuple[int, Sequence[float]]],
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    engine: str = "native") -> DataFrame:
    """Nearest-centroid assignment: adds a ``cluster`` column.

    ``centroids`` is [(cluster_id, vector), ...] — explicit ids so an
    empty cluster (which simply has no centroid next round) never
    renumbers the survivors. Both engines: argmin by 6dp-rounded
    squared distance, ties to the lowest cluster id.

    - ``native`` (default): centroids are plan literals → a pure
      projection, no join/shuffle, fully SQL-oracle-reproducible. The
      plan size grows with k*dim — right for the oracle-checked
      configurations (k*dim up to a few thousand).
    - ``arrow``: one numpy ``(batch, k)`` distance matrix per Arrow
      batch against broadcast-closure centroids — no shuffle either,
      and plan size is O(1), which is the production path when
      k*dim is large (SemDeDup-style k ~ corpus/target_cluster_size).
      Distances are rounded to the same 6dp grid with the same
      HALF_UP tie rule as the native ``F.round`` path (see
      ``functions/rounding.py``) before the argmin. Summation order
      still differs (numpy blocked sums vs the native left fold), so
      cross-engine equality is pinned empirically on the fixtures by
      ``test_assign_engines_agree``; the native engine is the
      oracle-checked path.
    """
    if engine == "native":
        return df.withColumn("cluster", _argmin_cluster(F.col(vec_col), centroids))

    import numpy as np
    import pandas as pd

    cents = sorted((int(cid), [float(x) for x in c]) for cid, c in centroids)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)      # (k, dim)

    from pyspark.sql.types import IntegerType, StructField, StructType

    # fresh StructType — StructType.add would mutate df's cached schema
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("cluster", IntegerType())])

    def _assign(batches):
        for pdf in batches:
            if len(pdf):
                X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                # (n, k) squared distances, rounded HALF_UP to the grid
                # the native fold rounds to (F.round semantics — see
                # functions/rounding.py), then first-min = lowest cid
                d = round_half_up(
                    ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1), 6)
                pdf = pdf.assign(cluster=cids[np.argmin(d, axis=1)].astype("int32"))
            else:
                pdf = pdf.assign(cluster=pd.array([], dtype="int32"))
            yield pdf

    return df.mapInPandas(_assign, schema=out_schema)


def _argmin_cluster(vec: Column, centroids: Sequence[tuple[int, Sequence[float]]]) -> Column:
    """array_min over struct(rounded_dist, cid): lexicographic struct
    ordering IS "min distance, ties to the lowest cluster id".

    The centroids ride as ONE literal array of (cid, vector) structs
    and the distance fold is a single ``transform`` lambda evaluated
    at runtime over that array — one fold expression in the plan no
    matter how many centroids (the r3 shape unrolled k copies of the
    fold, which made Catalyst analysis/codegen — not the data — the
    dominant cost of the PQ family: encode + ADC compiled ~2s of plan
    at ANY scale factor). Per-element arithmetic is unchanged
    (zip_with (x-y)^2, left-fold sum, ROUND 6dp), so assignments are
    bit-identical to the unrolled form and the SQL oracles hold."""
    cents = sorted(centroids)
    carr = lit_id_vector_array(cents, "INT")
    structs = F.transform(
        carr,
        lambda e: F.struct(
            F.round(F.aggregate(
                F.zip_with(vec, e["v"],
                           lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0), lambda a, x: a + x), 6).alias("d"),
            e["c"].alias("c")))
    return F.array_min(structs).getField("c")


def init_centroids(df: DataFrame, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 0) -> list[tuple[int, list[float]]]:
    """Deterministic init: the k vectors with the smallest
    ``uniform_hash(id)`` (hash-uniform ≈ a uniform random draw, but
    reproducible). Cluster i is the i-th by (hash, id) order."""
    rows = (df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                      uniform_hash(id_col, seed).alias("__u"))
              .orderBy("__u", "__id").limit(k).collect())
    return [(i, [float(x) for x in r["__v"]]) for i, r in enumerate(rows)]


def recompute_centroids(assigned: DataFrame,
                        vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Per-cluster coordinate means, rounded to 6 dp. One shuffle
    keyed (cluster, position) with map-side partial aggregation; k*dim
    scalars come back to the driver. Empty clusters drop out but keep
    everyone else's id (ids are explicit, never positional)."""
    pos = (assigned.select("cluster", F.posexplode(F.col(vec_col))
                           .alias("pos", "val"))
           .groupBy("cluster", "pos")
           .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
           .groupBy("cluster")
           .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
           .orderBy("cluster")
           .collect())
    return [(int(r["cluster"]), [float(e["m"]) for e in r["pm"]]) for r in pos]


def kmeans(df: DataFrame, k: int, iters: int = 2, vec_col: str = "embedding",
           id_col: str = "vec_id", seed: int = 0,
           engine: str = "native") -> DataFrame:
    """Lloyd's k-means for ``iters`` assignment rounds (init → assign
    → recompute, ending on an assignment). Returns the input plus a
    ``cluster`` column from the final assignment. ``engine`` selects
    the assignment path (see ``assign_clusters``)."""
    cents = init_centroids(df, k, vec_col, id_col, seed)
    assigned = assign_clusters(df, cents, vec_col, id_col, engine)
    for _ in range(iters - 1):
        cents = recompute_centroids(assigned, vec_col)
        assigned = assign_clusters(df, cents, vec_col, id_col, engine)
    return assigned


def semdedup_pairs(df: DataFrame, k: int, threshold: float, iters: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 0, engine: str = "arrow") -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster, id_a, id_b, cos)
    for co-clustered vectors with rounded (6 dp) cosine >= threshold.

    Two engines, identical values:
    - ``arrow`` (default): one Arrow batch per cluster via
      ``applyInPandas`` — a single numpy matmul scores every pair in
      the cluster (~5x over the join at sf0.1, gap grows with cluster
      size). Pair emission stays cluster-local, so shuffle volume is
      one row per VECTOR, not per pair.
    - ``native``: cluster-keyed self-join with higher-order-function
      cosine — pure JVM, no Python workers; the shape the SQL oracle
      mirrors literally.

    Against LSH blocking this trades two cheap global passes (the
    k-means iters) for much tighter candidate sets on clusterable
    corpora. A pathologically hot cluster makes the pair set
    quadratic either way — production fixes k so expected cluster
    size stays bounded (k ~ n / target_size).
    """
    assigned = kmeans(df, k, iters, vec_col, id_col, seed)
    if engine == "native":
        a = assigned.select(F.col("cluster"), F.col(id_col).alias("id_a"),
                            F.col(vec_col).alias("__va"))
        b = assigned.select(F.col("cluster"), F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("__vb"))
        pairs = (a.join(b, "cluster")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("cluster", "id_a", "id_b",
                          F.round(cosine("__va", "__vb"), 6).alias("cos")))
        return pairs.filter(F.col("cos") >= threshold)

    import numpy as np
    import pandas as pd

    def cluster_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)[order]
        # cos = dot / (|a||b|), matching the HOF/oracle formulation
        dots = m @ m.T
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, dots / denom, 0.0)
        cos = round_half_up(cos, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= threshold
        return pd.DataFrame({
            "cluster": np.full(int(keep.sum()), int(pdf["cluster"].iloc[0]),
                               dtype=np.int32),
            "id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
            "cos": cos[iu, ju][keep],
        })

    schema = "cluster int, id_a long, id_b long, cos double"
    return (assigned.select(F.col("cluster").cast("int").alias("cluster"),
                            F.col(id_col), F.col(vec_col))
                    .groupBy("cluster").applyInPandas(cluster_pairs, schema))


def semdedup_prune(df: DataFrame, k: int, threshold: float, iters: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 0) -> DataFrame:
    """SemDeDup keep-set: drop every vector that has a near-duplicate
    with a LOWER id in its cluster (keep-lowest representative —
    same convention as ``dedup.dedup_exact``)."""
    doomed = (semdedup_pairs(df, k, threshold, iters, vec_col, id_col, seed)
              .select(F.col("id_b").alias(id_col)).distinct())
    return df.join(doomed, id_col, "left_anti")
