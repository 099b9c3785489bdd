"""Similarity search over embedding columns (north-star, SURVEY §7.6).

Brute-force cosine top-k as the exactness baseline; an IVF
(inverted-file / coarse-quantizer) variant as the 100 TB scale path.

Scale design: brute force is queries × corpus — fine when the query set
is small (broadcast the queries, stream the corpus: one pass, no
shuffle of the corpus). IVF assigns every vector to its nearest
centroid ONCE (broadcast centroid join), then probes only matching
cells: the expensive join is keyed on cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.vectors import cosine


def topk_cosine(corpus: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    The query side is broadcast (small by construction), so the corpus
    is scanned once with no shuffle; ranking shuffles only
    (n_queries × corpus) similarity rows, cut to k per query.
    Similarity is rounded to 6dp with id tiebreak for determinism.
    """
    q = F.broadcast(queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")))
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
        .join(q, F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos", "rank")
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               centroid_id_col: str = "centroid_id") -> DataFrame:
    """Assign each vector to its nearest centroid (coarse quantization).

    Centroids are broadcast; argmin per vector via max(struct) — one
    pass, map-side combine, no corpus shuffle.
    """
    c = F.broadcast(centroids.select(F.col(centroid_id_col), F.col(vec_col).alias("__centv")))
    scored = corpus.join(c, F.lit(True)) \
        .withColumn("__sim", F.round(cosine(vec_col, "__centv"), 9))
    packed = F.max(F.struct(F.col("__sim"), (-F.col(centroid_id_col)).alias("__tb"),
                            F.col(centroid_id_col).alias("cid"))).alias("__m")
    best = scored.groupBy(id_col, vec_col).agg(packed)
    return best.select(id_col, vec_col, F.col("__m.cid").alias(centroid_id_col))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-style ANN: search only the query's centroid cell (nprobe=1).

    At scale the assignment is precomputed/materialized partitioned by
    cell, so a query touches one partition instead of the whole corpus.
    """
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    q_assigned = ivf_assign(queries, centroids, vec_col, id_col) \
        .select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv"), F.col("centroid_id"))
    scored = (
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "centroid_id")
        .join(F.broadcast(q_assigned), "centroid_id")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine("__qv", "__cv"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos", "rank")
    )
