"""Product-quantization ANN: codes, ADC scoring, recall, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import pq
from cdc_data_pipeline_spark.operators import similarity as sim
from cdc_data_pipeline_spark.sources.readers import read_table

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_pq_encode_shape_and_range(spark, emb):
    books = pq.train_pq_codebooks(emb, DIM, m=4, ksub=8)
    assert len(books) == 4 and all(len(b) <= 8 for b in books)
    codes = pq.pq_encode(emb, books, DIM).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)


def test_pq_codes_minimize_subspace_distance(spark, emb):
    """Each assigned code must be the true argmin over its codebook
    for a sample of vectors (numpy cross-check)."""
    books = pq.train_pq_codebooks(emb, DIM, m=4, ksub=8)
    rows = (pq.pq_encode(emb, books, DIM)
            .join(emb, "vec_id").limit(20).collect())
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        for s, cents in enumerate(books):
            sub = v[s * 16:(s + 1) * 16]
            dists = {cid: round(float(((sub - np.asarray(c)) ** 2).sum()), 6)
                     for cid, c in cents}
            best = min(dists.values())
            # ties break to the lowest cid, same as the operator
            expect = min(cid for cid, d in dists.items() if d == best)
            assert r.codes[s] == expect


def test_pq_adc_matches_reconstructed_distance(spark, emb):
    """ADC distance == sum of query->centroid subspace distances for
    the vector's codes (micro-unit integer arithmetic, no drift)."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    books = pq.train_pq_codebooks(emb, DIM, m=4, ksub=8)
    out = pq.pq_adc_topk(emb, queries, dim=DIM, m=4, ksub=8, k=3,
                         codebooks=books)
    codes = {r.vec_id: r.codes for r in pq.pq_encode(emb, books, DIM).collect()}
    qv = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
          for r in queries.collect()}
    for r in out.collect():
        q = qv[r.query_id]
        dl = 0
        for s, cid in enumerate(codes[r.neighbor_id]):
            cent = np.asarray(dict(books[s])[cid])
            sub = q[s * 16:(s + 1) * 16]
            dl += int(round(float(((sub - cent) ** 2).sum()) * 1e6))
        assert abs(r.dist_sq - dl / 1e6) < 1e-9


def test_pq_recall_vs_bruteforce(spark):
    """PQ@k must recover a meaningful fraction of the exact L2 top-k.
    Run at sf0.01 (500 vectors): chance recall@10 is ~2%, so the 20%
    bar is a 10x-over-chance signal even on near-random fixture
    vectors (the hard case for quantization)."""
    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    k = 10
    exact = (emb.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("__cv"))
             .join(F.broadcast(queries.select(F.col("vec_id").alias("query_id"),
                                              F.col("embedding").alias("__qv"))),
                   F.col("query_id") != F.col("neighbor_id")))
    from cdc_data_pipeline_spark.functions.vectors import l2_distance
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.round(l2_distance("__qv", "__cv"), 6).asc(), F.col("neighbor_id").asc())
    exact_top = (exact.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k).collect())
    approx = pq.pq_adc_topk(emb, queries, dim=DIM, m=8, ksub=16, k=k).collect()
    truth, got = {}, {}
    for r in exact_top:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(got) == len(truth)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.2, f"PQ recall {hits}/{total} too low"


def test_pq_adc_plan_broadcasts_table(spark, emb):
    """The distance table side of the ADC join must be broadcast —
    the corpus code scan must not shuffle for the join."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = pq.pq_adc_topk(emb, queries, dim=DIM, m=4, ksub=8, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ivfpq_results_are_cell_local_and_plan_broadcasts(spark, emb):
    """Every reported neighbor must share its query's coarse cell, and
    the ADC join must still broadcast (corpus never shuffles)."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 25) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    out = pq.ivfpq_topk(emb, queries, centroids, dim=DIM, m=4, ksub=8, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    cells = {r.vec_id: r.centroid_id
             for r in sim.ivf_assign(emb, centroids).collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert cells[r.query_id] == cells[r.neighbor_id]


def test_ivfpq_subsets_pq_candidates(spark, emb):
    """IVF pruning only removes candidates: any (query, neighbor) it
    reports must score identically to the full PQ scan's distance for
    that pair (same codebooks, same ADC table)."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 25) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    books = pq.train_pq_codebooks(emb, DIM, m=4, ksub=8)
    full = {(r.query_id, r.neighbor_id): r.dist_sq
            for r in pq.pq_adc_topk(emb, queries, dim=DIM, m=4, ksub=8,
                                    k=10**6, codebooks=books).collect()}
    pruned = pq.ivfpq_topk(emb, queries, centroids, dim=DIM, m=4, ksub=8,
                           k=5, codebooks=books).collect()
    for r in pruned:
        assert full[(r.query_id, r.neighbor_id)] == r.dist_sq


def test_residual_ivfpq_beats_plain_on_clustered_data(spark):
    """r3 verdict item #7 (residual IVF-PQ, the full FAISS ``IVFx,PQy``
    shape): when coarse-cell offsets dominate the raw vectors, a raw
    codebook spends every centroid separating cells and cannot see
    within-cell structure — the residual codebook can. Synthetic
    corpus: 8 far-apart cluster centers (offset x50) + 8 unit-scale
    motifs + tiny jitter; cells seeded one per cluster. Residual
    recall must clearly beat the non-residual oracle path here (0.74
    vs 0.30 observed; asserted with slack), and must keep cell
    locality."""
    import random

    rng = random.Random(11)
    NC = 8
    centers = [[rng.uniform(-1, 1) * 50 for _ in range(DIM)] for _ in range(NC)]
    motifs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(8)]
    rows = []
    for i in range(480):
        c = centers[i % NC]
        mv = motifs[(i // NC) % 8]
        rows.append((i, [c[d] + mv[d] + rng.gauss(0, 0.02)
                         for d in range(DIM)]))
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb2.filter(F.col("vec_id") % 48 == 9)
    centroids = emb2.filter(F.col("vec_id") < NC) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    k = 5

    from pyspark.sql import Window

    from cdc_data_pipeline_spark.functions.vectors import l2_distance

    cells = sim.ivf_assign(emb2, centroids)
    qc = sim.ivf_assign(queries, centroids).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"), "centroid_id")
    exact = (cells.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("__cv"), "centroid_id")
             .join(F.broadcast(qc), "centroid_id")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(l2_distance("__qv", "__cv"), 6).asc(),
        F.col("neighbor_id").asc())
    truth = {}
    for r in (exact.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k).collect()):
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(residual):
        got = {}
        for r in pq.ivfpq_topk(emb2, queries, centroids, dim=DIM, m=4,
                               ksub=8, k=k, residual=residual).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return hits / sum(len(v) for v in truth.values())

    plain, resid = recall(False), recall(True)
    assert resid >= plain + 0.2, (plain, resid)
    assert resid >= 0.6, resid
    # residual neighbors stay cell-local (the coarse term cancels only
    # inside a shared cell)
    cmap = {r.vec_id: r.centroid_id for r in cells.collect()}
    for r in pq.ivfpq_topk(emb2, queries, centroids, dim=DIM, m=4,
                           ksub=8, k=k, residual=True).collect():
        assert cmap[r.query_id] == cmap[r.neighbor_id]


def test_ivfpq_nprobe_recall_monotone(spark, emb):
    """nprobe>1 only ADDS candidate cells: results for nprobe=1 must be
    reproduced or improved, recall against the full PQ scan must be
    monotone, and every reported pair must still score identically to
    the full scan (same codebooks)."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 25) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    books = pq.train_pq_codebooks(emb, DIM, m=4, ksub=8)
    full = {(r.query_id, r.neighbor_id): r.dist_sq
            for r in pq.pq_adc_topk(emb, queries, dim=DIM, m=4, ksub=8,
                                    k=10**6, codebooks=books).collect()}
    full_top = {}
    for r in pq.pq_adc_topk(emb, queries, dim=DIM, m=4, ksub=8,
                            k=5, codebooks=books).collect():
        full_top.setdefault(r.query_id, set()).add(r.neighbor_id)

    def got(nprobe):
        out = {}
        rows = pq.ivfpq_topk(emb, queries, centroids, dim=DIM, m=4, ksub=8,
                             k=5, codebooks=books, nprobe=nprobe).collect()
        for r in rows:
            assert full[(r.query_id, r.neighbor_id)] == r.dist_sq
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    g1, g3 = got(1), got(3)
    rec = [sum(len(full_top[q] & g.get(q, set())) for q in full_top)
           for g in (g1, g3)]
    assert rec[0] <= rec[1]
    # nprobe=3 candidates are a superset per query of nprobe=1's cells,
    # so each query's result is at least as good: its worst kept
    # distance can only shrink or stay
    for q in g1:
        assert q in g3


def test_residual_recall_catalog_entry(spark):
    """The extra-tier ``ivfpq_residual_recall`` gate: on the
    cluster-structured fixture variant the residual encoding must
    clearly beat the plain one (it measures exactly the within-cell
    structure a raw codebook cannot see)."""
    from cdc_data_pipeline_spark.catalog import llm
    from tests.conftest import SF0001

    rows = {r["variant"]: r["mean_recall"]
            for r in llm.q_ivfpq_residual_recall(spark, SF0001).collect()}
    assert set(rows) == {"plain", "residual"}
    assert rows["residual"] >= rows["plain"] + 0.2, rows
    assert rows["residual"] >= 0.5, rows
