"""Persisted incremental LSH dedup index: equivalence with the
one-shot path, directory-level pruning, and append-grows-the-index."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_data_pipeline_spark.operators import dedup as dd
from cdc_data_pipeline_spark.operators import dedup_index as di
from cdc_data_pipeline_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def _pairs_set(df, a="id_a", b="id_b"):
    return {(min(r[0], r[1]), max(r[0], r[1])) for r in df.select(a, b).collect()}


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """index(batch1) queried with batch2, plus within-batch pairs,
    must equal one-shot LSH over the whole corpus."""
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    path = str(tmp_path / "lshidx")
    stats = di.build_lsh_index(spark, b1, path, n_prefixes=16)
    assert stats["n_docs"] == b1.count()

    cross = di.query_lsh_index(spark, path, b2)
    got = (_pairs_set(cross, "id_existing", "id_new")
           | _pairs_set(dd.lsh_candidate_pairs(b1))
           | _pairs_set(dd.lsh_candidate_pairs(b2)))
    want = _pairs_set(dd.lsh_candidate_pairs(docs))
    assert got == want
    assert want, "fixture corpus must contain near-dups for this test to bite"


def test_query_prunes_partitions(spark, sf_dir, tmp_path):
    """A small batch must read only its bucket-prefix directories: the
    scan's partition filter carries the IN-list, and the files the
    query touches are a strict subset of the index files."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lshidx2")
    di.build_lsh_index(spark, docs.filter(F.col("doc_id") % 3 != 0), path,
                       n_prefixes=32)
    small = docs.filter(F.col("doc_id") % 97 == 0)

    out = di.query_lsh_index(spark, path, small)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and di.PFX in plan

    import os
    total_files = sum(len([f for f in fs if f.endswith(".parquet")])
                      for _, _, fs in os.walk(os.path.join(path, "bands")))
    touched = (spark.read.parquet(os.path.join(path, "bands"))
               .filter(F.col(di.PFX).isin(
                   [r[0] for r in di._with_pfx(
                       dd.banded_signatures(small), 32).select(di.PFX)
                       .distinct().collect()]))
               .select(F.input_file_name()).distinct().count())
    assert touched < total_files


def test_append_then_query_matches_rebuilt_index(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 13 == 0)

    inc_path = str(tmp_path / "inc")
    di.build_lsh_index(spark, b1, inc_path, n_prefixes=8)
    di.append_lsh_index(spark, inc_path, b2)

    full_path = str(tmp_path / "full")
    di.build_lsh_index(spark, docs, full_path, n_prefixes=8)

    got = _pairs_set(di.query_lsh_index(spark, inc_path, probe),
                     "id_existing", "id_new")
    want = _pairs_set(di.query_lsh_index(spark, full_path, probe),
                      "id_existing", "id_new")
    assert got == want
