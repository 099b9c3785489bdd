"""Naive Bayes classifier: learning behavior, smoothing, plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import classify as cf


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, "stock market trading price equity dividend", "finance"))
    for i in range(40, 80):
        rows.append((i, "genome protein cell enzyme molecule biology", "science"))
    # a few mixed docs so counts are not perfectly separable
    rows.append((80, "stock protein price cell", "finance"))
    rows.append((81, "genome equity enzyme dividend", "science"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_nb_learns_separable_classes(spark, corpus):
    """Held-in accuracy on near-separable data must be ~perfect for
    the pure-signal documents."""
    out = cf.nb_classify(corpus, "source", vocab=32)
    got = {r.doc_id: r.pred for r in out.collect()}
    assert len(got) == 82
    wrong = [i for i in range(80)
             if got[i] != ("finance" if i < 40 else "science")]
    assert not wrong, f"misclassified pure docs: {wrong}"


def test_nb_model_probabilities_normalize(spark, corpus):
    """Within a class, sum over the vocab of p(t|c) plus the implied
    mass of unseen-vocab smoothing must be <= 1 (add-one over the
    restricted vocabulary)."""
    m = cf.train_nb(corpus, "source", vocab=16).collect()
    by_cls = {}
    for r in m:
        by_cls.setdefault(r.cls, []).append(math.exp(r.lp / 1e6))
    # dense model: every class covers the full realized vocabulary
    # (the corpus has only 12 distinct tokens, under the vocab=16 cap)
    sizes = {len(ps) for ps in by_cls.values()}
    assert sizes == {12}
    for cls, ps in by_cls.items():
        assert sum(ps) <= 1.0 + 1e-6


def test_nb_scores_docs_with_no_vocab_tokens(spark, corpus):
    """A doc of pure OOV tokens still gets a prediction (prior only)
    — the majority/lexicographic tie rules apply."""
    extra = spark.createDataFrame(
        [(99, "zzz qqq xxx", "finance")],
        "doc_id long, text string, source string")
    out = cf.nb_classify(corpus.union(extra), "source", vocab=16)
    row = [r for r in out.collect() if r.doc_id == 99]
    assert len(row) == 1 and row[0].pred in ("finance", "science")


def test_nb_scoring_plan_broadcasts_model(spark, corpus):
    out = cf.nb_classify(corpus, "source", vocab=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the top-k vocabulary cut must be the distributed partial top-k,
    # not a single-partition global window
    assert "TakeOrderedAndProject" in plan
