"""Train/test n-gram decontamination (operators/decontaminate.py)."""

import pytest
from pyspark.sql import Row

from tenzir_spark.operators.decontaminate import (
    contamination_hits,
    eval_ngrams,
    ngram_decontaminate,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="Lorem ipsum dolor sit amet, consectetur!"),
        # contains the eval sentence verbatim (different case/punct)
        Row(doc_id=3, text="prefix words THE QUICK, BROWN fox JUMPS suffix"),
        Row(doc_id=4, text="too short"),
        Row(doc_id=5, text=""),
    ])


@pytest.fixture()
def eval_df(spark):
    return spark.createDataFrame([
        Row(doc_id=100, text="the quick brown fox jumps"),
        Row(doc_id=101, text="tiny"),  # shorter than n → no n-grams
    ])


def test_eval_ngrams_normalization(spark, eval_df):
    got = {r["ng"] for r in eval_ngrams(eval_df, "text", 4).collect()}
    assert got == {"the quick brown fox", "quick brown fox jumps"}


def test_contamination_hits(spark, corpus, eval_df):
    hits = {r["doc_id"]: r["n_hits"]
            for r in contamination_hits(corpus, eval_df, n=4).collect()}
    # doc 1 and doc 3 both carry both eval 4-grams; 2/4/5 are clean
    assert hits == {1: 2, 3: 2}


def test_drop_and_mark_modes(spark, corpus, eval_df):
    kept = ngram_decontaminate(corpus, eval_df, n=4, mode="drop")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4, 5]
    marked = ngram_decontaminate(corpus, eval_df, n=4, mode="mark")
    flags = {r["doc_id"]: r["is_contaminated"] for r in marked.collect()}
    assert flags == {1: True, 2: False, 3: True, 4: False, 5: False}
    with pytest.raises(ValueError, match="mode"):
        ngram_decontaminate(corpus, eval_df, mode="nope")


def test_short_docs_and_empty_eval(spark, corpus):
    empty_eval = corpus.limit(0)
    marked = ngram_decontaminate(corpus, empty_eval, n=4, mode="mark")
    assert all(not r["is_contaminated"] for r in marked.collect())
    # n larger than every doc → nothing contaminated, nothing crashes
    kept = ngram_decontaminate(
        corpus, corpus, n=50, mode="drop")
    assert kept.count() == corpus.count()


def test_eval_side_is_broadcast(spark, corpus, eval_df):
    plan = contamination_hits(corpus, eval_df, n=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_token_array_decontamination(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.decontaminate import (
        contamination_hits, ngram_decontaminate,
    )

    leak = [11, 12, 13, 14, 15]
    corpus = spark.createDataFrame([
        Row(doc_id=1, tokens=[1, 2] + leak + [3]),
        Row(doc_id=2, tokens=[4, 5, 6, 7, 8, 9, 10]),
        Row(doc_id=3, tokens=[1, 2, 3]),           # shorter than n
    ])
    eval_df = spark.createDataFrame([Row(tokens=[99] + leak + [98])])
    hits = {r["doc_id"]: r["n_hits"] for r in contamination_hits(
        corpus, eval_df, "tokens", "doc_id", n=5).collect()}
    assert hits == {1: 1}
    kept = ngram_decontaminate(corpus, eval_df, "tokens", "doc_id", n=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
