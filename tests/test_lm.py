"""Stupid-backoff bigram LM scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tenzir_spark.operators.lm import lm_filter, lm_score


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "ref"),
            (2, "the cat sat", "ref"),
            (3, "the cat sat on the mat", "web"),   # in-distribution
            (4, "zq xv qq zz yy ww", "web"),        # all-OOV gibberish
            (5, "one", "web"),                      # too short to score
            (6, "", "web"),
        ],
        "doc_id long, text string, source string",
    )


def test_scores_and_backoff(spark):
    out = lm_score(_docs(spark), "text", "doc_id",
                   F.col("source") == "ref")
    rows = {r["doc_id"]: r for r in out.collect()}
    # in-distribution doc scores strictly better than gibberish
    assert rows[3]["lm_logprob"] > rows[4]["lm_logprob"]
    assert rows[3]["lm_ppl"] < rows[4]["lm_ppl"]
    # short/empty docs: unscored, not dropped
    assert rows[5]["n_scored"] == 0 and rows[5]["lm_logprob"] is None
    assert rows[6]["n_scored"] == 0
    assert rows[3]["n_scored"] == 5  # 6 words -> 5 bigram positions


def test_hand_computed_bigram(spark):
    # ref corpus: doc1 + doc2. bigram "the cat" occurs 2x, ctx "the" 3x.
    # doc3's first position scores ln(2/3) exactly via the bigram branch.
    df = _docs(spark).filter("doc_id in (1, 2, 3)")
    out = lm_score(df, "text", "doc_id", F.col("source") == "ref")
    # replicate the full doc3 score by hand:
    # ref counts: the=3, cat=2, sat=2, on=1, mat=1 (N=9, V=5)
    # bigrams: "the cat"=2, "cat sat"=2, "sat on"=1, "on the"=1, "the mat"=1
    # ctx counts: the=3, cat=2, sat=2, on=1
    expect = (math.log(2 / 3) + math.log(2 / 2) + math.log(1 / 2)
              + math.log(1 / 1) + math.log(1 / 3)) / 5
    got = {r["doc_id"]: r for r in out.collect()}[3]
    assert got["lm_logprob"] == pytest.approx(round(expect, 4), abs=1e-9)
    assert got["lm_ppl"] == pytest.approx(
        round(math.exp(-round(expect, 4)), 4), abs=1e-9)


def test_oov_uses_laplace_backoff(spark):
    out = lm_score(_docs(spark), "text", "doc_id",
                   F.col("source") == "ref")
    row = {r["doc_id"]: r for r in out.collect()}[4]
    # ref: N=9 occurrences, V=5 vocab; every doc4 bigram backs off to
    # ln(0.4 * 1 / 14)
    expect = math.log(0.4 * 1 / 14)
    assert row["lm_logprob"] == pytest.approx(round(expect, 4), abs=1e-9)


def test_empty_ref_corpus_raises(spark):
    with pytest.raises(ValueError, match="matches no rows"):
        lm_score(_docs(spark), "text", "doc_id",
                 F.col("source") == "nope")


def test_null_id_passes_through_filter(spark):
    df = _docs(spark).union(spark.createDataFrame(
        [(None, "mystery doc here", "web")],
        "doc_id long, text string, source string"))
    out = lm_filter(df, "text", "doc_id", F.col("source") == "ref",
                    max_ppl=1e9)
    assert out.count() == df.count()  # NULL-id row not dropped


def test_lm_filter_keeps_schema_and_short_docs(spark):
    df = _docs(spark)
    out = lm_filter(df, "text", "doc_id", F.col("source") == "ref",
                    max_ppl=30.0)  # gibberish backoff ppl is exactly 14/0.4 = 35
    assert out.columns == df.columns
    kept = {r["doc_id"] for r in out.collect()}
    assert 4 not in kept          # gibberish filtered
    assert {1, 2, 3} <= kept      # in-distribution kept
    assert {5, 6} <= kept         # unscorable docs pass through
