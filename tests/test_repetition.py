"""Gopher/MassiveText repetition filters (operators/text.py)."""

from pyspark.sql import Row

from tenzir_spark.operators.text import repetition_filter, repetition_stats


def _stats(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return repetition_stats(df, "text").collect()[0]


def test_duplicate_lines(spark):
    # 4 non-empty lines, 'dup line' twice -> 1/4 dup fraction;
    # duplicated chars 16 of 28 line chars
    text = "a b a b a b\ndup line\ndup line\nx"
    r = _stats(spark, text)
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.25
    assert r["dup_line_char_frac"] == round(16 / 28, 4)
    # bigrams: 'a b' x3 (len 3) over 31 chars
    assert r["top_bigram_char_frac"] == round(9 / 31, 4)


def test_no_repetition(spark):
    r = _stats(spark, "hello world unique words here")
    assert r["n_lines"] == 1
    assert r["dup_line_frac"] == 0.0
    assert r["dup_line_char_frac"] == 0.0
    # every bigram occurs once; first one ('hello world', len 11) over 29
    assert r["top_bigram_char_frac"] == round(11 / 29, 4)


def test_edge_empty_and_single_token(spark):
    for text in ["", "one"]:
        r = _stats(spark, text)
        assert r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == 0.0
        assert r["top_bigram_char_frac"] == 0.0


def test_blank_lines_ignored(spark):
    r = _stats(spark, "x\n\n\nx")
    assert r["n_lines"] == 2
    assert r["dup_line_frac"] == 0.5
    assert r["dup_line_char_frac"] == 1.0


def test_repetition_filter_drops_and_keeps_schema(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="spam spam spam spam spam spam spam spam"),
        Row(doc_id=2, text="it was a bright cold day in april and the clocks "
                           "were striking thirteen outside in the square"),
    ])
    kept = repetition_filter(df, "text")
    assert kept.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_no_shuffle_pure_projection(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = repetition_stats(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_quality_rules(spark):
    from tenzir_spark.operators.text import (
        gopher_quality_filter,
        gopher_quality_stats,
    )

    good = ("the quick brown fox jumps over that lazy dog and then have "
            "some more words to fill this document with enough content "
            "so the word count rule passes easily now " * 2)
    docs = spark.createDataFrame(
        [
            (1, good),                                   # passes all rules
            (2, "too short"),                            # word count < 50
            (3, "- a\n- b\n- c"),                        # bullet lines + short
            (4, good + "\nx...\ny...\nz...\nw...\nv...\nu...\nt...\ns...\n"
                 "r...\nq...\np...\no...\nn...\nm..."),  # ellipsis-heavy
            (5, " ".join(["12345"] * 60)),               # no alpha words
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in
             gopher_quality_stats(docs, "text").collect()}
    assert stats[1]["gopher_keep"]
    assert not stats[2]["gopher_keep"] and stats[2]["n_words"] < 50
    assert stats[3]["bullet_line_frac"] == 1.0
    assert stats[4]["ellipsis_line_frac"] > 0.3
    assert not stats[4]["gopher_keep"]
    assert stats[5]["alpha_word_frac"] == 0.0
    assert not stats[5]["gopher_keep"]
    assert stats[1]["gopher_stop_hits"] >= 2

    kept = gopher_quality_filter(docs, "text")
    assert kept.columns == docs.columns
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_gopher_and_repetition_text_stages(spark):
    from tenzir_spark.plans.pipeline import run_tql

    docs = spark.createDataFrame(
        [(1, "the be to of and that have with " + "word salad here " * 20),
         (2, "short")],
        "doc_id long, text string")
    out = run_tql(docs, "gopher-filter text")
    assert out.columns == docs.columns
    assert {r["doc_id"] for r in out.collect()} == {1}
    rep = run_tql(docs, "repetition-filter text")
    assert rep.columns == docs.columns
