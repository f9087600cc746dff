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
