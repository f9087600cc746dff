"""TQL2 front-end subset (libtenzir/src/tql2/parser.cpp:85-245)."""

import pytest
from pyspark.sql import Row

from tenzir_spark.plans.pipeline import TqlError
from tenzir_spark.plans.tql2 import run_tql2, run_tql2_source


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([
        Row(src="web", n=3, txt="hello world"),
        Row(src="web", n=7, txt="Hi"),
        Row(src="code", n=2, txt="x = 1"),
        Row(src="books", n=9, txt="Moby"),
    ])


def test_let_where_assign_select(df):
    out = run_tql2(df, '''
let $lim = 2 + 3
where n < $lim and txt.lower().starts_with("h")
score = n * 10
select src, score
''')
    assert out.collect() == [Row(src="web", score=30)]


def test_summarize_keys_and_named_aggs(df):
    got = run_tql2(df, "summarize src, total=sum(n), cnt=count() | sort -total").collect()
    assert [(r["src"], r["total"], r["cnt"]) for r in got] == [
        ("web", 10, 2), ("books", 9, 1), ("code", 2, 1)]


def test_if_else_stream_routing(df):
    got = run_tql2(df, '''
if n > 5 { tag = "big" } else { tag = "small" | where src != "code" }
select src, tag
sort src, tag
''').collect()
    assert [(r["src"], r["tag"]) for r in got] == [
        ("books", "big"), ("web", "big"), ("web", "small")]


def test_in_list_and_methods(df):
    assert run_tql2(df, 'where src in ["web", "code"] | summarize c=count()'
                    ).collect()[0]["c"] == 3
    assert run_tql2(df, "where txt.length() >= 5 | summarize c=count()"
                    ).collect()[0]["c"] == 2


def test_rename_head_numbers_with_suffix(df):
    out = run_tql2(df, "rename source=src | where n < 1k | select source | sort source | head 1")
    assert out.collect() == [Row(source="books")]


def test_clear_errors(df):
    with pytest.raises(TqlError, match="match statements"):
        run_tql2(df, 'match src { "web" => { pass } }')
    with pytest.raises(TqlError, match="record expressions"):
        run_tql2(df, "where src == {a: 1}")
    with pytest.raises(TqlError, match="unknown operator"):
        run_tql2(df, "frobnicate 3")
    with pytest.raises(TqlError, match="unbound binding"):
        run_tql2(df, "where n < $nope")
    with pytest.raises(TqlError, match="constant expressions"):
        run_tql2(df, "let $x = n + 1")


def test_source_pipeline(spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame([Row(a=1, b="x"), Row(a=5, b="y")]).write.parquet(p)
    out = run_tql2_source(spark, f'from "{p}" | where a > 2 | select b')
    assert out.collect() == [Row(b="y")]
