"""§2.8 metadata/control operators + yaml parser + compressed reads."""

from pyspark.sql import Row


def test_attributes_roundtrip(spark):
    from tenzir_spark.operators.meta import chart, get_attributes, set_attributes

    df = spark.createDataFrame([Row(ts=1, v=2.0)])
    out = set_attributes(df, "ts", unit="s", timezone="UTC")
    assert get_attributes(out, "ts") == {"unit": "s", "timezone": "UTC"}
    c = chart(out, "line", x="ts", y="v")
    assert get_attributes(c, "v")["chart"] == "y"
    assert get_attributes(c, "ts")["chart_type"] == "line"


def test_version_and_pass(spark):
    from tenzir_spark.operators.meta import pass_, version

    v = version(spark).collect()[0]
    assert v["engine"] == "tenzir_spark" and v["spark_version"] == spark.version
    df = spark.createDataFrame([Row(a=1)])
    assert pass_(df) is df


def test_yaml_parser(spark):
    from tenzir_spark.sources.formats import parse_yaml_field

    docs = [
        "a: 1\nb:\n  c: hello\nlist: [1, 2, 3]",
        "a: 2\nb:\n  c: world\nlist: []",
        None,
    ]
    df = spark.createDataFrame([Row(id=i, y=d) for i, d in enumerate(docs)])
    out = parse_yaml_field(df, "y", "a int, b struct<c:string>, list array<int>")
    rows = {r["id"]: r["parsed"] for r in out.collect()}
    assert rows[0]["a"] == 1 and rows[0]["b"]["c"] == "hello" and rows[0]["list"] == [1, 2, 3]
    assert rows[1]["b"]["c"] == "world"
    assert rows[2] is None


def test_gzip_lines_native(spark, tmp_path):
    """`decompress gzip | read lines` composes to a plain read — Spark
    decompresses .gz transparently (compress_decompress.cpp analog is a
    writer/reader option, not code)."""
    import gzip

    p = tmp_path / "log.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("alpha\nbeta\ngamma\n")
    from tenzir_spark.sources import read_lines

    got = sorted(r["line"] for r in read_lines(spark, str(p)).collect())
    assert got == ["alpha", "beta", "gamma"]
