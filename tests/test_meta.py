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


def test_show_aspects_from_manifests(spark, tmp_path):
    """`show partitions|fields|properties|snapshots` read straight from the
    lake manifests (builtins/aspects parity) — contents must match the
    snapshot JSON."""
    import pyspark.sql.types as T
    from tenzir_spark.lake.table import LakeTable
    from tenzir_spark.operators.meta import show

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ])
    t = LakeTable(str(tmp_path), "t_show")
    t.create(schema, n_buckets=4, properties={"watermarks": {"0": 7}})
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], schema), "doc_id")

    parts = show(spark, "partitions", t).toPandas()
    assert len(parts) == len(t.snapshot()["files"])
    assert set(parts["kind"]) == {"base"}
    assert parts["rows"].sum() == 2

    fields = {r["field"]: r["type"] for r in show(spark, "fields", t).collect()}
    assert set(fields) == {"doc_id", "n_tok"}

    props = {r["key"]: r["value"] for r in show(spark, "properties", t).collect()}
    assert '"0": 7' in props["watermarks"]

    snaps = show(spark, "snapshots", t).toPandas()
    assert list(snaps["version"]) == [0, 1]
    assert snaps.iloc[1]["total_rows"] == 2

    assert show(spark, "version").count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        show(spark, "nope", t)


def test_shell_pipes_rows_through_command(spark):
    """shell: rows stream through the child's stdin/stdout per partition
    (RDD.pipe, the Hadoop-streaming model)."""
    from tenzir_spark.operators.meta import shell

    df = spark.createDataFrame(
        [("hello",), ("world",), ("SHOUT",)], "txt string").repartition(2)
    up = shell(df, "tr a-z A-Z")
    assert sorted(r["line"] for r in up.collect()) == ["HELLO", "SHOUT", "WORLD"]
    # a filtering command drops rows
    only_o = shell(df, "grep o")  # case-sensitive: SHOUT drops
    assert sorted(r["line"] for r in only_o.collect()) == ["hello", "world"]


def test_show_operator_and_format_registries(spark):
    """`show operators|formats`: every advertised pipeline operator must
    actually be accepted by run_tql, and the format list must cover the
    parser inventory."""
    from tenzir_spark.operators.meta import _PIPELINE_OPERATORS, show_registry
    from tenzir_spark.plans.pipeline import TqlError, run_tql

    ops = {r["name"] for r in show_registry(spark, "operators").collect()}
    assert ops == set(_PIPELINE_OPERATORS)
    df = spark.range(3).selectExpr("id AS event_id", "id * 2 AS value")
    for name in ops:
        try:
            run_tql(df, f"{name}", order_by="event_id")
        except TqlError as e:
            # argument errors are fine; "unknown operator" would mean the
            # advertised registry lies
            assert "unknown operator" not in str(e)

    fmts = {r["name"] for r in show_registry(spark, "formats").collect()}
    assert {"json", "csv", "parquet", "feather", "grok", "syslog5424",
            "cef", "leef"} <= fmts
    import pytest as _pytest
    with _pytest.raises(ValueError):
        show_registry(spark, "nope")


def test_batch_and_delay(spark):
    """batch resizes partitions; delay paces batch emission by the time
    column scaled by speed (delay.cpp parity) without touching rows."""
    from tenzir_spark.operators.meta import batch, delay

    df = spark.range(1000)
    assert batch(df, 100).rdd.getNumPartitions() == 10
    assert batch(df, 10**6).rdd.getNumPartitions() == 1

    # statically-unknown row count (filter kills plan stats): NO count()
    # job may run — the one-pass fallback re-chunks Arrow batches inside
    # each partition instead of shuffling
    filtered = df.filter("id % 2 = 0").coalesce(1)
    all_jobs_before = spark.sparkContext.statusTracker().getJobIdsForGroup()
    out = batch(filtered, 100)  # lazy: must not launch any job
    all_jobs_after = spark.sparkContext.statusTracker().getJobIdsForGroup()
    assert len(all_jobs_after) == len(all_jobs_before)
    assert "MapInArrow" in out._jdf.queryExecution().toString()
    assert sorted(r["id"] for r in out.collect()) == list(range(0, 1000, 2))

    slept = []
    batches = [(0.0, "b0"), (10.0, "b1"), (11.0, "b2")]
    out = list(delay(batches, speed=5.0, sleep=slept.append))
    assert out == ["b0", "b1", "b2"]
    assert slept == [2.0, 0.2]


def test_show_connectors_aspect(spark):
    from tenzir_spark.operators.meta import show_registry

    rows = {r["name"]: (r["loader"], r["saver"])
            for r in show_registry(spark, "connectors").collect()}
    assert rows["http"] == (True, True)
    assert rows["email"] == (False, True)
    assert {"file", "stdin", "tcp", "udp", "kafka", "sqs", "amqp",
            "zmq"} <= set(rows)
