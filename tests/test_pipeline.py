"""TQL pipeline-text front-end (plans/pipeline.py): text pipelines must
compile onto the operator library and match hand-built DataFrame plans;
bad text must fail with a compile error, not wrong output.

Reference: textual pipelines are the user entry point
(libtenzir/src/tql/parser.cpp; web/docs/language/syntax.md's
``export | where … | summarize … | sort | head`` example)."""

import pytest
from pyspark.sql import functions as F

from tenzir_spark.plans.pipeline import (
    TqlError,
    compile_value,
    run_tql,
    split_pipeline,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_split_pipeline_respects_quotes_and_or():
    assert split_pipeline('where a == "x|y" || b > 1 | head 5') == [
        'where a == "x|y" || b > 1',
        "head 5",
    ]
    with pytest.raises(TqlError):
        split_pipeline('where a == "unterminated')


def test_where_summarize_sort_head(events):
    out = run_tql(
        events,
        "where value > 0 && event_type != null"
        " | summarize n=count(.), sv=sum(value) by event_type"
        " | sort n desc, event_type"
        " | head 3",
    )
    expected = (
        events.filter((F.col("value") > 0) & F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .orderBy(F.col("n").desc(), F.col("event_type").asc())
        .limit(3)
    )
    assert [r.asDict() for r in out.collect()] == [
        r.asDict() for r in expected.collect()
    ]


def test_select_set_where(events):
    out = run_tql(
        events,
        "select event_id, value, user_id"
        " | set v2 = value * 2 + 1"
        " | where v2 > 50"
        " | sort event_id | head 20",
    )
    rows = out.collect()
    assert rows and list(out.columns) == ["event_id", "value", "user_id", "v2"]
    for r in rows:
        assert r["v2"] == pytest.approx(r["value"] * 2 + 1)
        assert r["v2"] > 50


def test_top_and_rename(events):
    out = run_tql(events, "top event_type --count-field=amount | head 2")
    rows = out.collect()
    assert list(out.columns) == ["event_type", "amount"]
    assert rows[0]["amount"] >= rows[1]["amount"]


def test_order_sensitive_ops_with_declared_order(events):
    out = run_tql(
        events.select("event_id", "user_id"),
        "slice 10:40:3 | enumerate idx",
        order_by="event_id",
    )
    rows = sorted(out.collect(), key=lambda r: r["idx"])
    ids = sorted(r["event_id"] for r in events.select("event_id").collect())
    assert [r["event_id"] for r in rows] == ids[10:40:3]


def test_tail_uses_sort_order(events):
    out = run_tql(events.select("event_id"), "sort event_id | tail 5")
    ids = sorted(r["event_id"] for r in events.select("event_id").collect())
    assert sorted(r["event_id"] for r in out.collect()) == ids[-5:]


def test_order_required_error(events):
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql(events, "tail 5")


def test_parse_errors(events):
    with pytest.raises(TqlError, match="unknown operator"):
        run_tql(events, "where value > 0 | frobnicate 3")
    with pytest.raises(TqlError, match="unknown aggregation"):
        run_tql(events, "summarize z=q99(value) by event_type")
    with pytest.raises(TqlError, match="unknown field"):
        run_tql(events, "select not_a_field")
    with pytest.raises(TqlError, match="unknown function"):
        run_tql(events, "set x = sketchy(value)")
    with pytest.raises(TqlError, match="slice"):
        run_tql(events, "slice nonsense", order_by="event_id")


def test_parse_operator(spark, events):
    """`parse <field> kv|grok|syslog…` inside pipeline text."""
    from pyspark.sql import functions as F

    kv = events.limit(20).select(
        "event_id",
        F.concat(F.lit("k="), F.col("event_type"), F.lit(" n="),
                 F.col("user_id")).alias("line"),
    )
    out = run_tql(kv, "parse line kv | set kind = 1").collect()
    assert all(r["line_kv"]["k"] is not None for r in out)

    sys = spark.createDataFrame(
        [("<34>1 2024-01-01T00:00:00Z h app 1 m - body text",)], "line string")
    r = run_tql(sys, "parse line syslog5424 | select hostname, message").first()
    assert r["hostname"] == "h" and r["message"] == "body text"

    with pytest.raises(TqlError, match="unknown parser"):
        run_tql(kv, "parse line nonsense")
    with pytest.raises(TqlError, match="needs a"):
        run_tql(kv, "parse line grok")


def test_from_to_end_to_end(spark, tmp_path):
    """`from <path> read <fmt> | ops | to <path>`: full textual pipeline
    incl. source resolution (extension inference) and sink execution."""
    from tenzir_spark.plans.pipeline import run_tql_source

    src = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    src_path = str(tmp_path / "in.parquet")
    src.write.parquet(src_path)
    out_path = str(tmp_path / "out.parquet")

    df = run_tql_source(
        spark,
        f"from {src_path} | where v >= 100 | set w = v + 1"
        f" | sort k | head 10 | to {out_path}",
    )
    back = spark.read.parquet(out_path)
    assert back.count() == 10 == df.count()
    rows = {r["k"]: r for r in back.collect()}
    assert set(rows) == set(range(50, 60))
    assert all(r["w"] == r["v"] + 1 for r in rows.values())

    # csv roundtrip with explicit formats + `write … to` order
    csv_out = str(tmp_path / "out_dir")
    run_tql_source(spark, f"from {src_path} read parquet | head 5"
                          f" | write csv to {csv_out}")
    assert spark.read.option("header", True).csv(csv_out).count() == 5

    # json extension inference on the read side
    j = str(tmp_path / "in.json")
    src.limit(7).write.json(j)
    got = run_tql_source(spark, f"from {j} | measure").first()
    assert got["events"] == 7

    with pytest.raises(TqlError, match="must start with"):
        run_tql_source(spark, "where x > 1")
    with pytest.raises(TqlError, match="unknown read format"):
        run_tql_source(spark, f"from {src_path} read cassette")


def test_apply_includes_pipeline_file(events, tmp_path, monkeypatch):
    """`apply <file>`: splice a pipeline from disk (.tql auto-extension,
    TENZIR_SPARK_APPLY_PATH search)."""
    d = tmp_path / "applydir"
    d.mkdir()
    (d / "cleanup.tql").write_text(
        "where value > 0 | select event_id, value | set v2 = value * 2")
    monkeypatch.setenv("TENZIR_SPARK_APPLY_PATH", str(d))
    out = run_tql(events, "apply cleanup | sort event_id | head 5")
    rows = out.collect()
    assert len(rows) == 5 and list(out.columns) == ["event_id", "value", "v2"]
    assert all(r["v2"] == pytest.approx(r["value"] * 2) for r in rows)
    with pytest.raises(TqlError, match="not found"):
        run_tql(events, "apply nonexistent")


def test_enrich_lookup_context_stages(spark, events, tmp_path):
    """`enrich <ctx>` / `lookup <ctx> --field <f>` against a lake-backed
    ContextStore threaded through run_tql."""
    from pyspark.sql import functions as F

    from tenzir_spark.operators.contexts import ContextStore

    store = ContextStore(spark, str(tmp_path))
    ctx = spark.createDataFrame(
        [("click", "ui"), ("view", "passive")], "event_type string, cls string")
    store.create("etypes", ctx, key="event_type")

    out = run_tql(events.limit(200), "enrich etypes | select event_id, cls",
                  context_store=store)
    rows = out.collect()
    assert any(r["cls"] == "ui" for r in rows)
    assert any(r["cls"] is None for r in rows)  # left join keeps non-matches

    hits = run_tql(events.limit(200),
                   "lookup etypes --field event_type | measure",
                   context_store=store).first()["events"]
    assert 0 < hits < 200

    with pytest.raises(TqlError, match="needs a ContextStore"):
        run_tql(events, "enrich etypes")


def test_export_import_lake_stages(spark, tmp_path):
    """`export <table>` reads the lake table's current state; a trailing
    `import <table>` append-commits the pipeline output into another."""
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import LakeTable
    from tenzir_spark.plans.pipeline import run_tql_source

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ])
    src = LakeTable(str(tmp_path), "src_t")
    src.create(schema, n_buckets=4)
    src.append(spark.createDataFrame(
        [(f"d{i}", i) for i in range(20)], schema), "doc_id")

    dst = LakeTable(str(tmp_path), "dst_t")
    dst.create(schema, n_buckets=4)

    out = run_tql_source(
        spark,
        f"export {tmp_path}/src_t | where n_tok >= 10"
        f" | import {tmp_path}/dst_t",
    )
    assert out.count() == 10
    got = {r["doc_id"] for r in dst.read(spark).collect()}
    assert got == {f"d{i}" for i in range(10, 20)}


def test_export_changes_since_stage(spark, tmp_path):
    """`export <table> --changes-since <v>` streams the incremental
    changelog (net change per key, op column) through the pipeline."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from tenzir_spark.lake.table import DELETED_COL, LakeTable
    from tenzir_spark.plans.pipeline import run_tql_source

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ])
    t = LakeTable(str(tmp_path), "ch_t")
    t.create(schema, n_buckets=4)

    def delta(rows, deleted=False):
        df = spark.createDataFrame(rows, schema).withColumn(
            "_bucket", t.bucket_expr("doc_id")).withColumn(
            DELETED_COL, F.lit(deleted))
        t.delta_commit(df, schema=schema, properties={})

    delta([("a", 1), ("b", 2)])          # v1
    delta([("a", 9)])                    # v2 (supersedes a)
    delta([("b", None)], deleted=True)   # v3

    out = run_tql_source(
        spark, f"export {tmp_path}/ch_t --changes-since 1 | sort doc_id")
    rows = [(r["doc_id"], r["op"]) for r in out.collect()]
    assert rows == [("a", "upsert"), ("b", "delete")]
    # plain export still works and has no op column
    full = run_tql_source(spark, f"export {tmp_path}/ch_t")
    assert "op" not in full.columns and full.count() == 1


def test_compile_value_arithmetic(events):
    c = compile_value('round(value / 2, 1) + length("ab")', events.schema)
    row = events.select(F.col("value").alias("value"), c.alias("out")).first()
    assert row["out"] == pytest.approx(round(row["value"] / 2, 1) + 2)


def test_summarize_resolution(events):
    out = run_tql(
        events,
        "summarize n=count(.) by ts, event_type resolution 1 hour",
    )
    expected = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("ts"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == expected.count()
    assert set(out.columns) == {"ts", "event_type", "n"}


def test_local_remote_unordered_modifiers(spark):
    """local/remote wrap the next operator as location tags (no-ops in a
    one-engine world); unordered clears the declared stream order so a
    downstream order-sensitive op must re-sort."""
    import pytest
    from pyspark.sql import functions as F

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("k"))

    out = run_tql(df, "local where k == 3 | remote select event_id",
                  order_by="event_id")
    assert out.columns == ["event_id"]
    assert out.count() == 14

    # unordered drops the order declaration: tail then errors
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql(df, "unordered pass | tail 5", order_by="event_id")
    # ...but a re-sort restores it
    assert run_tql(df, "unordered pass | sort event_id | tail 5",
                   order_by="event_id").count() == 5

    with pytest.raises(TqlError, match="expected a wrapped operator"):
        run_tql(df, "local", order_by="event_id")


def test_sigma_pseudonymize_codec_stages(spark, tmp_path):
    """Late-r3 text stages: `sigma <file>` (multi-document one-scan),
    `pseudonymize <field>`, and the compress|decompress round trip."""
    rules = tmp_path / "rules.yml"
    rules.write_text(
        "title: Download\n"
        "detection:\n"
        "  sel:\n"
        "    cmd|contains: 'curl'\n"
        "  condition: sel\n"
        "---\n"
        "title: Shell\n"
        "detection:\n"
        "  sel:\n"
        "    img|endswith: '/bash'\n"
        "  condition: sel\n"
    )
    df = spark.createDataFrame(
        [("curl http://x", "/bin/bash", "10.1.2.3"),
         ("ls", "/bin/ls", "10.1.9.9"),
         ("curl -s y", "/usr/bin/curl", "192.168.0.1")],
        "cmd string, img string, ip string")
    out = run_tql(df, f"sigma {rules}").collect()
    tags = sorted((r["cmd"], r["sigma_tag"]) for r in out)
    # row 1 matches BOTH rules (fan-out), row 3 matches Download only
    assert tags == [("curl -s y", "Download"),
                    ("curl http://x", "Download"),
                    ("curl http://x", "Shell")]

    ps = run_tql(df, "pseudonymize --seed s3cret ip").collect()
    anon = {r["cmd"]: r["ip"] for r in ps}
    assert anon["curl http://x"] != "10.1.2.3"
    # prefix preservation: the two 10.1.x.x addresses share two octets
    assert (anon["curl http://x"].split(".")[:2]
            == anon["ls"].split(".")[:2])
    with pytest.raises(TqlError):
        run_tql(df, "pseudonymize --method rot13 ip")

    blob = spark.createDataFrame([("abc" * 100,)], "data string")
    rt = run_tql(blob, "compress zlib | decompress zlib").collect()
    assert bytes(rt[0]["data"]).decode() == "abc" * 100


def test_publish_subscribe_stages(spark, events, tmp_path):
    """`publish <wh>/<topic>` mid-pipeline forwards rows and appends a
    segment; `subscribe <wh>/<topic>` heads a source pipeline."""
    from tenzir_spark.plans.pipeline import run_tql_source

    wh = str(tmp_path / "wh")
    out = run_tql(events.limit(50), f"where value > 0 | publish {wh}/hot")
    n = out.count()
    assert n > 0
    got = run_tql_source(
        spark, f"subscribe {wh}/hot | summarize n=count(.)").collect()
    assert got[0]["n"] == n
    with pytest.raises(TqlError):
        run_tql_source(spark, "subscribe nopath")


def test_run_tql_every_and_cron(spark, tmp_path):
    """`every`/`cron` source modifiers in pipeline text: scheduled
    re-execution of the remaining pipeline on a fake clock."""
    import json
    from datetime import datetime, timedelta

    from tenzir_spark.plans.pipeline import (
        TqlError,
        parse_duration,
        run_tql_every,
    )

    assert parse_duration("10s").total_seconds() == 10
    assert parse_duration("1.5min").total_seconds() == 90
    assert parse_duration("2h30m").total_seconds() == 9000
    assert parse_duration("250ms").total_seconds() == 0.25
    with pytest.raises(TqlError):
        parse_duration("soon")

    p = tmp_path / "ev.json"
    p.write_text("\n".join(json.dumps({"k": i, "v": i * 10})
                           for i in range(20)))
    clock = {"now": datetime(2024, 1, 1, 0, 0, 0)}

    def sleep_fn(s):
        clock["now"] += timedelta(seconds=s)

    results = run_tql_every(
        spark, f"every 30s from {p} read json | where k >= 10 | select k, v",
        n_runs=3, now_fn=lambda: clock["now"], sleep_fn=sleep_fn)
    assert len(results) == 3
    assert all(r.count() == 10 for r in results)
    # every = immediate first run: clock advanced 2 intervals, not 3
    assert clock["now"] == datetime(2024, 1, 1, 0, 1, 0)

    clock["now"] = datetime(2024, 1, 1, 0, 0, 1)
    results = run_tql_every(
        spark, f'cron "0 */2 * * * *" from {p} read json | head 5',
        n_runs=2, now_fn=lambda: clock["now"], sleep_fn=sleep_fn)
    assert len(results) == 2 and all(r.count() == 5 for r in results)
    # cron waits for the first match: fires at :02:00 and :04:00
    assert clock["now"] == datetime(2024, 1, 1, 0, 4, 0)

    with pytest.raises(TqlError):
        run_tql_every(spark, "from x | pass", n_runs=1)


def test_metrics_source_stage(spark, tmp_path):
    """`metrics <warehouse>` feeds the engine's ingest telemetry into a
    pipeline (reference operators/metrics.cpp); `show snapshots` stays
    usable after expiry and carries the rollback marker."""
    import pyspark.sql.types as T

    from tenzir_spark.cdc.runner import IngestRunner
    from tenzir_spark.operators.meta import show
    from tenzir_spark.plans.pipeline import run_tql_source

    runner = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4)
    runner.ensure_table()
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    for b in range(3):
        runner.apply_batch_df(spark.createDataFrame(
            [(f"d{i}", [b], 1, "web", "insert", 0, b * 10 + i)
             for i in range(5)], ev_schema), b)

    out = run_tql_source(
        spark,
        f"metrics {tmp_path}/wh | where events_applied > 0 "
        "| summarize applied=sum(events_applied) by part_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["applied"] == 15

    # snapshots aspect after rollback + expiry: no crash, marker present
    v = runner.table.rollback(1)
    runner.table.expire_snapshots(keep_last=3)
    snaps = {r["version"]: r for r in
             show(spark, "snapshots", runner.table).collect()}
    assert set(snaps) == set(runner.table.versions())
    assert snaps[v]["rollback_of"] == 1


def test_timeshift_start_with_space(events):
    """`timeshift ts "2024-01-01 00:00:00"` — a start instant containing a
    space must parse (quoted or not) instead of silently nulling the time
    column."""
    out = run_tql(events, 'timeshift ts "2024-01-01 00:00:00"')
    got = out.selectExpr("min(ts) AS m").first()["m"]
    assert got is not None and str(got).startswith("2024-01-01")
    out2 = run_tql(events, "timeshift ts 2024-01-01 00:00:00")
    assert out2.selectExpr("min(ts)").first()[0] == got


def test_assignment_string_with_comma_and_parens(events):
    """Commas/brackets inside quoted RHS strings must not split or
    unbalance the assignment parser."""
    out = run_tql(
        events,
        'head 3 | set msg="hello, world", tag="((" | select event_id, msg, tag')
    rows = out.collect()
    assert all(r["msg"] == "hello, world" and r["tag"] == "((" for r in rows)


def test_nested_sort_and_resolution_paths(spark):
    """sort + slice on a NESTED column (dotted path) and summarize
    resolution with a nested time key both resolve dtypes through
    dtype_of instead of crashing on StructType['a.b']."""
    import datetime as dt

    from pyspark.sql import Row

    rows = [Row(conn=Row(ts=dt.datetime(2024, 1, 1, h), n=h), tag=f"t{h}")
            for h in range(6)]
    df = spark.createDataFrame(rows)
    out = run_tql(df, "sort conn.n desc | head 2 | select tag")
    assert [r["tag"] for r in out.collect()] == ["t5", "t4"]
    out2 = run_tql(df, "sort conn.n | slice 1:3 | select tag")
    assert [r["tag"] for r in out2.collect()] == ["t1", "t2"]
    out3 = run_tql(
        df, "summarize c=count(tag) by conn.ts resolution 1 hour")
    assert sorted(r["c"] for r in out3.collect()) == [1] * 6


def test_sigma_dir_with_multidoc_file(events, tmp_path):
    """A ---separated multi-rule file inside a rules DIRECTORY splits
    like a directly-passed file (was a raw yaml ComposerError)."""
    (tmp_path / "rules").mkdir()
    (tmp_path / "rules" / "multi.yml").write_text(
        "title: A\nlogsource: {category: test}\n"
        "detection:\n  sel:\n    event_type: purchase\n  condition: sel\n"
        "---\n"
        "title: B\nlogsource: {category: test}\n"
        "detection:\n  sel:\n    event_type: click\n  condition: sel\n")
    out = run_tql(events, f"sigma {tmp_path}/rules")
    types = {r["event_type"] for r in out.collect()}
    assert types and types <= {"purchase", "click"}


def test_assignments_escaped_backslash_before_quote():
    # x="a\\" ends its string (the second backslash is itself escaped);
    # the following top-level comma must still split assignments
    from tenzir_spark.plans.pipeline import _assignments

    out = _assignments('x="a\\\\", y=2')
    assert [k for k, _v in out] == ["x", "y"]
    assert out[0][1] == '"a\\\\"'


def test_export_flag_order_and_errors(spark, tmp_path):
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import DELETED_COL, LakeTable
    from tenzir_spark.plans.pipeline import TqlError, run_tql_source

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ])
    t = LakeTable(str(tmp_path), "ord_t")
    t.create(schema, n_buckets=4)
    for rows in ([("a", 1)], [("a", 2)], [("a", 3)]):
        df = spark.createDataFrame(rows, schema).withColumn(
            "_bucket", t.bucket_expr("doc_id")).withColumn(
            DELETED_COL, F.lit(False))
        t.delta_commit(df, schema=schema, properties={})

    # flag order does not matter: --to before --changes-since parses
    a = run_tql_source(
        spark, f"export {tmp_path}/ord_t --changes-since 1 --to 2").collect()
    b = run_tql_source(
        spark, f"export {tmp_path}/ord_t --to 2 --changes-since 1").collect()
    assert a == b and len(a) == 1 and a[0]["n_tok"] == 2

    # targeted errors, not the generic 'pipeline must start with…' one
    with pytest.raises(TqlError, match="--to requires --changes-since"):
        run_tql_source(spark, f"export {tmp_path}/ord_t --to 5")
    with pytest.raises(TqlError, match="unknown option '--bogus'"):
        run_tql_source(spark, f"export {tmp_path}/ord_t --bogus 1")
    with pytest.raises(TqlError, match="expects an integer"):
        run_tql_source(spark, f"export {tmp_path}/ord_t --changes-since x")


def test_curation_text_stages(spark, sf_dir):
    """sample / c4-filter / window-dedup / pack as pipeline text."""
    from tenzir_spark.plans.pipeline import run_tql
    from tenzir_spark.operators.sampling import deterministic_sample
    from tenzir_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"] for r in run_tql(
        docs, "sample 0.25 by doc_id | select doc_id").collect()}
    want = {r["doc_id"] for r in deterministic_sample(
        docs, "doc_id", 0.25).select("doc_id").collect()}
    assert got == want and got

    kept = run_tql(docs, "c4-filter text")
    assert kept.columns == docs.columns
    from pyspark.sql import functions as F

    from tenzir_spark.operators.text import c4_stats
    # the synthetic corpus has no terminal-punctuation lines, so 0 kept
    # here is correct — equality with the stats flag is the contract
    assert kept.count() == c4_stats(docs, "text").filter(F.col("c4_keep")).count()

    wd = run_tql(docs, "window-dedup text by doc_id w 8")
    assert wd.columns == docs.columns
    assert wd.count() < docs.count()

    spans = run_tql(docs, "pack n_chars by doc_id block 4096")
    assert set(spans.columns) == {
        "doc_id", "block_id", "doc_offset", "block_offset", "span_len"}
    assert spans.count() == pack_sequences(
        docs, "doc_id", "n_chars", block=4096).count()

    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError
    with _pytest.raises(TqlError, match="usage"):
        run_tql(docs, "sample doc_id")


def test_cluster_dedup_and_lm_filter_text_stages(spark, sf_dir):
    """cluster-dedup / lm-filter as pipeline text."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # NB `where is_canonical` alone would be the reference's EXISTENCE
    # predicate (bare field → field != null, expressions.md:181); the
    # truth test needs the explicit comparison
    cd = run_tql(docs, "cluster-dedup text by doc_id | where is_canonical == true")
    assert set(cd.columns) == set(docs.columns) | {
        "component", "cluster_size", "is_canonical"}
    # keep-one-per-cluster never grows the corpus, and every kept row is
    # its own component's canonical member
    n = cd.count()
    assert 0 < n <= docs.count()
    assert cd.filter(F.col("component") != F.col("doc_id")).count() == 0

    from tenzir_spark.operators.lm import lm_filter

    lf = run_tql(
        docs, "lm-filter text by doc_id ref source=src0 max-ppl 500")
    assert lf.columns == docs.columns
    want = lm_filter(docs, "text", "doc_id",
                     F.col("source") == "src0", max_ppl=500.0).count()
    assert lf.count() == want

    with _pytest.raises(TqlError, match="usage"):
        run_tql(docs, "cluster-dedup text")
    with _pytest.raises(TqlError, match="usage"):
        run_tql(docs, "lm-filter text by doc_id")


def test_near_dedup_text_stage(spark, tmp_path):
    """near-dedup as pipeline text: incremental index dedup — batch 0
    populates the index, batch 1 dedups against it."""
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    root = str(tmp_path / "ndi")
    t = ("the quick brown fox jumps over the lazy dog again and again "
         "while the winter rain keeps falling on the quiet old town")
    u = ("pack my box with five dozen liquor jugs before the long dark "
         "winter comes around and the river freezes solid once more")
    b0 = spark.createDataFrame([("d1", t), ("d2", u)],
                               "doc_id string, text string")
    r0 = run_tql(b0, f"near-dedup text by doc_id index {root} batch 0")
    assert r0.columns == b0.columns
    assert r0.count() == 2
    b1 = spark.createDataFrame([("e1", t), ("e2", "something else "
                                                  "entirely different here "
                                                  "that shares no shingles")],
                               "doc_id string, text string")
    r1 = run_tql(b1, f"near-dedup text by doc_id index {root} batch 1")
    assert sorted(r["doc_id"] for r in r1.collect()) == ["e2"]
    with _pytest.raises(TqlError, match="usage"):
        run_tql(b0, "near-dedup text by doc_id")


def test_semantic_dedup_text_stage(spark, tmp_path):
    """semantic-dedup as pipeline text over the embedding index."""
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    root = str(tmp_path / "cdi")
    b0 = spark.createDataFrame(
        [("d1", [1.0, 2.0, 3.0, 4.0]), ("d2", [-4.0, 3.0, -2.0, 1.0])],
        "vec_id string, emb array<double>")
    r0 = run_tql(b0, f"semantic-dedup emb by vec_id index {root} dim 4 "
                     f"batch 0")
    assert r0.count() == 2
    # omitted batch in a BATCH pipeline is a targeted error (defaulting
    # to 0 would silently never dedup against prior state)
    with _pytest.raises(TqlError, match="batch"):
        run_tql(b0, f"semantic-dedup emb by vec_id index {root} dim 4")
    b1 = spark.createDataFrame(
        [("e1", [2.0, 4.0, 6.0, 8.0]), ("e2", [3.0, -4.0, 1.0, -2.0])],
        "vec_id string, emb array<double>")
    r1 = run_tql(b1, f"semantic-dedup emb by vec_id index {root} dim 4 "
                     f"batch 1")
    assert sorted(r["vec_id"] for r in r1.collect()) == ["e2"]
    with _pytest.raises(TqlError, match="usage"):
        run_tql(b0, "semantic-dedup emb by vec_id")


def test_web_curation_text_stages(spark):
    """html-extract / url-filter / quality-filter as pipeline text."""
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = spark.createDataFrame(
        [(1, "<p>hello &amp; world</p>", "https://good.example.com/a"),
         (2, "<script>x</script><b>kept</b>", "https://ads.tracker.net/b"),
         (3, "plain", "ftp://files.example.com/c")],
        "doc_id int, text string, url string")

    he = run_tql(df, "html-extract text | select doc_id, text")
    got = {r["doc_id"]: r["text"] for r in he.collect()}
    assert got == {1: "hello & world", 2: "kept", 3: "plain"}

    uf = run_tql(df, "url-filter url block tracker.net | select doc_id")
    assert sorted(r["doc_id"] for r in uf.collect()) == [1]

    qf = run_tql(df, "quality-filter text")
    assert qf.columns == df.columns
    from tenzir_spark.operators.selection import quality_classifier
    from pyspark.sql import functions as F

    want = quality_classifier(df, "text").filter(F.col("qc_keep")).count()
    assert qf.count() == want
    # min-prob 1.01 is unreachable -> empty
    assert run_tql(df, "quality-filter text min-prob 1.01").count() == 0

    with _pytest.raises(TqlError, match="usage"):
        run_tql(df, "url-filter url")


def test_show_and_host_source_heads(spark, tmp_path):
    """`show <aspect>` and files/processes/sockets/nics run as pipeline
    SOURCE heads (show.md: "show operators | where …"; files.md)."""
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql_source

    ops = run_tql_source(
        spark, "show operators | where name == \"where\"").collect()
    assert [r["name"] for r in ops] == ["where"]
    assert run_tql_source(spark, "show formats | head 3").count() == 3

    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("yy")
    names = {r["name"] for r in run_tql_source(
        spark, f"files {tmp_path} | where type == \"regular\" | "
               "select name").collect()}
    assert names == {"a.txt", "b.txt"}

    assert run_tql_source(spark, "processes | head 1").count() == 1
    assert run_tql_source(spark, "nics | measure").first()["events"] >= 1

    # lake aspects still need a table root; registry aspects reject args
    with _pytest.raises(TqlError, match="needs a lake table root"):
        run_tql_source(spark, "show partitions")
    with _pytest.raises(TqlError, match="takes no argument"):
        run_tql_source(spark, "processes now")


def test_temporal_text_stages(spark):
    """sessionize / fill-forward / rolling as pipeline text
    (operators/asof.py family)."""
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = spark.createDataFrame(
        [("a", 0.0, None), ("a", 10.0, 2.0), ("a", 100.0, None),
         ("b", 0.0, 5.0)],
        "k string, ts double, v double")
    out = {(r["k"], r["ts"]): r for r in
           run_tql(df, "sessionize ts by k gap 30s "
                       "| fill-forward v by k ts ts "
                       "| rolling sum,count v by k ts ts window 1m"
                   ).collect()}
    assert out[("a", 10.0)]["session_no"] == 0
    assert out[("a", 100.0)]["session_no"] == 1
    assert out[("a", 100.0)]["v"] == 2.0           # carried forward
    assert out[("a", 100.0)]["sum_v_roll"] == 2.0  # rolling AFTER fill
    assert out[("a", 10.0)]["count_v_roll"] == 1   # null v at ts=0
    assert out[("b", 0.0)]["session_no"] == 0

    with _pytest.raises(TqlError, match="usage"):
        run_tql(df, "sessionize ts gap 30s")
    with _pytest.raises(TqlError, match="rolling"):
        run_tql(df, "rolling nope v by k ts ts window 1m")


def test_asof_join_text_stage(spark, tmp_path):
    import pytest as _pytest

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    spark.createDataFrame(
        [("a", 5.0, 1.5), ("a", 20.0, 2.5)], "k string, ts double, px double"
    ).write.parquet(str(tmp_path / "quotes"))
    df = spark.createDataFrame(
        [("a", 7.0), ("a", 25.0), ("a", 1.0)], "k string, ts double")

    out = {r["ts"]: r for r in run_tql(
        df, f"asof-join {tmp_path}/quotes on k ts ts").collect()}
    assert out[7.0]["px"] == 1.5 and out[7.0]["ts_r"] == 5.0
    assert out[25.0]["px"] == 2.5
    assert out[1.0]["px"] is None

    out2 = {r["ts"]: r["px"] for r in run_tql(
        df, f"asof-join {tmp_path}/quotes on k ts ts "
            "direction forward tolerance 5s").collect()}
    assert out2[1.0] == 1.5      # forward to ts=5 within 5s
    assert out2[7.0] is None     # forward to 20 is 13s > tolerance

    with _pytest.raises(TqlError, match="usage"):
        run_tql(df, "asof-join quotes ts ts")


def test_chunk_and_fim_stages(spark):
    """`chunk`/`fim` as pipeline text, including a NESTED id path for
    chunk (dotted paths flatten to their leaf name in the output)."""
    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = spark.createDataFrame(
        [(1, list(range(30)))], "doc_id: long, tokens: array<int>")
    out = run_tql(df, "chunk tokens by doc_id max 16 overlap 4").collect()
    assert sorted((r["chunk_idx"], r["chunk_len"]) for r in out) == \
        [(0, 16), (1, 16), (2, 6)]

    nested = df.select(F.struct(F.col("doc_id").alias("id")).alias("meta"),
                       "tokens")
    out = run_tql(nested, "chunk tokens by meta.id max 16 overlap 4")
    rows = out.collect()
    assert out.columns[0] == "id" and len(rows) == 3

    r = run_tql(df, "fim tokens by doc_id rate 100 mode spm").collect()[0]
    assert r["fim_applied"] and list(r["fim_tokens"])[:2] == [-1, -3]
    r = run_tql(df, "fim tokens by doc_id rate 0").collect()[0]
    assert not r["fim_applied"] and list(r["fim_tokens"]) == list(range(30))

    with pytest.raises(TqlError, match="chunk: usage"):
        run_tql(df, "chunk tokens max 16")
    with pytest.raises(TqlError, match="fim: usage"):
        run_tql(df, "fim tokens by doc_id mode xyz")
    # operator-level arg validation surfaces as TqlError through the
    # text path (overlap >= max_len)
    with pytest.raises(TqlError, match="overlap"):
        run_tql(df, "chunk tokens by doc_id max 8 overlap 8")
