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
    with pytest.raises(TqlError, match="unknown operator"):
        run_tql2(df, "frobnicate 3")
    with pytest.raises(TqlError, match="unbound binding"):
        run_tql2(df, "where n < $nope")
    with pytest.raises(TqlError, match="constant expressions"):
        run_tql2(df, "let $x = n + 1")
    with pytest.raises(TqlError, match="not a value"):
        run_tql2(df, "where src == { select n }")
    with pytest.raises(TqlError, match="at least one arm"):
        run_tql2(df, "match src { }")
    with pytest.raises(TqlError, match="bare `this`"):
        run_tql2(df, "where this == 1")


def test_match_first_arm_wins_and_drops_unmatched(df):
    # "web" appears in BOTH arms: first-match-wins means the second arm
    # never sees web rows; "books" matches no arm and is dropped.
    got = run_tql2(df, '''
match src {
  "web" => { tag = "w" },
  "web", "code" => { tag = "c" }
}
select src, tag
sort src, n
''').collect()
    assert [(r["src"], r["tag"]) for r in got] == [
        ("code", "c"), ("web", "w"), ("web", "w")]


def test_match_arm_pipelines_and_union(df):
    got = run_tql2(df, '''
match src {
  "web" => { where n > 5 | kind = "big web" }
  "books", "code" => { kind = "other" }
}
summarize kind, c=count()
sort kind
''').collect()
    assert [(r["kind"], r["c"]) for r in got] == [("big web", 1), ("other", 2)]


def test_record_string_field_names(df):
    out = run_tql2(df, 'meta = {source: src, "n doubled": n * 2}')
    assert [f.name for f in out.schema["meta"].dataType.fields] == [
        "source", "n doubled"]


def test_record_fields_and_nested_assignment(df):
    out = run_tql2(df, '''
meta = {source: src.upper(), dn: n * 2}
meta.dn = meta.dn + 1
flag = meta.dn > 10
select src, flag
where flag
sort src
''').collect()
    # n*2+1 > 10  ⇒  n >= 5  ⇒  web(7), books(9)
    assert [r["src"] for r in out] == ["books", "web"]


def test_this_prefix_and_this_replacement(df):
    out = run_tql2(df, '''
where this.n > 5
this = {source: src, nn: this.n * 10}
sort nn
''').collect()
    assert [(r["source"], r["nn"]) for r in out] == [("web", 70), ("books", 90)]


def test_source_pipeline(spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame([Row(a=1, b="x"), Row(a=5, b="y")]).write.parquet(p)
    out = run_tql2_source(spark, f'from "{p}" | where a > 2 | select b')
    assert out.collect() == [Row(b="y")]


def test_string_escapes_keep_unicode(df):
    # unicode_escape would latin-1-mangle the é; the hand unescaper must not
    out = run_tql2(df, 'txt = "caf\\u00e9\\n" | where src == "web" | select txt')
    assert out.collect()[0]["txt"] == "café\n"
    with pytest.raises(TqlError, match="integer literal"):
        run_tql2(df, "head src")


@pytest.fixture()
def seqdf(spark):
    return spark.createDataFrame([
        Row(seq=i, src=("web" if i % 2 == 0 else "code"), n=i * 10)
        for i in range(10)
    ])


def test_order_sensitive_operators(seqdf):
    # tail/slice/taste/deduplicate thread the declared order column
    out = run_tql2(seqdf, "tail 3", order_by="seq").collect()
    assert [r["seq"] for r in out] == [7, 8, 9]

    out = run_tql2(seqdf, "slice begin=2, end=8, stride=2",
                   order_by="seq").collect()
    assert sorted(r["seq"] for r in out) == [2, 4, 6]

    out = run_tql2(seqdf, "slice 1, 4", order_by="seq").collect()
    assert sorted(r["seq"] for r in out) == [1, 2, 3]

    out = run_tql2(seqdf, "taste 2, src", order_by="seq").collect()
    assert sorted((r["src"], r["seq"]) for r in out) == [
        ("code", 1), ("code", 3), ("web", 0), ("web", 2)]

    out = run_tql2(seqdf, "deduplicate src, limit=1",
                   order_by="seq").collect()
    assert sorted(r["seq"] for r in out) == [0, 1]

    out = run_tql2(seqdf, "enumerate idx | where idx < 2",
                   order_by="seq").collect()
    assert sorted(r["seq"] for r in out) == [0, 1]


def test_order_redeclared_by_sort_and_cleared_by_select(seqdf):
    # no declared order: tail raises the targeted error …
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql2(seqdf, "tail 2")
    # … an ascending single-key sort re-declares it
    out = run_tql2(seqdf, "sort n | tail 2").collect()
    assert sorted(r["n"] for r in out) == [80, 90]
    # a select that drops the order column clears it again
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql2(seqdf, "select src, n | tail 2", order_by="seq")
    # renaming the order column re-points the declaration
    out = run_tql2(seqdf, "rename pos=seq | tail 2", order_by="seq").collect()
    assert sorted(r["pos"] for r in out) == [8, 9]


def test_top_rare_unroll_flatten(spark, seqdf):
    out = run_tql2(seqdf, "top src").collect()
    assert sorted(tuple(r) for r in out) == [("code", 5), ("web", 5)]
    out = run_tql2(seqdf, "where n > 0 | top src, 1").collect()
    assert [tuple(r) for r in out] == [("code", 5)]
    out = run_tql2(seqdf, "where n > 0 | rare src, 1").collect()
    assert [tuple(r) for r in out] == [("web", 4)]

    df = spark.createDataFrame([Row(a=1, xs=[10, 20])])
    out = run_tql2(df, "unroll xs | where xs > 10").collect()
    assert out == [Row(a=1, xs=20)]

    df = spark.createDataFrame([Row(a=Row(b=1, c="x"))])
    flat = run_tql2(df, "flatten")
    assert flat.columns == ["a.b", "a.c"]
    assert (run_tql2(flat, "unflatten").schema.simpleString()
            == df.schema.simpleString())


def test_reverse_consumes_order(seqdf):
    out = run_tql2(seqdf, "reverse | head 2", order_by="seq").collect()
    assert [r["seq"] for r in out] == [9, 8]
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql2(seqdf, "reverse | tail 2", order_by="seq")


def test_new_functions_and_methods(df):
    out = run_tql2(df, '''
r = floor(sqrt(float(n)))
lo = txt.trim().capitalize()
parts = txt.split(" ")
k = max(n, 5)
select src, r, lo, parts, k
where src == "web" and n == 3
''').collect()[0]
    assert out["r"] == 1 and out["k"] == 5
    assert out["lo"] == "Hello World" and out["parts"] == ["hello", "world"]

    out = run_tql2(df, 'y = txt.replace("hello", "bye") | select y | head 1',
                   ).collect()


def test_review_fixes_round4(spark, seqdf, df):
    # negative-stride slice selects in REVERSED traversal (a filter, not
    # a sort): the ascending order column no longer describes stream
    # positions, so it leaves scope and order-sensitive ops refuse
    out = run_tql2(seqdf, "slice begin=-1, end=-6, stride=-2",
                   order_by="seq").collect()
    assert sorted(r["seq"] for r in out) == [5, 7, 9]
    with pytest.raises(TqlError, match="needs stream order"):
        run_tql2(seqdf, "slice stride=-1 | tail 2", order_by="seq")

    # method arg validation raises the front-end error, not raw internals
    for bad in ('p = txt.split()', 'p = txt.split(src)',
                'p = txt.replace("a")'):
        with pytest.raises(TqlError, match="string literal"):
            run_tql2(df, bad)
    with pytest.raises(TqlError, match="at least two"):
        run_tql2(df, "m = min(n)")

    # taste with a discriminator but no count uses the default n
    out = run_tql2(seqdf, "taste src", order_by="seq").collect()
    assert len(out) == 10


def test_tql1_slice_negative_stride_clears_order(spark, seqdf):
    from tenzir_spark.plans.pipeline import run_tql

    with pytest.raises(TqlError, match="stream order"):
        run_tql(seqdf, "slice ::-1 | tail 2", order_by="seq")


def test_semdedup_empty_input_guard(spark):
    from tenzir_spark.operators.similarity import semdedup

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="at least one centroid"):
        semdedup(df, "embedding", "vec_id")


def test_source_pipeline_with_sink(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    dst = str(tmp_path / "out.parquet")
    spark.createDataFrame([Row(a=1), Row(a=5), Row(a=9)]).write.parquet(src)
    out = run_tql2_source(spark, f'from "{src}" | where a > 2 | to "{dst}"')
    assert sorted(r["a"] for r in out.collect()) == [5, 9]
    assert sorted(r["a"] for r in spark.read.parquet(dst).collect()) == [5, 9]


def test_else_if_chain(df):
    got = run_tql2(df, '''
if n > 8 { band = "hi" } else if n > 4 { band = "mid" } else { band = "lo" }
summarize band, c=count()
sort band
''').collect()
    assert [(r["band"], r["c"]) for r in got] == [
        ("hi", 1), ("lo", 2), ("mid", 1)]


def test_list_lambdas_map_where(df):
    out = run_tql2(df, '''
words = txt.lower().split(" ")
lens = words.map(w => w.length())
big = words.where(n => n.length() >= 5).map(w => w.upper())
salted = words.map(w => w.length() + n)
select src, n, lens, big, salted
where src == "web"
sort n
''').collect()
    # "hello world" (n=3): lens [5,5]; lambda param `n` SHADOWS column n
    # inside the .where body; outer column n stays referencable (salted)
    assert out[0]["lens"] == [5, 5]
    assert out[0]["big"] == ["HELLO", "WORLD"]
    assert out[0]["salted"] == [8, 8]
    # "Hi" (n=7): one short word -> filtered away
    assert out[1]["lens"] == [2]
    assert out[1]["big"] == []
    assert out[1]["salted"] == [9]


def test_lambda_clear_errors(df):
    with pytest.raises(TqlError, match="only valid as the argument"):
        run_tql2(df, "y = length(x => 1) | select y")
    with pytest.raises(TqlError, match="expects exactly one lambda"):
        run_tql2(df, 'y = txt.split(" ").map(3) | select y')
    with pytest.raises(TqlError, match="expects exactly one lambda"):
        run_tql2(df, 'y = txt.split(" ").where(txt) | select y')


def test_list_methods(df):
    out = run_tql2(df, '''
words = txt.lower().split(" ")
srt = words.sort()
rev = srt.reverse()
uniq = concat(txt.lower(), " ", txt.lower()).split(" ").distinct()
hd = srt.first()
tl = srt.last()
shortest = words.map(w => w.length()).min()
longest = words.map(w => w.length()).max()
total = words.map(w => w.length()).sum()
glued = srt.join("-")
up = txt.to_upper().to_lower()
select src, srt, rev, uniq, hd, tl, shortest, longest, total, glued, up
where src == "web" and n == 3
''').collect()[0]
    assert out["srt"] == ["hello", "world"]
    assert out["rev"] == ["world", "hello"]
    assert sorted(out["uniq"]) == ["hello", "world"]
    assert out["hd"] == "hello" and out["tl"] == "world"
    assert out["shortest"] == 5 and out["longest"] == 5
    assert out["total"] == 10.0
    assert out["glued"] == "hello-world"
    assert out["up"] == "hello world"


def test_list_method_edge_semantics(df):
    """Review findings: .first()/.last() null on empty lists under ANSI;
    .sum() skips null elements instead of null-poisoning."""
    out = run_tql2(df, '''
empty = txt.split(" ").where(w => w.length() > 100)
hd = empty.first()
tl = empty.last()
total = [1.0, null, 2.0].sum()
select hd, tl, total
head 1
''').collect()[0]
    assert out["hd"] is None and out["tl"] is None
    assert out["total"] == 3.0


def test_full_aggregation_registry(df):
    """The reference's complete aggregation-function registry
    (libtenzir/builtins/aggregation-functions/): any/all/stddev/variance/
    sample/approximate_median/distinct all compile and agree with TQL1
    semantics (distinct is SORTED, stddev/variance population)."""
    got = run_tql2(df, '''
big = n > 5
summarize anyb=any(big), allb=all(big), sd=stddev(n), vr=variance(n), \
med=approximate_median(n), uniq=distinct(src), samp=sample(src)
''').collect()[0]
    assert got["anyb"] is True and got["allb"] is False
    # population variance of [3, 7, 2, 9]: mean 5.25, var 8.1875
    assert abs(got["vr"] - 8.1875) < 1e-9
    assert abs(got["sd"] - 8.1875 ** 0.5) < 1e-9
    assert got["med"] == 5.0
    assert got["uniq"] == ["books", "code", "web"]  # sorted like TQL1
    assert got["samp"] in {"web", "code", "books"}


def test_source_heads_shared_with_tql1(spark, tmp_path):
    """TQL2 source heads beyond `from` resolve through the SAME machinery
    as the TQL1 text path: show/files/processes + lake export with
    changes_since render to the TQL1 head and return events."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from tenzir_spark.lake.table import DELETED_COL, LakeTable

    # introspection + host inventory heads
    ops = run_tql2_source(spark, 'show "operators" | head 3')
    assert ops.columns == ["name"] and ops.count() == 3
    (tmp_path / "a.txt").write_text("x")
    fs = run_tql2_source(
        spark, f'files "{tmp_path}" | where path.ends_with(".txt")')
    assert fs.count() == 1
    assert run_tql2_source(spark, "processes | head 1").count() == 1

    # lake export + incremental changelog options
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ])
    t = LakeTable(str(tmp_path), "t2src")
    t.create(schema, n_buckets=4)

    def delta(rows, deleted=False):
        d = spark.createDataFrame(rows, schema).withColumn(
            "_bucket", t.bucket_expr("doc_id")).withColumn(
            DELETED_COL, F.lit(deleted))
        t.delta_commit(d, schema=schema, properties={})

    delta([("a", 1), ("b", 2)])          # v1
    delta([("a", 9)])                    # v2
    delta([("b", None)], deleted=True)   # v3
    out = run_tql2_source(
        spark,
        f'export "{tmp_path}/t2src", changes_since=1 | sort doc_id')
    assert [(r["doc_id"], r["op"]) for r in out.collect()] == \
        [("a", "upsert"), ("b", "delete")]
    full = run_tql2_source(spark, f'export "{tmp_path}/t2src"')
    assert "op" not in full.columns and full.count() == 1


def test_source_head_errors(spark):
    """Unknown heads and malformed head arguments fail with the
    front-end's TqlError, never a raw exception."""
    with pytest.raises(TqlError, match="must start with"):
        run_tql2_source(spark, "where x == 1")
    with pytest.raises(TqlError, match="takes no arguments"):
        run_tql2_source(spark, 'processes "x"')
    with pytest.raises(TqlError, match="export expects"):
        run_tql2_source(spark, 'export "root", bogus=1')
    with pytest.raises(TqlError, match="cannot contain spaces"):
        run_tql2_source(spark, 'files "a dir"')
    with pytest.raises(TqlError, match="literal values"):
        run_tql2_source(spark, 'metrics doc_id')


def test_tql2_every_subpipeline(spark, tmp_path):
    """TQL2 `every`/`cron` with a braced subpipeline: scheduled
    re-execution of the body on a fake clock (the one subpipeline
    consumer; anywhere else stays a clear error)."""
    import json
    from datetime import datetime, timedelta

    import pytest

    from tenzir_spark.plans.pipeline import TqlError
    from tenzir_spark.plans.tql2 import run_tql2_every

    p = tmp_path / "ev.json"
    p.write_text("\n".join(json.dumps({"k": i, "v": i * 10})
                           for i in range(20)))
    clock = {"now": datetime(2024, 1, 1, 0, 0, 0)}

    def sleep_fn(s):
        clock["now"] += timedelta(seconds=s)

    results = run_tql2_every(
        spark,
        f'every 30s {{ from "{p}" | where k >= 10 | select k, v }}',
        n_runs=3, now_fn=lambda: clock["now"], sleep_fn=sleep_fn)
    assert len(results) == 3
    assert all(r.count() == 10 for r in results)
    # every = immediate first run: clock advanced 2 intervals, not 3
    assert clock["now"] == datetime(2024, 1, 1, 0, 1, 0)

    clock["now"] = datetime(2024, 1, 1, 0, 0, 1)
    results = run_tql2_every(
        spark, f'cron "0 */2 * * * *" {{ from "{p}" | head 5 }}',
        n_runs=2, now_fn=lambda: clock["now"], sleep_fn=sleep_fn)
    assert len(results) == 2 and all(r.count() == 5 for r in results)
    assert clock["now"] == datetime(2024, 1, 1, 0, 4, 0)

    with pytest.raises(TqlError, match="every"):
        run_tql2_every(spark, 'from "x" | where k > 1', n_runs=1)
    with pytest.raises(TqlError, match="empty"):
        run_tql2_every(spark, "every 10s {  }", n_runs=1)
    # body syntax errors surface at parse time, before any sleep
    with pytest.raises(TqlError):
        run_tql2_every(spark, "every 10s { ??? }", n_runs=1)
    # so do missing source heads and bad head arguments — a cron schedule
    # must not sleep to its first match before raising (no fake clock
    # passed: a deferred error would hang this test)
    with pytest.raises(TqlError, match="source"):
        run_tql2_every(spark, 'cron "0 0 3 * * *" { where k > 1 }', n_runs=1)
    with pytest.raises(TqlError, match="export"):
        run_tql2_every(spark, 'every 10s { export "r", bogus=1 }', n_runs=1)


def test_apply_subpipeline_argument(df):
    """`apply { pipeline }` — the general braced-subpipeline operator
    argument (parser.cpp:215-236 + 431-449): the body runs inline on
    the stream, operator statements included."""
    out = run_tql2(df, '''
apply { where n >= 3 | score = n * 2 | select src, score }
sort src
''')
    assert [(r["src"], r["score"]) for r in out.collect()] == [
        ("books", 18), ("web", 6), ("web", 14)]


def test_if_branches_run_operator_bodies(df):
    """if/else branches are FULL pipelines — where/select/summarize
    inside the braces, not just assignments."""
    out = run_tql2(df, '''
if src == "web" {
  where n > 5
  summarize src, total=sum(n)
} else {
  total = n
  select src, total
}
sort src
''')
    assert [(r["src"], r["total"]) for r in out.collect()] == [
        ("books", 9), ("code", 2), ("web", 7)]


def test_subpipeline_argument_errors(df):
    # non-consumers refuse with a targeted message
    with pytest.raises(TqlError, match="does not take a subpipeline"):
        run_tql2(df, "select { where n > 1 }")
    # a subpipeline is not a value
    with pytest.raises(TqlError, match="not a value"):
        run_tql2(df, "x = { where n > 1 }")
    # a subpipeline must be the FINAL argument
    with pytest.raises(TqlError, match="end of statement"):
        run_tql2(df, "apply { select src } select n")
    with pytest.raises(TqlError, match="apply expects"):
        run_tql2(df, "apply")
    # records keep working through the same brace discrimination
    out = run_tql2(df, "r = {a: n, b: src} | select r")
    assert out.schema.simpleString() == \
        "struct<r:struct<a:bigint,b:string>>"
