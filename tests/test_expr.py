"""TQL expression compiler: suffix/type extractors, short forms, subnet
containment (web/docs/language/expressions.md semantics)."""

import pytest
from pyspark.sql import Row

from tenzir_spark.plans import compile_expr, parse_expr
from tenzir_spark.plans.expr import where_tql


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(src_ip="10.0.1.5", dest=Row(ip="192.168.1.9", port=443),
            proto="tcp", bytes=1200, note=None),
        Row(src_ip="10.0.2.7", dest=Row(ip="172.16.0.1", port=80),
            proto="udp", bytes=90, note="x"),
        Row(src_ip="8.8.8.8", dest=Row(ip="10.0.1.99", port=53),
            proto="udp", bytes=5000, note="dns lookup"),
    ]
    return spark.createDataFrame(rows)


def ids(df, expr):
    return sorted(r["src_ip"] for r in where_tql(df, expr).collect())


def test_simple_predicates(df):
    assert ids(df, 'proto == "tcp"') == ["10.0.1.5"]
    assert ids(df, "bytes > 1000") == ["10.0.1.5", "8.8.8.8"]
    assert ids(df, 'proto != "tcp" && bytes < 100') == ["10.0.2.7"]
    assert ids(df, 'proto == "tcp" || bytes == 5000') == ["10.0.1.5", "8.8.8.8"]
    assert ids(df, '!(proto == "tcp")') == ["10.0.2.7", "8.8.8.8"]


def test_suffix_field_extractor(df):
    # `ip` ≡ `*.ip` → matches dest.ip (nested) — disjunction semantics
    assert ids(df, 'ip == "192.168.1.9"') == ["10.0.1.5"]
    # full-path wins when present
    assert ids(df, 'dest.ip == "172.16.0.1"') == ["10.0.2.7"]
    assert ids(df, "port == 53") == ["8.8.8.8"]


def test_type_extractor(df):
    # :int64 == 443 → any integer field equals 443 (port)
    assert ids(df, ":int64 == 443") == ["10.0.1.5"]
    # :ip matches src_ip AND dest.ip (name-convention ip typing)
    assert ids(df, ':ip == "10.0.1.99"') == ["8.8.8.8"]


def test_short_forms(df):
    # bare field → field != null
    assert ids(df, "note") == ["10.0.2.7", "8.8.8.8"]
    # bare value → :type == value
    assert ids(df, "443") == ["10.0.1.5"]


def test_membership(df):
    assert ids(df, 'proto in ["tcp", "icmp"]') == ["10.0.1.5"]
    assert ids(df, 'proto !in ["tcp", "icmp"]') == ["10.0.2.7", "8.8.8.8"]
    # substring: literal in field
    assert ids(df, '"dns" in note') == ["8.8.8.8"]


def test_subnet_containment(df):
    assert ids(df, "src_ip in 10.0.0.0/8") == ["10.0.1.5", "10.0.2.7"]
    assert ids(df, "src_ip in 10.0.2.0/24") == ["10.0.2.7"]
    # non-octet-aligned prefix → numeric range path
    assert ids(df, "src_ip in 10.0.0.0/15") == ["10.0.1.5", "10.0.2.7"]
    # type extractor + subnet: any ip-typed field inside the subnet
    assert ids(df, ":ip in 192.168.0.0/16") == ["10.0.1.5"]


def test_null_semantics(df):
    assert ids(df, "note == null") == ["10.0.1.5"]
    assert ids(df, "note != null") == ["10.0.2.7", "8.8.8.8"]


def test_unresolved_extractor_is_false(df):
    assert ids(df, "nonexistent == 1") == []


def test_parse_roundtrip():
    e = parse_expr('(a.b == 1 || :ip in 10.0.0.0/8) && !("x" in name)')
    # structural smoke: And of [Or[...], Not[...]]
    from tenzir_spark.plans.expr import And, Not, Or

    assert isinstance(e, And)
    assert isinstance(e.items[0], Or)
    assert isinstance(e.items[1], Not)


def test_negated_multi_field_binding_is_conjunction(spark):
    """Reference semantics (expression_visitors.cpp:443-445): a negated
    operator over a multi-field binding is a CONJUNCTION — `port != 443`
    rejects a row where ANY bound port is 443."""
    rows = [
        Row(src=Row(port=443), dst=Row(port=80), tag="a"),
        Row(src=Row(port=22), dst=Row(port=443), tag="b"),
        Row(src=Row(port=22), dst=Row(port=80), tag="c"),
    ]
    df = spark.createDataFrame(rows)
    got = sorted(r["tag"] for r in where_tql(df, "port != 443").collect())
    assert got == ["c"]  # a and b each have SOME port == 443
    # positive stays a disjunction
    got = sorted(r["tag"] for r in where_tql(df, "port == 443").collect())
    assert got == ["a", "b"]


def test_slash32_is_exact_host(df):
    # startswith("10.0.1.5") would also match 10.0.1.50-59 etc.
    assert ids(df, "src_ip in 10.0.1.5/32") == ["10.0.1.5"]
    rows = [Row(src_ip="10.0.1.5"), Row(src_ip="10.0.1.50"),
            Row(src_ip="10.0.1.55")]
    df2 = df.sparkSession.createDataFrame(rows)
    got = [r["src_ip"] for r in where_tql(df2, "src_ip in 10.0.1.5/32").collect()]
    assert got == ["10.0.1.5"]


def test_negated_and_reversed_membership(df):
    # "dns" !in note: null note propagates null -> filtered (SQL
    # three-valued logic), "x" -> kept, "dns lookup" -> rejected
    assert ids(df, '"dns" !in note') == ["10.0.2.7"]
    # field-LHS ni == reversed in; !ni its negation
    assert ids(df, 'note ni "dns"') == ["8.8.8.8"]
    assert ids(df, 'note !ni "dns"') == ["10.0.2.7"]


def test_ni_skips_type_incompatible_fields(df):
    # `port ni 4` suffix-binds dest.port (int): the reference's
    # type_resolver silently EXCLUDES type-incompatible fields from the
    # connective (expression_visitors.cpp compatible() filter) instead of
    # erroring — with only incompatible bindings the predicate is false
    # for every row, and it must not raise AnalysisException at plan time
    assert ids(df, 'port ni "4"') == []
    assert ids(df, 'bytes ni "1"') == []
    # compatible suffix binding still works: `ip ni "10."` binds dest.ip
    # (string) — only the row whose dest.ip starts with "10." matches
    assert ids(df, 'ip ni "10."') == ["8.8.8.8"]
    # literal-lhs form over an incompatible field: same exclusion
    assert ids(df, '"4" in port') == []
