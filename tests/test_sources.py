"""Format parsers (§2.2): golden asserts on literal wire-format strings.

Mirrors the reference's BATS golden tests over fixture inputs
(tenzir/integration/tests/*.bats diffing checked-in references)."""

import textwrap

from pyspark.sql import Row

from tenzir_spark.sources import (
    parse_cef,
    parse_leef,
    parse_syslog3164,
    parse_syslog5424,
    read_zeek_tsv,
)

ZEEK_CONN = textwrap.dedent(
    """\
    #separator \\x09
    #set_separator\t,
    #empty_field\t(empty)
    #unset_field\t-
    #path\tconn
    #fields\tts\tuid\tid.orig_h\tid.orig_p\tproto\tduration\torig_bytes\tlocal_orig
    #types\ttime\tstring\taddr\tport\tenum\tinterval\tcount\tbool
    1637155963.237882\tCZ5FCZpYw\t10.0.0.1\t52386\ttcp\t0.25\t124\tT
    1637155965.000000\tAbCdEfGh1\t192.168.1.9\t443\tudp\t-\t-\tF
    """
).replace("    ", "")


def test_zeek_tsv(spark, tmp_path):
    p = tmp_path / "conn.log"
    p.write_text(ZEEK_CONN)
    df = read_zeek_tsv(spark, str(p))
    rows = df.orderBy("uid").collect()
    assert df.columns == [
        "ts", "uid", "id.orig_h", "id.orig_p", "proto", "duration",
        "orig_bytes", "local_orig",
    ]
    r = {x["uid"]: x for x in rows}
    assert r["CZ5FCZpYw"]["id.orig_h"] == "10.0.0.1"
    assert r["CZ5FCZpYw"]["id.orig_p"] == 52386
    assert r["CZ5FCZpYw"]["duration"] == 0.25
    assert r["CZ5FCZpYw"]["orig_bytes"] == 124
    assert r["CZ5FCZpYw"]["local_orig"] is True
    # unset fields ('-') decode as NULL
    assert r["AbCdEfGh1"]["duration"] is None
    assert r["AbCdEfGh1"]["orig_bytes"] is None
    assert r["AbCdEfGh1"]["local_orig"] is False


def test_syslog_3164(spark):
    line = "<165>Nov 17 13:32:43 myhost sshd[1234]: Failed password for root"
    df = spark.createDataFrame([Row(line=line)])
    r = df.select(*parse_syslog3164("line")).collect()[0]
    assert (r["facility"], r["severity"]) == (20, 5)
    assert r["timestamp"] == "Nov 17 13:32:43"
    assert r["hostname"] == "myhost"
    assert r["app_name"] == "sshd"
    assert r["process_id"] == 1234
    assert r["content"] == "Failed password for root"


def test_syslog_5424(spark):
    line = ('<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su 1 ID47 '
            '[exampleSDID@32473 iut="3"] BOM an application event')
    df = spark.createDataFrame([Row(line=line)])
    r = df.select(*parse_syslog5424("line")).collect()[0]
    assert (r["facility"], r["severity"]) == (4, 2)
    assert r["version"] == 1
    assert r["hostname"] == "mymachine.example.com"
    assert r["app_name"] == "su"
    assert r["process_id"] == "1"
    assert r["message_id"] == "ID47"
    assert r["structured_data"] == {"exampleSDID@32473.iut": "3"}
    assert r["structured_data_raw"] == '[exampleSDID@32473 iut="3"]'
    assert r["message"] == "BOM an application event"


def test_syslog_5424_octet_framing_and_multi_sd(spark):
    """RFC6587 octet-counting prefix is stripped; multiple SD elements
    flatten into one sdid.param map; nil SD gives an empty/null map."""
    lines = [
        Row(line='75 <34>1 2003-10-11T22:14:15Z host app 1 ID47 '
                 '[a@1 x="1" y="two words"][b z="3"] msg body'),
        Row(line='<34>1 2003-10-11T22:14:15Z host app 1 ID47 - bare'),
    ]
    rows = spark.createDataFrame(lines).select(*parse_syslog5424("line")).collect()
    framed = next(r for r in rows if r["message"] == "msg body")
    assert framed["hostname"] == "host"
    assert framed["structured_data"] == {
        "a@1.x": "1", "a@1.y": "two words", "b.z": "3"}
    bare = next(r for r in rows if r["message"] == "bare")
    assert not bare["structured_data"]  # nil SD -> no entries


def test_cef(spark):
    line = ("CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|10|"
            "src=10.0.0.1 dst=2.1.2.2 spt=1232")
    df = spark.createDataFrame([Row(line=line)])
    r = df.select(*parse_cef("line")).collect()[0]
    assert r["cef_version"] == 0
    assert r["device_vendor"] == "Security"
    assert r["device_product"] == "threatmanager"
    assert r["signature_id"] == "100"
    assert r["name"] == "worm successfully stopped"
    assert r["severity"] == "10"
    assert r["extension"] == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


def test_leef(spark):
    line = "LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|src=192.0.2.0\tdst=172.50.123.1"
    df = spark.createDataFrame([Row(line=line)])
    r = df.select(*parse_leef("line")).collect()[0]
    assert r["leef_version"] == "1.0"
    assert r["vendor"] == "Microsoft"
    assert r["product_name"] == "MSExchange"
    assert r["product_version"] == "4.0 SP1"
    assert r["event_id"] == "15345"
    assert r["attributes"] == {"src": "192.0.2.0", "dst": "172.50.123.1"}


def test_bloom_filter_deterministic(spark):
    from tenzir_spark.operators.enrich import BloomFilter

    bf1 = BloomFilter(expected=1000)
    bf1.add_many([f"k{i}" for i in range(500)])
    bf2 = BloomFilter(expected=1000)
    bf2.add_many([f"k{i}" for i in range(500)])
    assert (bf1.bits == bf2.bits).all()
    hits = bf1.might_contain_many([f"k{i}" for i in range(500)])
    assert hits.all()  # no false negatives, ever
    misses = bf1.might_contain_many([f"absent{i}" for i in range(1000)])
    assert misses.mean() < 0.05  # fpp ~1%


def test_bloom_context_max_keys_guard(spark):
    """An over-limit context raises instead of OOMing the driver — the
    LIMIT bounds the collect itself (at most max_keys+1 rows move); a
    within-limit build is unchanged."""
    import pytest

    from tenzir_spark.operators.enrich import bloom_filter_context

    df = spark.range(1000).selectExpr("concat('k', id) AS k")
    with pytest.raises(ValueError, match="max_keys"):
        bloom_filter_context(df, "k", max_keys=100)
    bf = bloom_filter_context(df, "k", max_keys=1000)
    assert bf.might_contain_many(["k1", "k999"]).all()


def test_pseudonymize_prefix_preserving(spark):
    """Crypto-PAn property: shared k-bit prefixes are preserved exactly."""
    from pyspark.sql import Row
    from tenzir_spark.operators.transform import pseudonymize_ip

    ips = ["10.1.2.3", "10.1.2.77", "10.1.9.3", "10.200.2.3", "192.168.1.1", None]
    df = spark.createDataFrame([Row(ip=x) for x in ips])
    out = {r["ip"]: r["ip_pseudonymized"] for r in pseudonymize_ip(df, "ip").collect()}

    def bits(s):
        return "".join(f"{int(o):08b}" for o in s.split("."))

    def common_prefix(a, b):
        ba, bb = bits(a), bits(b)
        n = 0
        while n < 32 and ba[n] == bb[n]:
            n += 1
        return n

    for a in ips[:5]:
        for b in ips[:5]:
            if a is b:
                continue
            assert common_prefix(a, b) == common_prefix(out[a], out[b]), (a, b)
    assert out[None] is None
    # deterministic across invocations
    out2 = {r["ip"]: r["ip_pseudonymized"] for r in pseudonymize_ip(df, "ip").collect()}
    assert out == out2
    # and actually anonymized
    assert out["10.1.2.3"] != "10.1.2.3"


def test_pseudonymize_seed_changes_mapping(spark):
    """The seed must actually key the PRF (regression: hash_array ignores
    hash_key for numeric arrays, making every seed produce the same map)."""
    from pyspark.sql import Row
    from tenzir_spark.operators.transform import pseudonymize_ip

    ips = [f"10.1.{i}.{i * 3 % 256}" for i in range(32)]
    df = spark.createDataFrame([Row(ip=x) for x in ips])
    a = {r["ip"]: r["ip_pseudonymized"] for r in pseudonymize_ip(df, "ip", seed="alpha").collect()}
    b = {r["ip"]: r["ip_pseudonymized"] for r in pseudonymize_ip(df, "ip", seed="beta").collect()}
    assert any(a[ip] != b[ip] for ip in ips), "different seeds must give different mappings"


def test_grok_expansion_and_parse(spark):
    """Recursive %{NAME:field} expansion over the standard library
    (grok.cpp pattern-set parity)."""
    from pyspark.sql import Row
    from tenzir_spark.sources.grok import PATTERNS, expand, parse_grok
    import pytest as _pytest

    regex, fields = expand("%{IPORHOST:host}:%{POSINT:port}")
    assert fields == ["host", "port"]
    df = spark.createDataFrame([Row(line="web-01.example.com:8443 x")])
    out = parse_grok(df, "line", "%{IPORHOST:host}:%{POSINT:port}").head()
    assert out["host"] == "web-01.example.com" and out["port"] == "8443"

    # combined apache log exercises two levels of composite nesting
    line = ('203.0.113.9 - alice [12/Jan/2024:03:04:05 +0000] '
            '"POST /login HTTP/1.1" 302 511 "http://ref.example/" "curl/8.1"')
    df2 = spark.createDataFrame([Row(line=line)])
    got = parse_grok(df2, "line", "%{COMBINEDAPACHELOG}").head()
    assert got["clientip"] == "203.0.113.9"
    assert got["auth"] == "alice"
    assert got["verb"] == "POST" and got["request"] == "/login"
    assert got["response"] == "302" and got["bytes"] == "511"
    assert got["referrer"] == '"http://ref.example/"'
    assert got["agent"] == '"curl/8.1"'

    with _pytest.raises(KeyError):
        expand("%{NO_SUCH_PATTERN:x}")
    assert "TIMESTAMP_ISO8601" in PATTERNS and "LOGLEVEL" in PATTERNS


def test_read_gelf_nul_separated(spark, tmp_path):
    """gelf.md: JSON records separated by \\0 bytes; a lone unframed
    message also parses; missing level defaults to 1; `_` additional
    fields land in the map."""
    from tenzir_spark.sources.formats import read_gelf

    msgs = [
        '{"version":"1.1","host":"a","short_message":"m1","timestamp":7,'
        '"level":3,"_app":"web"}',
        '{"version":"1.1","host":"b","short_message":"m2","_seq":"9"}',
    ]
    p = tmp_path / "x.gelf"
    p.write_bytes("\x00".join(msgs).encode())
    rows = {r["host"]: r for r in read_gelf(spark, str(p)).collect()}
    assert rows["a"]["level"] == 3 and rows["a"]["additional"]["_app"] == "web"
    assert rows["b"]["level"] == 1 and rows["b"]["additional"]["_seq"] == "9"
    assert rows["b"]["full_message"] is None
    # unframed single message
    p2 = tmp_path / "one.gelf"
    p2.write_bytes(msgs[0].encode())
    assert read_gelf(spark, str(p2)).count() == 1


def test_read_suricata_and_zeek_json(spark, tmp_path):
    """suricata = ndjson + event_type schema selector; zeek-json = ndjson
    + _path selector + '.'-unnest into nested records."""
    from tenzir_spark.sources.formats import read_suricata, read_zeek_json

    eve = tmp_path / "eve.json"
    eve.write_text(
        '{"event_type":"alert","src_ip":"10.0.0.1","alert":{"severity":2}}\n'
        '{"event_type":"dns","src_ip":"10.0.0.2","dns":{"rrname":"x.org"}}\n')
    sur = read_suricata(spark, str(eve))
    got = {r["_schema"]: r["src_ip"] for r in sur.collect()}
    assert got == {"suricata.alert": "10.0.0.1", "suricata.dns": "10.0.0.2"}

    zlog = tmp_path / "conn.log"
    zlog.write_text(
        '{"_path":"conn","ts":1.5,"id.orig_h":"10.0.0.9","id.resp_p":443}\n')
    z = read_zeek_json(spark, str(zlog)).collect()[0]
    assert z["_schema"] == "zeek.conn"
    assert z["id"]["orig_h"] == "10.0.0.9" and z["id"]["resp_p"] == 443


def test_pipeline_gelf_and_stdout_sink(spark, tmp_path, capsys):
    """`from <f> read gelf | … | to stdout` end-to-end through the text
    front-end."""
    import json as _json

    from tenzir_spark.plans.pipeline import run_tql_source

    p = tmp_path / "x.gelf"
    p.write_bytes(
        b'{"version":"1.1","host":"a","short_message":"m","level":5}\x00'
        b'{"version":"1.1","host":"b","short_message":"n","level":2}')
    run_tql_source(
        spark, f"from {p} read gelf | where level > 3 | select host | to stdout")
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert [_json.loads(l) for l in out] == [{"host": "a"}]
