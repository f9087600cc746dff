"""HTTP connector: loader/saver against a local stdlib server, HTTPie
item syntax, pipeline-text integration."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

FIXTURE = [
    {"event_id": 1, "event_type": "click", "value": 2.5},
    {"event_id": 2, "event_type": "view", "value": 0.5},
    {"event_id": 3, "event_type": "click", "value": 1.0},
]


class _Handler(BaseHTTPRequestHandler):
    received = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = ("\n".join(json.dumps(r) for r in FIXTURE)).encode()
        if self.path.startswith("/echoq"):
            body = json.dumps({"path": self.path,
                               "tok": self.headers.get("X-Token", "")}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _Handler.received.append(
            (self.path, self.headers.get("Content-Type"), self.rfile.read(n)))
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"ok")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_items_syntax():
    from tenzir_spark.sources.http import parse_http_items

    h, d, p = parse_http_items(["X-API-Token:123", "foo=bar", "q==search"])
    assert h == {"X-API-Token": "123"}
    assert d == {"foo": "bar"}
    assert p == {"q": "search"}
    with pytest.raises(ValueError, match="bad http item"):
        parse_http_items(["plainword"])


def test_http_fetch_headers_and_params(server):
    from tenzir_spark.sources.http import http_fetch

    out = json.loads(http_fetch(f"{server}/echoq",
                                items=["X-Token:abc", "q==1"]))
    assert out == {"path": "/echoq?q=1", "tok": "abc"}


def test_http_load_pipeline_text(spark, server):
    from tenzir_spark.plans.pipeline import run_tql_source

    df = run_tql_source(
        spark,
        f'from {server}/events.json | where event_type == "click" '
        "| select event_id, value")
    rows = sorted((r["event_id"], r["value"]) for r in df.collect())
    assert rows == [(1, 2.5), (3, 1.0)]


def test_http_save_posts_ndjson(spark, server):
    from tenzir_spark.plans.pipeline import run_tql_source

    _Handler.received.clear()
    run_tql_source(
        spark,
        f"from {server}/events.json | select event_id | to {server}/sink")
    # per-partition egress: one or more POSTs whose union is the dataset
    assert len(_Handler.received) >= 1
    got = []
    for path, ctype, body in _Handler.received:
        assert path == "/sink" and ctype == "application/x-ndjson"
        got += [json.loads(ln)["event_id"]
                for ln in body.decode().strip().split("\n")]
    assert sorted(got) == [1, 2, 3]


def test_http_save_multi_chunk_no_driver_collect(spark, server):
    """Scale contract: executors POST their own partitions in bodies
    capped at chunk_bytes — multiple chunks arrive, and the saver never
    calls df.collect() (the driver-memory ceiling the reference-scale
    pipelines must not have)."""
    import inspect

    from tenzir_spark.sources import http as http_mod
    from tenzir_spark.sources.http import http_save

    src = inspect.getsource(http_mod.http_save) + inspect.getsource(
        http_mod.email_save)
    assert ".collect()" not in src.replace(
        ".mapPartitions(_post_partition).collect()", "")

    _Handler.received.clear()
    df = spark.range(500).selectExpr("id AS event_id",
                                     "repeat('x', 64) AS pad").coalesce(2)
    n = http_save(df, f"{server}/sink", chunk_bytes=4096)
    assert n == 500
    assert len(_Handler.received) > 2  # multi-chunk delivery
    got = []
    for _path, _ctype, body in _Handler.received:
        assert len(body) <= 4096 + 200  # cap honored (+1 row of slack)
        got += [json.loads(ln)["event_id"]
                for ln in body.decode().strip().split("\n")]
    assert sorted(got) == list(range(500))


def test_http_fetch_json_body_flips_post(server):
    from tenzir_spark.sources.http import http_fetch

    _Handler.received.clear()
    http_fetch(f"{server}/sink", items=["foo=bar"])
    path, ctype, body = _Handler.received[0]
    assert ctype == "application/json"
    assert json.loads(body) == {"foo": "bar"}


def test_email_save_fake_smtp(spark):
    from tenzir_spark.sources.http import email_save

    sent = []

    class FakeSmtp:
        def send_message(self, msg):
            sent.append(msg)

    df = spark.createDataFrame([(1, "a"), (2, "b")], "event_id int, s string")
    n = email_save(df, "ops@example.com", subject="alerts", smtp=FakeSmtp())
    assert n == 2 and len(sent) == 1
    msg = sent[0]
    assert msg["To"] == "ops@example.com" and msg["Subject"] == "alerts"
    lines = msg.get_content().strip().split("\n")
    assert sorted(json.loads(ln)["event_id"] for ln in lines) == [1, 2]

    # bodies above chunk_bytes split across messages; rows stream through
    # toLocalIterator (never a whole-DataFrame collect on the driver)
    sent.clear()
    big = spark.range(200).selectExpr("id AS event_id",
                                      "repeat('y', 32) AS pad")
    n = email_save(big, "ops@example.com", smtp=FakeSmtp(),
                   chunk_bytes=2048)
    assert n == 200 and len(sent) > 2
    got = []
    for m in sent:
        got += [json.loads(ln)["event_id"]
                for ln in m.get_content().strip().split("\n")]
    assert sorted(got) == list(range(200))


def test_stdin_source_pipeline(spark, monkeypatch):
    import io

    from tenzir_spark.plans.pipeline import run_tql_source

    ndjson = "\n".join(json.dumps(r) for r in FIXTURE)
    monkeypatch.setattr("sys.stdin", io.StringIO(ndjson))
    df = run_tql_source(spark, 'from - | where event_type == "view"')
    assert [r["event_id"] for r in df.collect()] == [2]


def test_chart_version_shell_stages(spark):
    from tenzir_spark.operators.meta import get_attributes
    from tenzir_spark.plans.pipeline import run_tql

    df = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(10)], "t int, v double")
    out = run_tql(df, "chart line --x t --y v")
    assert get_attributes(out, "t")["chart"] == "x"
    assert get_attributes(out, "v")["chart_type"] == "line"

    ver = run_tql(df, "version").first()
    assert ver["version"]

    echoed = run_tql(spark.createDataFrame([("x",), ("y",)], "line string"),
                     "shell cat")
    assert sorted(r["line"] for r in echoed.collect()) == ["x", "y"]


def test_dash_connector_roundtrip(spark, monkeypatch, capsys):
    """The reference's `dash` connector (builtins/connectors/dash.cpp):
    `-` aliases the stdin loader and the stdout saver — full round trip
    `from - | … | to -` through the text front-end."""
    import io

    from tenzir_spark.plans.pipeline import run_tql_source

    ndjson = "\n".join(json.dumps(r) for r in FIXTURE)
    monkeypatch.setattr("sys.stdin", io.StringIO(ndjson))
    run_tql_source(spark, 'from - | where event_type == "view" | select event_id | to -')
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert [json.loads(ln) for ln in out] == [{"event_id": 2}]
