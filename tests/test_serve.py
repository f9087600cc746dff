"""serve operator + /serve REST endpoint (operators/serve.py): paging via
continuation tokens, duplicate-id rejection, wait-for-first-event, HTTP
contract parity with web/docs/operators/serve.md + the /serve API."""

import json
import threading
import urllib.request

import pytest

from tenzir_spark.operators.serve import ServeHub


def _post(port: int, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v0/serve",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_paging_and_tokens(spark):
    hub = ServeHub()
    df = spark.range(25).selectExpr("id", "id * 2 AS v")
    assert hub.serve(df, "nums") == 25
    port = hub.start()
    try:
        seen, token = [], None
        for _ in range(10):
            st, out = _post(port, {"serve_id": "nums",
                                   "continuation_token": token,
                                   "max_events": 10})
            assert st == 200
            seen += out["events"]
            token = out["next_continuation_token"]
            if token is None:
                break
        assert sorted(r["id"] for r in seen) == list(range(25))
        assert all(r["v"] == r["id"] * 2 for r in seen)

        # duplicate id errors (serve.md: "errors when receiving a
        # duplicate serve id")
        with pytest.raises(ValueError, match="duplicate serve id"):
            hub.serve(df, "nums")

        # unknown id -> 400 with an error body
        st, out = _post(port, {"serve_id": "nope", "timeout": "0s"})
        assert st == 400 and "error" in out
    finally:
        hub.stop()


def test_serve_waits_for_first_event(spark):
    """A fetch with a timeout blocks until the pipeline delivers — the
    'wait for an initial event' pattern."""
    hub = ServeHub()
    df = spark.range(3)

    def later():
        import time

        time.sleep(0.4)
        hub.serve(df, "slow")

    t = threading.Thread(target=later)
    t.start()
    out = hub.fetch("slow", timeout_sec=5.0)
    t.join()
    assert len(out["events"]) == 3
    assert out["next_continuation_token"] is None

    # zero-timeout fetch on a never-served id reports unknown immediately
    assert "error" in hub.fetch("never", timeout_sec=0.0)


def test_serve_buffer_bound(spark):
    hub = ServeHub()
    n = hub.serve(spark.range(100), "bounded", buffer_size=10)
    assert n == 10
    out = hub.fetch("bounded", max_events=100)
    assert len(out["events"]) == 10


def test_openapi_spec(spark):
    from tenzir_spark.operators.serve import openapi

    rows = openapi(spark).collect()
    assert any(r["path"] == "/serve" and r["method"] == "POST" for r in rows)
    import json

    spec = json.loads(rows[0]["spec"])
    assert spec["openapi"].startswith("3.")


def test_api_operator_against_serve_endpoint(spark):
    """`api /serve {...}` — the REST-client operator drains a served
    result set page by page through the real HTTP endpoint."""
    from tenzir_spark.operators.serve import ServeHub, api

    hub = ServeHub()
    try:
        port = hub.start()
        base = f"http://127.0.0.1:{port}"
        hub.serve(
            spark.range(25).selectExpr("id", "id * 2 AS dbl"), "api-test")

        page1 = api(spark, base, "/serve",
                    {"serve_id": "api-test", "max_events": 10})
        assert page1.count() == 10
        tok = page1.select("_continuation_token").first()[0]
        assert tok
        page2 = api(spark, base, "/serve",
                    {"serve_id": "api-test", "max_events": 100,
                     "continuation_token": tok})
        assert page2.count() == 15
        ids = {r["id"] for r in page2.collect()}
        assert ids == set(range(10, 25))

        # non-events response: one row with status + raw document
        err = api(spark, base, "/serve", {"serve_id": "missing"})
        assert err.first()["status"] in (200, 400, 404, 410)
    finally:
        hub.stop()
