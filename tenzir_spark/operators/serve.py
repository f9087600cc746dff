"""``serve <id>`` — make pipeline results retrievable over the ``/serve``
REST endpoint (reference: libtenzir/builtins/operators/serve.cpp +
web/docs/operators/serve.md and the /api#/paths/~1serve/post contract:
POST {serve_id, continuation_token, max_events, timeout} → {events,
next_continuation_token}).

Stdlib-only (ThreadingHTTPServer) — no web framework dependency. The
operator buffers up to ``buffer_size`` driver-side rows per serve id
(the reference buffers 64Ki by default and throttles the pipeline; here
the DataFrame is drained up to the buffer bound with ``limit``), serves
them in ``max_events`` pages keyed by monotonically increasing
continuation tokens, and a duplicate serve id errors exactly like the
reference. Waiting semantics (``timeout``/``min_events``): the handler
blocks until the id is registered or the timeout lapses — the
"wait for an initial event" pattern in serve.md's second example.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame


class ServeHub:
    """In-process registry of served result sets + the HTTP front door."""

    def __init__(self):
        self._lock = threading.Lock()
        self._buffers: dict[str, list[dict]] = {}
        self._done: dict[str, bool] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ operator
    def serve(self, df: DataFrame, serve_id: str,
              buffer_size: int = 64 * 1024) -> int:
        """The ``serve <id>`` sink: drain up to ``buffer_size`` events of
        ``df`` into the buffer for ``serve_id``. Returns the event count."""
        with self._lock:
            if serve_id in self._buffers:
                raise ValueError(f"duplicate serve id {serve_id!r}")
            self._buffers[serve_id] = []  # claim the id before the job runs
        try:
            rows = [r.asDict(recursive=True)
                    for r in df.limit(buffer_size).collect()]
        except Exception:
            # release the claim: a failed collect must not poison the id
            # (retry would hit "duplicate serve id" forever) or leave
            # fetchers blocking on a buffer that will never fill
            with self._lock:
                self._buffers.pop(serve_id, None)
                self._done.pop(serve_id, None)
            raise
        with self._lock:
            self._buffers[serve_id] = rows
            self._done[serve_id] = True
        return len(rows)

    # ------------------------------------------------------------ retrieval
    def fetch(self, serve_id: str, continuation_token: str | None = None,
              max_events: int = 1024, timeout_sec: float = 0.0) -> dict:
        """The /serve contract, callable in-process too. Blocks up to
        ``timeout_sec`` waiting for the id's first events."""
        deadline = time.monotonic() + max(timeout_sec, 0.0)
        while True:
            with self._lock:
                ready = self._done.get(serve_id, False)
            if ready or time.monotonic() >= deadline:
                break
            time.sleep(0.02)
        with self._lock:
            if serve_id not in self._buffers or not self._done.get(serve_id):
                return {"error": f"unknown serve id {serve_id!r}"}
            rows = self._buffers[serve_id]
        start = int(continuation_token) if continuation_token else 0
        if start < 0 or start > len(rows):
            return {"error": f"invalid continuation token {continuation_token!r}"}
        page = rows[start:start + max_events]
        nxt = start + len(page)
        return {
            "events": page,
            "next_continuation_token": str(nxt) if nxt < len(rows) else None,
        }

    # ------------------------------------------------------------ HTTP
    def start(self, port: int = 0, host: str = "127.0.0.1") -> int:
        """Start the REST endpoint; returns the bound port (0 = ephemeral)."""
        hub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_POST(self):
                if self.path.rstrip("/") not in ("/serve", "/api/v0/serve"):
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    out = hub.fetch(
                        req.get("serve_id", ""),
                        req.get("continuation_token"),
                        int(req.get("max_events", 1024)),
                        _parse_timeout(req.get("timeout", "0s")),
                    )
                except Exception as e:  # noqa: BLE001 - reported to client
                    out = {"error": str(e)}
                body = json.dumps(out, default=str).encode()
                self.send_response(400 if "error" in out else 200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def _parse_timeout(t) -> float:
    if isinstance(t, (int, float)):
        return float(t)
    s = str(t).strip().lower()
    for suffix, mult in (("ms", 0.001), ("s", 1.0), ("m", 60.0)):
        if s.endswith(suffix):
            try:
                return float(s[: -len(suffix)]) * mult
            except ValueError:
                break
    try:
        return float(s)
    except ValueError:
        return 0.0


OPENAPI_SPEC = {
    "openapi": "3.0.0",
    "info": {"title": "tenzir_spark", "version": "0.1"},
    "paths": {
        "/serve": {
            "post": {
                "summary": "Retrieve served pipeline results",
                "requestBody": {"content": {"application/json": {"schema": {
                    "type": "object",
                    "properties": {
                        "serve_id": {"type": "string"},
                        "continuation_token": {"type": ["string", "null"]},
                        "max_events": {"type": "integer", "default": 1024},
                        "timeout": {"type": "string", "default": "0s"},
                    },
                    "required": ["serve_id"],
                }}}},
                "responses": {"200": {"description": "a page of events",
                    "content": {"application/json": {"schema": {
                        "type": "object",
                        "properties": {
                            "events": {"type": "array"},
                            "next_continuation_token":
                                {"type": ["string", "null"]},
                        }}}}},
                    "400": {"description": "unknown id / bad token"}},
            }
        }
    },
}


def openapi(spark) -> "DataFrame":
    """``openapi`` / ``api`` aspect (openapi.md: emit the node's REST API
    spec as one event): one row per (path, method, summary) plus the full
    spec JSON — queryable like any other source."""
    import json as _json

    rows = []
    for path, methods in OPENAPI_SPEC["paths"].items():
        for method, spec in methods.items():
            rows.append((path, method.upper(), spec.get("summary", ""),
                         _json.dumps(OPENAPI_SPEC, sort_keys=True)))
    return spark.createDataFrame(
        rows, "path string, method string, summary string, spec string")


def api(spark, base_url: str, endpoint: str, body: dict | None = None,
        timeout_sec: float = 30.0) -> "DataFrame":
    """The ``api`` operator (reference: builtins/operators/api.cpp — "use
    the node's REST API directly from a pipeline": ``api <endpoint>
    [<request-body>]``, POSTs the JSON body and emits the response).

    Against OUR node surface that endpoint inventory is the ``/serve``
    family (ServeHub.start); any compatible host:port works. A response
    carrying an ``events`` list becomes one row per event (the shape the
    /serve contract returns); any other JSON object becomes a single row
    with the raw document in ``response`` plus a ``status`` column —
    api.cpp's emit-one-event behavior."""
    import json as _json
    import urllib.request

    req = urllib.request.Request(
        base_url.rstrip("/") + endpoint,
        data=_json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
            status = resp.status
            doc = _json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        status = e.code
        doc = {"error": e.read().decode("utf-8", "replace")}

    if isinstance(doc, dict) and isinstance(doc.get("events"), list) \
            and doc["events"]:
        import pandas as pd

        pdf = pd.DataFrame(doc["events"])
        ntok = doc.get("next_continuation_token")
        pdf["_continuation_token"] = "" if ntok is None else str(ntok)
        return spark.createDataFrame(pdf)
    return spark.createDataFrame(
        [(int(status), _json.dumps(doc, sort_keys=True))],
        "status int, response string")
