"""HTTP loader/saver (reference: http/curl connector,
libtenzir/builtins/connectors/curl.cpp + web/docs/connectors/http.md —
"performs a HTTP request and returns the bytes of the response body",
with an HTTPie-modeled item syntax ``[<method>] <url> [<item>..]`` where
``Header:value`` sets a header, ``key=value`` adds a JSON body field and
``key==value`` a query parameter).

Stdlib urllib only (public knowledge, no extra deps). The response body
of one HTTP request is driver-scale by construction — it is fetched on
the driver, spooled to a temp file, and handed to the DISTRIBUTED format
readers (the same ``read <format>`` inventory every other connector
feeds), so a 10-GB ndjson response still parses in parallel."""

from __future__ import annotations

import json
import os
import tempfile
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def parse_http_items(items: list[str]) -> tuple[dict, dict, dict]:
    """HTTPie item syntax → (headers, body_fields, query_params).
    ``==`` binds before ``=`` and ``:`` (http.md's precedence)."""
    headers: dict[str, str] = {}
    data: dict[str, str] = {}
    params: dict[str, str] = {}
    for it in items:
        if "==" in it:
            k, v = it.split("==", 1)
            params[k] = v
        elif "=" in it and (":" not in it or it.index("=") < it.index(":")):
            k, v = it.split("=", 1)
            data[k] = v
        elif ":" in it:
            k, v = it.split(":", 1)
            headers[k] = v
        else:
            raise ValueError(f"bad http item {it!r} (Header:v | k=v | k==v)")
    return headers, data, params


def http_fetch(url: str, *, method: str = "GET", items: list[str] | None = None,
               body: bytes | None = None, timeout: float = 30.0) -> bytes:
    """One request, response body as bytes. ``items`` use the HTTPie
    syntax; a non-empty ``key=value`` set (or explicit ``body``) makes
    the request carry a JSON body and flips GET→POST like HTTPie does."""
    headers, data, params = parse_http_items(items or [])
    if params:
        sep = "&" if urllib.parse.urlparse(url).query else "?"
        url = url + sep + urllib.parse.urlencode(params)
    if data and body is None:
        body = json.dumps(data).encode()
        headers.setdefault("Content-Type", "application/json")
        if method == "GET":
            method = "POST"
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


def http_load(spark: SparkSession, url: str, *, fmt: str | None = None,
              method: str = "GET", items: list[str] | None = None,
              timeout: float = 30.0) -> DataFrame:
    """``from http(s)://… [read <fmt>]``: fetch, spool, parse with the
    shared format inventory (format inferred from the URL path suffix
    when not given, defaulting to json like the reference)."""
    from tenzir_spark.plans.pipeline import _infer_format, _read_source

    blob = http_fetch(url, method=method, items=items, timeout=timeout)
    path_part = urllib.parse.urlparse(url).path or "response"
    fmt = _infer_format(path_part, fmt)
    suffix = os.path.splitext(path_part)[1] or ".bin"
    fd, tmp = tempfile.mkstemp(prefix="tenzir_spark_http_", suffix=suffix)
    with os.fdopen(fd, "wb") as fh:
        fh.write(blob)
    return _read_source(spark, tmp, fmt)


def http_save(df: DataFrame, url: str, *, method: str = "POST",
              items: list[str] | None = None, fmt: str = "json",
              timeout: float = 30.0, chunk_bytes: int = 4 << 20) -> int:
    """``to http(s)://…``: ndjson egress (the reference's default
    printer) POSTed in per-partition chunks of ≤ ``chunk_bytes`` bytes —
    the EXECUTORS serialize and send their own partitions, the driver
    never materializes the DataFrame, so `to http://` scales to outputs
    far beyond driver memory. Chunk order across partitions is
    unspecified (HTTP egress carries no ordering contract; the reference
    likewise serializes whatever the pipe delivers). Returns rows sent
    (summed from the same single pass)."""
    if fmt != "json":
        raise ValueError("http_save supports fmt='json' (ndjson body)")
    headers, _data, params = parse_http_items(items or [])
    if params:
        sep = "&" if urllib.parse.urlparse(url).query else "?"
        url = url + sep + urllib.parse.urlencode(params)
    headers.setdefault("Content-Type", "application/x-ndjson")

    def _post_partition(lines):
        import urllib.request as _rq
        buf: list[str] = []
        size = n = 0

        def _flush():
            nonlocal buf, size
            if not buf:
                return
            body = ("\n".join(buf) + "\n").encode()
            req = _rq.Request(url, data=body, method=method, headers=headers)
            with _rq.urlopen(req, timeout=timeout) as resp:
                resp.read()
            buf, size = [], 0

        for ln in lines:
            buf.append(ln)
            size += len(ln) + 1
            n += 1
            if size >= chunk_bytes:
                _flush()
        _flush()
        yield n

    # toJSON serializes JVM-side (no Python row objects); one job total
    return int(sum(df.toJSON().mapPartitions(_post_partition).collect()))


def email_save(df: DataFrame, recipient: str, *, sender: str = "tenzir-spark",
               subject: str = "pipeline output", smtp=None,
               host: str = "localhost", port: int = 25,
               username: str | None = None,
               password: str | None = None,
               chunk_bytes: int = 8 << 20) -> int:
    """``to email://<recipient>`` (reference: email saver,
    libtenzir/builtins/connectors/email.cpp + email.md — "establish a
    SMTP(S) connection and send bytes as email body"; default printer is
    json). Streams ndjson rows into one or more messages (≤
    ``chunk_bytes`` body each) via stdlib smtplib, never materializing
    the DataFrame on the driver; the connection object is injectable
    (``smtp=``) so the protocol is testable without a mail server.
    Returns rows sent."""
    import email.message
    import smtplib

    own = smtp is None
    if own:  # pragma: no cover - needs a mail server
        smtp = smtplib.SMTP(host, port, timeout=30)
        if username:
            smtp.starttls()
            smtp.login(username, password or "")

    def _send(lines: list[str]) -> None:
        msg = email.message.EmailMessage()
        msg["From"], msg["To"], msg["Subject"] = sender, recipient, subject
        msg.set_content("\n".join(lines) + "\n")
        smtp.send_message(msg)

    # SMTP is one driver-side authenticated connection by nature, but the
    # rows STREAM through toLocalIterator (one partition in driver memory
    # at a time, never the whole DataFrame); bodies above chunk_bytes are
    # split across messages with identical headers
    total = 0
    try:
        buf: list[str] = []
        size = 0
        for ln in df.toJSON().toLocalIterator():
            buf.append(ln)
            size += len(ln) + 1
            total += 1
            if size >= chunk_bytes:
                _send(buf)
                buf, size = [], 0
        if buf:
            _send(buf)
    finally:
        if own:  # pragma: no cover
            smtp.quit()
    return total
