"""``velociraptor`` source — run VQL against a Velociraptor server and
emit response rows as events.

Reference: plugins/velociraptor/src/plugin.cpp — a gRPC client that
submits ``VQLCollectorArgs{query=[{name, vql}], max_row, max_wait,
org_id}`` (defaults: org "root", max_wait 1 s, plugin.cpp:36-66,
227-240) and parses the streamed ``VQLResponse`` messages: an empty
``response`` payload is a control message; a non-empty one carries a
JSON **array of row objects** which becomes events of schema
``velociraptor.response`` with ``timestamp`` (µs epoch), ``query_id``,
``query.name``/``query.vql``, ``part`` and the row under ``response``
(plugin.cpp:121-160). ``--subscribe <artifact>`` wraps the artifact in
the watch_monitoring VQL template (plugin.cpp:110-118).

Transport discipline mirrors the queue connectors (sources/queues.py):
the gRPC stub is **injectable** — anything with a ``Query(args)`` method
yielding objects with ``response``/``query_id``/``query``/``part``/
``timestamp`` attributes (duck-typed on the public proto field names).
The real channel needs the ``grpc`` + generated-proto packages, which
this sandbox does not ship, so ``connect()`` is import-gated and raises
with instructions; every protocol test runs against an injected fake.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ORG_ID = "root"  # plugin.cpp:36
DEFAULT_MAX_WAIT_SEC = 1  # plugin.cpp:42

#: plugin.cpp:101-118 — wrap an artifact name into a monitoring
#: subscription query
SUBSCRIBE_VQL_TEMPLATE = (
    "SELECT * FROM watch_monitoring(artifact={artifact!r})"
)


@dataclass
class VQLRequest:
    name: str
    vql: str


@dataclass
class VelociraptorArgs:
    """The collector-args shape (plugin.cpp:58-66)."""

    requests: list[VQLRequest] = field(default_factory=list)
    max_rows: int = 1_000_000
    max_wait_sec: int = DEFAULT_MAX_WAIT_SEC
    org_id: str = DEFAULT_ORG_ID


def subscribe_args(artifact: str, **kw) -> VelociraptorArgs:
    """``velociraptor --subscribe <artifact>``."""
    return VelociraptorArgs(
        requests=[VQLRequest(
            name=f"subscribe[{artifact}]",
            vql=SUBSCRIBE_VQL_TEMPLATE.format(artifact=artifact))],
        **kw)


def connect(api_connection_string: str):
    """Build a real gRPC stub from a Velociraptor API config (the
    reference overrides the TLS target name to "VelociraptorServer"
    because the server uses self-signed certs, plugin.cpp:220-227).
    Requires the ``grpc`` package + Velociraptor's generated protos —
    not shipped in this sandbox; the injectable-stub path below is the
    tested surface."""
    try:
        import grpc  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real Velociraptor transport needs the grpc package and the "
            "server's api.config.yaml; pass an injected stub instead "
            "(any object with Query(args) -> iterable of VQLResponse-"
            "shaped messages)") from e
    raise NotImplementedError(
        "generated Velociraptor protos are not bundled; construct the "
        "stub with pyvelociraptor and pass it to velociraptor_query()")


_SCHEMA = (
    "timestamp timestamp, query_id long, query_name string, "
    "query_vql string, part long, response string"
)


def velociraptor_query(spark: SparkSession, stub,
                       args: VelociraptorArgs) -> DataFrame:
    """Submit ``args`` on ``stub`` and collect the streamed responses
    into a DataFrame of schema ``velociraptor.response``: one row per
    response-row object, the row payload as a JSON string column
    ``response`` (parse downstream with ``parse <field> json`` /
    ``from_json`` once a schema is known — the reference builds it
    dynamically with its series_builder; a DataFrame needs the shape up
    front). Control messages (empty payload) are skipped; ``max_rows``
    bounds collection exactly like ``set_max_row``."""
    import datetime

    rows = []
    for resp in stub.Query(args):
        payload = getattr(resp, "response", "") or ""
        if not payload:  # control message (plugin.cpp:127-129)
            continue
        objects = json.loads(payload)
        if not isinstance(objects, list):
            raise ValueError("expected JSON array in Velociraptor response")
        ts = datetime.datetime.fromtimestamp(
            getattr(resp, "timestamp", 0) / 1e6, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        q = getattr(resp, "query", None)
        for obj in objects:
            if not isinstance(obj, dict):
                raise ValueError("expected objects in Velociraptor response")
            rows.append((
                ts,
                int(getattr(resp, "query_id", 0)),
                getattr(q, "name", "") if q is not None else "",
                getattr(q, "vql", "") if q is not None else "",
                int(getattr(resp, "part", 0)),
                json.dumps(obj, sort_keys=True),
            ))
            if len(rows) >= args.max_rows:
                return spark.createDataFrame(rows, _SCHEMA)
    return spark.createDataFrame(rows, _SCHEMA)
