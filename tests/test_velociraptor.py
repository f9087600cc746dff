"""Velociraptor source protocol tests (injected stub)."""

import json
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from tenzir_spark.sources.velociraptor import (
    VelociraptorArgs,
    VQLRequest,
    connect,
    subscribe_args,
    velociraptor_query,
)


class FakeStub:
    """Duck-typed gRPC stub: records the submitted args, streams a mix of
    control and data messages across multiple parts."""

    def __init__(self, batches):
        self.batches = batches
        self.seen_args = None

    def Query(self, args):
        self.seen_args = args
        yield SimpleNamespace(response="", timestamp=0, query_id=0,
                              query=None, part=0)  # control message
        for part, rows in enumerate(self.batches):
            yield SimpleNamespace(
                response=json.dumps(rows),
                timestamp=1_700_000_000_000_000 + part,
                query_id=7,
                query=SimpleNamespace(name="q0", vql="SELECT * FROM info()"),
                part=part,
            )


def test_velociraptor_query_rows_and_parts(spark):
    stub = FakeStub([
        [{"pid": 1, "name": "init"}, {"pid": 2, "name": "kthreadd"}],
        [{"pid": 99, "name": "spark"}],
    ])
    args = VelociraptorArgs(
        requests=[VQLRequest("q0", "SELECT * FROM info()")])
    df = velociraptor_query(spark, stub, args)
    assert df.count() == 3
    assert stub.seen_args is args and args.org_id == "root"
    assert {r["part"] for r in df.collect()} == {0, 1}
    # row payload is parseable JSON; downstream `parse response json`
    parsed = df.select(
        F.get_json_object("response", "$.pid").cast("long").alias("pid"))
    assert {r["pid"] for r in parsed.collect()} == {1, 2, 99}


def test_velociraptor_max_rows_bound(spark):
    stub = FakeStub([[{"i": i} for i in range(10)]])
    df = velociraptor_query(
        spark, stub,
        VelociraptorArgs(requests=[VQLRequest("q", "x")], max_rows=4))
    assert df.count() == 4


def test_velociraptor_subscribe_and_errors(spark):
    a = subscribe_args("Windows.Events.ProcessCreation")
    assert "watch_monitoring" in a.requests[0].vql
    assert "Windows.Events.ProcessCreation" in a.requests[0].vql

    bad = FakeStub([])
    bad.batches = None

    class NotArray:
        def Query(self, args):
            yield SimpleNamespace(response='{"not": "array"}', timestamp=0,
                                  query_id=0, query=None, part=0)

    with pytest.raises(ValueError, match="JSON array"):
        velociraptor_query(spark, NotArray(),
                           VelociraptorArgs(requests=[VQLRequest("q", "x")]))
    with pytest.raises(NotImplementedError):
        connect("localhost:8001")
