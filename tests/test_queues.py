"""Queue connectors (SQS / AMQP / zmq+bitz): reorder-buffer contiguity,
delete/ack-after-commit discipline, crash redelivery — all against
deterministic fake brokers (the protocol logic is client-injectable)."""

import json

import pytest

from tenzir_spark.cdc.runner import IngestRunner
from tenzir_spark.sources.connector import run_connector
from tenzir_spark.sources.queues import (
    AmqpConnector,
    ReorderBuffer,
    SqsConnector,
)
from tests.test_connector import _engine_map, _mk_records, _oracle_state


def _shuffled(records):
    """Deterministic non-trivial delivery order (coprime stride)."""
    n = len(records)
    return [records[(i * 7919) % n] for i in range(n)]


# --------------------------------------------------------------- fakes
class FakeSqsClient:
    """Visibility-epoch model: each epoch serves every undeleted message
    once (10 per receive, like the API cap), then an empty response ends
    the epoch; the next receive starts a new epoch — i.e. everything
    undeleted becomes visible again, SQS's at-least-once redelivery."""

    def __init__(self, bodies):
        self.store = {i: b for i, b in enumerate(bodies)}
        self.deleted = set()
        self._epoch: list[int] | None = None
        self._served = 0
        self.delete_calls = 0

    def receive_message(self, QueueUrl, MaxNumberOfMessages=10,
                        WaitTimeSeconds=0, MessageAttributeNames=None):
        if self._epoch is None:
            self._epoch = [i for i in self.store if i not in self.deleted]
            self._served = 0
        chunk = self._epoch[self._served:self._served + MaxNumberOfMessages]
        chunk = [i for i in chunk if i not in self.deleted]
        self._served += MaxNumberOfMessages
        if not chunk and self._served >= len(self._epoch):
            self._epoch = None  # epoch exhausted -> empty response
            return {}
        return {"Messages": [
            {"Body": self.store[i], "ReceiptHandle": f"rh-{i}-{self._served}"}
            for i in chunk
        ]}

    def delete_message(self, QueueUrl, ReceiptHandle):
        self.deleted.add(int(ReceiptHandle.split("-")[1]))
        self.delete_calls += 1


class FakeAmqpBroker:
    def __init__(self, bodies):
        self.msgs = [{"tag": i + 1, "body": b, "acked": False,
                      "delivered": False} for i, b in enumerate(bodies)]

    def crash(self):
        """Consumer died with unacked deliveries: requeue them."""
        for m in self.msgs:
            if not m["acked"]:
                m["delivered"] = False

    def channel(self):
        return FakeAmqpChannel(self)


class FakeAmqpChannel:
    class _Method:
        def __init__(self, tag):
            self.delivery_tag = tag

    def __init__(self, broker):
        self.broker = broker

    def basic_get(self, queue, auto_ack=False):
        for m in self.broker.msgs:
            if not m["acked"] and not m["delivered"]:
                m["delivered"] = True
                return self._Method(m["tag"]), None, m["body"]
        return None, None, None

    def basic_ack(self, tag):
        self.broker.msgs[tag - 1]["acked"] = True


class FakeZmqSocket:
    def __init__(self):
        self.frames = []

    def send(self, blob):
        self.frames.append(bytes(blob))

    def recv(self):
        if not self.frames:
            raise IndexError("empty")
        return self.frames.pop(0)


def _bodies(records):
    return [json.dumps(r) for r in _shuffled(records)]


# --------------------------------------------------------------- tests
def test_reorder_buffer_contiguity():
    rb = ReorderBuffer()
    rb.seek({0: 4, 1: 2})  # released prefix was [0..4] -> next global 5
    assert not rb.insert(0, 3, {"x": 3})  # <= wm[0] -> durable dupe
    assert rb.insert(0, 7, {"x": 7})
    assert rb.drain() == []  # gap at 5-6 holds 7 back
    assert rb.insert(1, 5, {"x": 5})
    assert rb.insert(0, 6, {"x": 6})
    got = rb.drain()
    assert [(p, l) for p, l, _ in got] == [(1, 5), (0, 6), (0, 7)]
    assert rb.held_count() == 0
    # ack advances the durability map: a redelivery of lsn 7 is now a
    # deletable dupe instead of an instant re-release
    assert rb.insert(0, 7, {"x": 7})  # released but not yet acked
    assert [(p, l) for p, l, _ in rb.drain()] == [(0, 7)]  # re-released
    rb.ack_update({0: 7, 1: 5})
    assert not rb.insert(0, 7, {"x": 7})  # now durable -> deletable dupe


def test_sqs_out_of_order_delivery_converges(spark, tmp_path):
    """Scrambled delivery + small polls: the reorder buffer releases only
    gapless runs, messages are deleted only after the snapshot commit,
    and the final state matches the in-order oracle."""
    records = _mk_records(n=600, parts=3, docs=80)
    client = FakeSqsClient(_bodies(records))
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8)
    conn = SqsConnector(spark, "q://test", client=client, batch_size=150)
    out = run_connector(r, conn)
    assert out["batches"] >= 2
    assert _engine_map(r) == _oracle_state(records)
    # every message at or below the final watermark got deleted
    assert len(client.deleted) == len(records)
    assert conn.buffer.held_count() == 0


def test_sqs_crash_before_ack_redelivers(spark, tmp_path):
    records = _mk_records(n=400, parts=3, docs=60)
    client = FakeSqsClient(_bodies(records))
    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    conn = SqsConnector(spark, "q://test", client=client, batch_size=120)
    run_connector(r, conn, max_batches=1)
    assert 0 < len(client.deleted) < len(records)

    # crash: fresh runner + fresh connector on the SAME queue state; the
    # undeleted messages become visible again (new epoch) and replay
    r2 = IngestRunner(spark, wh, n_buckets=8)
    conn2 = SqsConnector(spark, "q://test", client=client, batch_size=10**6)
    run_connector(r2, conn2)
    assert _engine_map(r2) == _oracle_state(records)
    assert len(client.deleted) == len(records)


def test_sqs_dupe_below_frontier_deleted_immediately(spark, tmp_path):
    records = _mk_records(n=100, parts=2, docs=20)
    client = FakeSqsClient(_bodies(records))
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4)
    conn = SqsConnector(spark, "q://test", client=client, batch_size=10**6)
    run_connector(r, conn)
    assert len(client.deleted) == len(records)
    # redeliver everything (simulate a stale copy arriving very late):
    client.deleted.clear()
    client._epoch = None
    before = client.delete_calls
    assert conn.poll() is None  # all below frontier -> no batch
    assert client.delete_calls - before == len(records)  # insta-deleted


def test_amqp_crash_redelivery_converges(spark, tmp_path):
    records = _mk_records(n=500, parts=3, docs=70)
    broker = FakeAmqpBroker(_bodies(records))
    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    conn = AmqpConnector(spark, "q", channel=broker.channel(),
                         batch_size=130)
    run_connector(r, conn, max_batches=2)
    acked_mid = sum(m["acked"] for m in broker.msgs)
    assert 0 < acked_mid < len(records)

    broker.crash()
    r2 = IngestRunner(spark, wh, n_buckets=8)
    conn2 = AmqpConnector(spark, "q", channel=broker.channel(),
                          batch_size=10**6)
    run_connector(r2, conn2)
    assert _engine_map(r2) == _oracle_state(records)
    assert all(m["acked"] for m in broker.msgs)


def test_zmq_bitz_roundtrip(spark):
    from pyspark.sql import Row

    from tenzir_spark.sources.queues import zmq_load, zmq_save

    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", n=i) for i in range(300)]).repartition(3)
    sock = FakeZmqSocket()
    sent = zmq_save(df, "inproc://x", socket=sock)
    assert sent == len(sock.frames) >= 1

    back = zmq_load(spark, "inproc://x", socket=sock)
    assert sorted((r["doc_id"], r["n"]) for r in back.collect()) == \
        sorted((r["doc_id"], r["n"]) for r in df.collect())

    with pytest.raises(ValueError, match="no bitz frames"):
        zmq_load(spark, "inproc://x", socket=FakeZmqSocket())


def test_reorder_buffer_lagging_partition_watermarks():
    """A watermark map that is NOT a gapless global prefix (partition 1
    lags): events above their own partition's watermark must never be
    classified durable, even when below the global frontier — they
    release immediately instead of being deleted (data loss) or held
    forever (stall)."""
    rb = ReorderBuffer()
    rb.seek({0: 100, 1: 50})  # global frontier 101, partition 1 lagging
    assert not rb.insert(1, 40, {})   # <= wm[1] -> durable dupe
    assert not rb.insert(0, 100, {})  # <= wm[0] -> durable dupe
    assert rb.insert(1, 75, {"v": 75})   # lagging-partition event
    got = rb.drain()
    assert [(p, l) for p, l, _ in got] == [(1, 75)]
    # the global frontier is unaffected by instant releases
    assert rb.insert(0, 101, {"v": 101})
    assert [(p, l) for p, l, _ in rb.drain()] == [(0, 101)]
    assert rb.held_count() == 0
