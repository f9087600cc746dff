"""Message-queue connectors: SQS, AMQP, ZeroMQ (reference: plugins/sqs,
plugins/amqp, plugins/zmq — byte loaders/savers over queue transports;
web/docs/formats/bitz.md's own example pairs ``zmq`` with ``bitz``).

Queues differ from Kafka in the one property the CDC watermark discipline
leans on: there is NO broker-assigned, per-partition, monotone offset.
Delivery is at-least-once and may be REORDERED across polls (SQS standard
queues; AMQP redelivery after an unacked consumer dies). A late low-LSN
message arriving after its partition's watermark advanced would be
dropped as a dupe — silent data loss.

So these connectors enforce the ordering themselves with a REORDER
BUFFER over the log's dense global LSN sequence: the producer stamps
``(part_id, lsn)`` into the message (the same envelope contract the file
log and simulated broker use — a WAL sequence sharded across
partitions), and ``poll()`` only releases the maximal CONTIGUOUS global
prefix. Messages past a gap stay buffered (and un-acked, so the broker
redelivers them on crash) until the gap fills. ``end_offsets``/``ack``
therefore always describe per-partition watermarks derived from a
gapless prefix — exactly the replayable-source contract
(sources/connector.py:49-61) the snapshot watermarks assume.

Broker clients are injectable (``client=`` / ``channel=`` / ``socket=``)
so the full protocol logic is unit-tested against deterministic fakes;
the default constructors use boto3 / pika / pyzmq where installed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tenzir_spark.sources.connector import ChangeConnector, SourceBatch

_DEFAULT_PAYLOAD = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
]


class ReorderBuffer:
    """Global-LSN contiguity gate. The change log is ONE dense sequence
    (a WAL: lsn 0,1,2,…) sharded across source partitions — the shape
    the file log and simulated broker stamp, and what database CDC
    emits. ``drain`` releases the maximal contiguous GLOBAL prefix; the
    per-partition watermarks derived from a released prefix are then
    individually gapless in the only sense that matters (no event for
    partition p with lsn ≤ wm[p] is still in flight).

    ``seek`` reconstructs the global frontier from the per-partition
    watermark map: because only complete prefixes are ever released (and
    thus acked), every lsn ≤ max(wm) is durable — the next expected
    global lsn is max(wm)+1. ``insert`` returns False for events below
    the frontier (already durable — safe to ack/delete immediately).

    For a log numbered densely PER PARTITION instead (the Kafka-offset
    model), use the KafkaConnector — broker offsets already provide
    in-order delivery there."""

    def __init__(self) -> None:
        self._next = 0
        self._wm: dict[int, int] = {}
        self._held: dict[int, tuple[int, dict]] = {}
        self._instant: list[tuple[int, int, dict]] = []

    def seek(self, offsets: dict[int, int]) -> None:
        self._wm = {int(p): int(o) for p, o in offsets.items()}
        self._next = max(self._wm.values(), default=-1) + 1
        self._held.clear()
        self._instant.clear()

    def ack_update(self, offsets: dict[int, int]) -> None:
        """Advance the durability map with sink-committed watermarks —
        the connector calls this from ``ack`` so later redeliveries of
        now-durable events classify as deletable dupes."""
        for p, o in offsets.items():
            p, o = int(p), int(o)
            if o > self._wm.get(p, -1):
                self._wm[p] = o

    def insert(self, part: int, lsn: int, rec: dict) -> bool:
        """False ⇒ provably durable (lsn ≤ its OWN partition's SINK-ACKED
        watermark) — the only case where deleting the message is safe. An
        event below the global frontier but above its partition's
        watermark (a redelivery of a released-but-unacked event, or a
        watermark map that isn't a gapless prefix because the table was
        previously fed by a different source) is released immediately
        instead of misclassified as a dupe: the sink's per-partition
        watermark filter still orders/dedupes it idempotently."""
        part, lsn = int(part), int(lsn)
        if lsn <= self._wm.get(part, -1):
            return False
        if lsn < self._next:
            self._instant.append((part, lsn, rec))
            return True
        self._held[lsn] = (part, rec)
        return True

    def drain(self) -> list[tuple[int, int, dict]]:
        out, self._instant = self._instant, []
        while self._next in self._held:
            part, rec = self._held.pop(self._next)
            out.append((part, self._next, rec))
            self._next += 1
        return out

    def held_count(self) -> int:
        return len(self._held) + len(self._instant)


def _envelope_df(spark: SparkSession, rows: list[tuple[int, int, str]],
                 payload_fields: list[tuple[str, str]]) -> DataFrame:
    """(lsn, part_id, json-value) rows → the engine envelope, the same
    shape the Kafka connector emits (connector.py:297-315)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    raw_schema = T.StructType([
        T.StructField("lsn", T.LongType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("value", T.StringType(), True),
    ])
    json_schema = ", ".join(
        ["op string"] + [f"{n} {t}" for n, t in payload_fields])
    return (
        spark.createDataFrame(rows, raw_schema)
        .withColumn("_p", F.from_json(F.col("value"), json_schema))
        .select(
            "lsn",
            F.lit(0).alias("epoch"),
            "part_id",
            F.coalesce(F.col("_p.op"), F.lit("insert")).alias("op"),
            *[F.col(f"_p.{n}").alias(n) for n, _t in payload_fields],
        )
    )


class SqsConnector(ChangeConnector):
    """SQS implementation of the connector protocol (reference:
    plugins/sqs — receive/delete over a queue URL; visibility timeout is
    the redelivery mechanism).

    Offset discipline: messages are DELETED only in ``ack`` and only up
    to the sink-committed watermark; anything younger stays in the queue
    and reappears after its visibility timeout on a crash — the queue
    itself is the replay log, so ``seek`` just positions the reorder
    frontier. With a FIFO queue delivering the log in sequence the
    buffer is pass-through; with a standard queue it absorbs the
    reordering."""

    def __init__(self, spark: SparkSession, queue_url: str, *,
                 client=None, batch_size: int = 10_000,
                 wait_seconds: int = 0,
                 payload_fields: list[tuple[str, str]] | None = None):
        if client is None:  # pragma: no cover - needs AWS in the env
            import boto3

            client = boto3.client("sqs")
        self.client = client
        self.queue_url = queue_url
        self.batch_size = batch_size
        self.wait_seconds = wait_seconds
        self.spark = spark
        self.payload_fields = payload_fields or list(_DEFAULT_PAYLOAD)
        self.buffer = ReorderBuffer()
        # (part, lsn) -> receipt handle, awaiting sink commit
        self._pending: dict[tuple[int, int], str] = {}
        self._batch_no = 0

    def seek(self, offsets: dict[int, int]) -> None:
        self.buffer.seek(offsets)
        self._pending.clear()

    def poll(self) -> SourceBatch | None:
        # keep fetching until the buffer releases a gapless run or the
        # visible queue is exhausted (an empty receive). A batch of held
        # out-of-order messages is NOT a batch — returning it would let
        # the watermark advance past a gap.
        while True:
            fetched, exhausted = 0, False
            while fetched < self.batch_size:
                resp = self.client.receive_message(
                    QueueUrl=self.queue_url,
                    MaxNumberOfMessages=10,  # the SQS API maximum
                    WaitTimeSeconds=self.wait_seconds,
                    MessageAttributeNames=["All"],
                )
                msgs = resp.get("Messages", [])
                if not msgs:
                    exhausted = True
                    break
                for m in msgs:
                    fetched += 1
                    body = json.loads(m["Body"])
                    part, lsn = int(body["part_id"]), int(body["lsn"])
                    if self.buffer.insert(part, lsn, body):
                        self._pending[(part, lsn)] = m["ReceiptHandle"]
                    else:
                        # at/below the committed frontier: a redelivered
                        # dupe of something durable — delete right away
                        self.client.delete_message(
                            QueueUrl=self.queue_url,
                            ReceiptHandle=m["ReceiptHandle"])
            released = self.buffer.drain()
            if released:
                break
            if exhausted:
                return None
        rows, ends = [], {}
        for part, lsn, body in released:
            rows.append((lsn, part, json.dumps(body)))
            ends[part] = max(ends.get(part, -1), lsn)
        self._batch_no += 1
        return SourceBatch(
            df=_envelope_df(self.spark, rows, self.payload_fields),
            end_offsets=ends, batch_id=self._batch_no - 1)

    def ack(self, offsets: dict[int, int]) -> None:
        offsets = {int(k): int(v) for k, v in offsets.items()}
        self.buffer.ack_update(offsets)
        done = [k for k in self._pending
                if k[1] <= offsets.get(k[0], -1)]
        for k in done:
            self.client.delete_message(
                QueueUrl=self.queue_url, ReceiptHandle=self._pending.pop(k))


class AmqpConnector(ChangeConnector):
    """AMQP 0-9-1 implementation (reference: plugins/amqp — consume from
    a queue with manual acknowledgement). ``basic_get`` with
    ``auto_ack=False``; delivery tags are ``basic_ack``'d only in
    ``ack`` and only up to the sink-committed watermark, so an unacked
    consumer crash makes the broker redeliver everything younger — the
    same queue-is-the-replay-log shape as SQS, with delivery tags in
    place of receipt handles."""

    def __init__(self, spark: SparkSession, queue: str, *,
                 channel=None, url: str = "amqp://localhost",
                 batch_size: int = 10_000,
                 payload_fields: list[tuple[str, str]] | None = None):
        if channel is None:  # pragma: no cover - no pika in the sandbox
            try:
                import pika
            except ImportError as e:
                raise RuntimeError("AmqpConnector needs pika installed "
                                   "(or pass channel=)") from e
            conn = pika.BlockingConnection(pika.URLParameters(url))
            channel = conn.channel()
            channel.queue_declare(queue=queue, durable=True)
        self.channel = channel
        self.queue = queue
        self.spark = spark
        self.batch_size = batch_size
        self.payload_fields = payload_fields or list(_DEFAULT_PAYLOAD)
        self.buffer = ReorderBuffer()
        self._pending: dict[tuple[int, int], int] = {}  # -> delivery tag
        self._batch_no = 0

    def seek(self, offsets: dict[int, int]) -> None:
        self.buffer.seek(offsets)
        self._pending.clear()

    def poll(self) -> SourceBatch | None:
        # same release-or-exhausted loop as SqsConnector.poll: never
        # surface a batch while the frontier sits at a delivery gap
        while True:
            fetched, exhausted = 0, False
            while fetched < self.batch_size:
                method, _props, body = self.channel.basic_get(
                    self.queue, auto_ack=False)
                if method is None:
                    exhausted = True
                    break
                fetched += 1
                rec = json.loads(body)
                part, lsn = int(rec["part_id"]), int(rec["lsn"])
                if self.buffer.insert(part, lsn, rec):
                    self._pending[(part, lsn)] = method.delivery_tag
                else:
                    self.channel.basic_ack(method.delivery_tag)
            released = self.buffer.drain()
            if released:
                break
            if exhausted:
                return None
        rows, ends = [], {}
        for part, lsn, rec in released:
            rows.append((lsn, part, json.dumps(rec)))
            ends[part] = max(ends.get(part, -1), lsn)
        self._batch_no += 1
        return SourceBatch(
            df=_envelope_df(self.spark, rows, self.payload_fields),
            end_offsets=ends, batch_id=self._batch_no - 1)

    def ack(self, offsets: dict[int, int]) -> None:
        offsets = {int(k): int(v) for k, v in offsets.items()}
        self.buffer.ack_update(offsets)
        done = [k for k in self._pending
                if k[1] <= offsets.get(k[0], -1)]
        for k in done:
            self.channel.basic_ack(self._pending.pop(k))


# --------------------------------------------------------------------- zmq
def zmq_save(df: DataFrame, endpoint: str, *, socket=None) -> int:
    """``to zmq://… write bitz`` (reference zmq saver + bitz printer,
    web/docs/formats/bitz.md:40-49): frame the DataFrame as BITZ messages
    and PUSH one frame per message. Rows are collected to the driver in
    Arrow form — zmq is a transfer endpoint, not a storage path; returns
    the number of frames sent."""
    from tenzir_spark.sources.bitz import _encode_frames, _HDR

    if socket is None:  # pragma: no cover - no pyzmq in the sandbox
        try:
            import zmq
        except ImportError as e:
            raise RuntimeError("zmq_save needs pyzmq (or pass socket=)") from e
        ctx = zmq.Context.instance()
        socket = ctx.socket(zmq.PUSH)
        socket.connect(endpoint)
    blob = _encode_frames(df.toArrow())
    sent, pos = 0, 0
    while pos < len(blob):
        (length,) = _HDR.unpack_from(blob, pos)
        socket.send(blob[pos:pos + _HDR.size + length])
        pos += _HDR.size + length
        sent += 1
    return sent


def zmq_load(spark: SparkSession, endpoint: str, *, socket=None,
             max_messages: int | None = None,
             timeout_ms: int = 5_000) -> DataFrame:
    """``from zmq://… read bitz``: PULL size-prefixed BITZ frames until
    ``max_messages`` arrive or ``timeout_ms`` lapses, decode with the
    bitz frame parser, and return one DataFrame (batch flavor, like
    ``tcp_listen``/``udp_listen``)."""
    from tenzir_spark.sources.bitz import decode_frames

    if socket is None:  # pragma: no cover - no pyzmq in the sandbox
        try:
            import zmq
        except ImportError as e:
            raise RuntimeError("zmq_load needs pyzmq (or pass socket=)") from e
        ctx = zmq.Context.instance()
        socket = ctx.socket(zmq.PULL)
        socket.bind(endpoint)
        socket.setsockopt(zmq.RCVTIMEO, timeout_ms)
    tables = []
    got = 0
    while max_messages is None or got < max_messages:
        try:
            frame = socket.recv()
        except Exception:  # timeout (zmq.Again) or closed socket
            break
        if frame is None:
            break
        tables.extend(decode_frames(bytes(frame)))
        got += 1
    if not tables:
        raise ValueError(f"no bitz frames received from {endpoint}")
    import pyarrow as pa

    return spark.createDataFrame(
        pa.concat_tables(tables).to_pandas())
