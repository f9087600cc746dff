"""Change-source connector interface: the Kafka-shaped front door.

The reference's production CDC entry point is its kafka connector, whose
load-bearing property is WHEN offsets advance: the consumer seeks to the
last committed offset and commits new offsets only after the events are
durable downstream (reference: plugins/kafka/src/configuration.cpp:73-125
— manual commit, offsets stored out of the rebalance path; RFC-002's
"restart from the last acknowledged position").

This engine already stores that acknowledged position — the per-source-
partition LSN watermark — ATOMICALLY in the lake snapshot, so a connector
here is deliberately thin:

- ``seek(offsets)`` positions the source strictly AFTER the committed
  per-partition offsets (offset == LSN; for a real Kafka deployment the
  producer stamps lsn = partition offset, making the mapping identity).
- ``poll()`` yields the next micro-batch as a DataFrame in envelope shape
  (lsn, epoch, part_id, op, payload...).
- ``ack(offsets)`` reports positions the SINK has committed; a broker
  impl forwards them (kafka commitAsync), a file impl prunes its replay
  frontier. ack is advisory: crash-before-ack only widens redelivery,
  which the watermark filter already absorbs.

The file-log implementation is the sandbox stand-in for the broker; the
simulated broker implementation exists to unit-test the offset protocol
(redelivery, crash-before-ack, resume) without a broker. A real
``readStream.format("kafka")`` impl would parse ``value`` into the same
envelope and keep everything downstream unchanged.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SourceBatch:
    df: DataFrame
    # highest offset per source partition CONTAINED in this batch; the
    # sink's watermark after applying must be >= these for ack
    end_offsets: dict[int, int]
    batch_id: int


class ChangeConnector:
    """Interface. Implementations must be REPLAYABLE: after seek(o),
    poll() must eventually redeliver every event with offset > o[part]."""

    def seek(self, offsets: dict[int, int]) -> None:  # pragma: no cover
        raise NotImplementedError

    def poll(self) -> SourceBatch | None:  # pragma: no cover
        raise NotImplementedError

    def ack(self, offsets: dict[int, int]) -> None:
        """Sink-committed positions (advisory)."""


class FileLogConnector(ChangeConnector):
    """The batch-directory change log as a connector. seek() prunes whole
    batch directories whose every row group is PER-PARTITION fully at or
    below that partition's committed offset (parquet footer min/max — no
    data read), the same skip a broker does by seeking.

    A partition ABSENT from the committed-offset map defaults to -1
    (nothing committed): its events are never pruned, preserving the class
    contract that poll() redelivers every event with offset > o[part] even
    for partitions appearing for the first time."""

    def __init__(self, spark: SparkSession, changes_dir: str):
        self.spark = spark
        self.batches = sorted(
            p for p in glob.glob(os.path.join(changes_dir, "batch-*"))
            if os.path.isdir(p) or p.endswith(".parquet")
        )
        self._pos = 0
        self.acked: dict[int, int] = {}

    @staticmethod
    def _rg_stats(path: str):
        """Yield (part_lo, part_hi, lsn_max) per row group from footers.
        part_lo/part_hi are None when part_id stats are missing."""
        import pyarrow.parquet as pq

        files = [path] if path.endswith(".parquet") else glob.glob(
            os.path.join(path, "*.parquet"))
        for f in files:
            md = pq.read_metadata(f)
            lsn_i = md.schema.names.index("lsn")
            part_i = md.schema.names.index("part_id") if "part_id" in md.schema.names else None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                ls = g.column(lsn_i).statistics
                lsn_max = int(ls.max) if ls is not None and ls.has_min_max else None
                plo = phi = None
                if part_i is not None:
                    ps = g.column(part_i).statistics
                    if ps is not None and ps.has_min_max:
                        plo, phi = int(ps.min), int(ps.max)
                yield plo, phi, lsn_max

    def _batch_committed(self, path: str, offsets: dict[int, int]) -> bool:
        """True iff every row group is provably already committed for every
        source partition it may contain. Unknown stats, or any partition id
        in the row group's [min, max] span that is missing from the offset
        map (→ -1), make the row group unprunable — safe, never lossy."""
        any_rg = False
        for plo, phi, lsn_max in self._rg_stats(path):
            any_rg = True
            if lsn_max is None or plo is None or phi - plo > 4096:
                return False
            floor = min(
                offsets.get(p, -1) for p in range(plo, phi + 1)
            )
            if lsn_max > floor:
                return False
        return any_rg

    def seek(self, offsets: dict[int, int]) -> None:
        offsets = {int(k): int(v) for k, v in offsets.items()}
        self._pos = 0
        while (
            self._pos < len(self.batches)
            and self._batch_committed(self.batches[self._pos], offsets)
        ):
            self._pos += 1

    def poll(self) -> SourceBatch | None:
        if self._pos >= len(self.batches):
            return None
        path = self.batches[self._pos]
        bid = self._pos
        self._pos += 1
        df = self.spark.read.parquet(path)
        return SourceBatch(df=df, end_offsets={}, batch_id=bid)

    def ack(self, offsets: dict[int, int]) -> None:
        self.acked = dict(offsets)


@dataclass
class SimulatedBrokerConnector(ChangeConnector):
    """In-memory partitioned log for protocol tests: records are
    (part_id, lsn, op, payload-dict); poll() serves fixed-size batches
    from the seek position, optionally re-delivering a suffix of the
    previous batch (at-least-once broker behavior)."""

    spark: SparkSession
    records: list[dict]  # each: part_id, lsn, op, doc_id, tokens, n_tok, source
    batch_size: int = 100
    redeliver_last: int = 0  # events of the previous poll to deliver again
    positions: dict[int, int] = field(default_factory=dict)
    acked: dict[int, int] = field(default_factory=dict)
    _cursor: int = 0
    _batch_no: int = 0

    def __post_init__(self):
        self.records = sorted(self.records, key=lambda r: (r["lsn"]))

    def seek(self, offsets: dict[int, int]) -> None:
        self.positions = {int(k): int(v) for k, v in offsets.items()}
        self._cursor = 0
        while self._cursor < len(self.records):
            r = self.records[self._cursor]
            if r["lsn"] > self.positions.get(int(r["part_id"]), -1):
                break
            self._cursor += 1

    def poll(self) -> SourceBatch | None:
        if self._cursor >= len(self.records):
            return None
        start = max(self._cursor - self.redeliver_last, 0) if self._batch_no else self._cursor
        chunk = self.records[start:self._cursor + self.batch_size]
        self._cursor += self.batch_size
        self._batch_no += 1
        ends: dict[int, int] = {}
        for r in chunk:
            p = int(r["part_id"])
            ends[p] = max(ends.get(p, -1), int(r["lsn"]))
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("lsn", T.LongType(), False),
            T.StructField("epoch", T.IntegerType(), True),
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ])
        rows = [
            (int(r["lsn"]), 0, int(r["part_id"]), r["op"], r.get("doc_id"),
             r.get("tokens"), r.get("n_tok"), r.get("source"))
            for r in chunk
        ]
        return SourceBatch(
            df=self.spark.createDataFrame(rows, schema),
            end_offsets=ends,
            batch_id=self._batch_no - 1,
        )

    def ack(self, offsets: dict[int, int]) -> None:
        self.acked = {int(k): int(v) for k, v in offsets.items()}


class KafkaConnector(ChangeConnector):
    """Real Kafka implementation of the connector protocol via the
    ``kafka-python`` client (import-gated: the sandbox has no broker or
    client lib; the class is code-complete and the shared protocol tests
    run against it whenever ``KAFKA_BOOTSTRAP`` points at a broker).

    Mapping to the engine's envelope: kafka partition → ``part_id``,
    kafka offset → ``lsn`` (the identity mapping the producer contract
    stamps; a keyed topic gives the keyed-routing guarantee the collapse
    relies on), message value → JSON payload columns.

    Offset discipline = the reference's manual-commit consumer
    (plugins/kafka/src/configuration.cpp:73-125: offsets seeked explicitly
    on assign, committed out of the rebalance path only after downstream
    durability): ``seek`` positions strictly after the TABLE's committed
    watermarks, ``ack`` forwards them with ``commit`` — a crash between
    poll and ack only widens redelivery, which the watermark filter
    absorbs. ``enable_auto_commit=False`` always.
    """

    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        topic: str,
        *,
        group_id: str = "tenzir-spark-cdc",
        batch_size: int = 100_000,
        poll_timeout_ms: int = 2_000,
        payload_fields: list[tuple[str, str]] | None = None,
    ):
        try:
            from kafka import KafkaConsumer, TopicPartition  # noqa: F401
        except ImportError as e:  # pragma: no cover - no client in sandbox
            raise RuntimeError(
                "KafkaConnector needs the kafka-python client installed"
            ) from e
        self.spark = spark
        self.topic = topic
        self._tp_cls = TopicPartition
        self.batch_size = batch_size
        self.poll_timeout_ms = poll_timeout_ms
        # payload columns decoded from the JSON value; (name, spark type)
        self.payload_fields = payload_fields or [
            ("doc_id", "string"),
            ("tokens", "array<int>"),
            ("n_tok", "int"),
            ("source", "string"),
        ]
        self.consumer = KafkaConsumer(
            bootstrap_servers=bootstrap_servers,
            group_id=group_id,
            enable_auto_commit=False,  # manual-commit discipline
            auto_offset_reset="earliest",
            consumer_timeout_ms=poll_timeout_ms,
        )
        parts = self.consumer.partitions_for_topic(topic) or set()
        self._tps = [TopicPartition(topic, p) for p in sorted(parts)]
        self.consumer.assign(self._tps)
        self._batch_no = 0

    def seek(self, offsets: dict[int, int]) -> None:
        offsets = {int(k): int(v) for k, v in offsets.items()}
        for tp in self._tps:
            committed = offsets.get(tp.partition, -1)
            if committed >= 0:
                # lsn == offset: next unseen event sits at offset + 1
                self.consumer.seek(tp, committed + 1)
            else:
                self.consumer.seek_to_beginning(tp)

    def poll(self) -> SourceBatch | None:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        records = self.consumer.poll(
            timeout_ms=self.poll_timeout_ms, max_records=self.batch_size
        )
        rows, ends = [], {}
        for tp, msgs in records.items():
            for m in msgs:
                rows.append((int(m.offset), int(tp.partition),
                             bytes(m.value or b"").decode("utf-8")))
                ends[tp.partition] = max(ends.get(tp.partition, -1), int(m.offset))
        if not rows:
            return None
        raw_schema = T.StructType([
            T.StructField("lsn", T.LongType(), False),
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("value", T.StringType(), True),
        ])
        json_schema = ", ".join(
            ["op string"] + [f"{n} {t}" for n, t in self.payload_fields]
        )
        df = (
            self.spark.createDataFrame(rows, raw_schema)
            .withColumn("_p", F.from_json(F.col("value"), json_schema))
            .select(
                "lsn",
                F.lit(0).alias("epoch"),
                "part_id",
                F.coalesce(F.col("_p.op"), F.lit("insert")).alias("op"),
                *[F.col(f"_p.{n}").alias(n) for n, _t in self.payload_fields],
            )
        )
        self._batch_no += 1
        return SourceBatch(df=df, end_offsets=ends, batch_id=self._batch_no
                           - 1)

    def ack(self, offsets: dict[int, int]) -> None:
        """Forward sink-committed watermarks as kafka offsets (advisory —
        the table snapshot stays the durable truth; this only narrows
        redelivery after a group rebalance)."""
        from kafka import OffsetAndMetadata

        def _om(next_off: int):
            try:  # kafka-python >= 2.1 adds leader_epoch
                return OffsetAndMetadata(next_off, "", -1)
            except TypeError:
                return OffsetAndMetadata(next_off, "")

        commit = {
            self._tp_cls(self.topic, int(p)): _om(int(o) + 1)
            for p, o in offsets.items()
            if int(o) >= 0
        }
        if commit:
            self.consumer.commit(commit)

    def close(self) -> None:
        self.consumer.close()


def kafka_change_stream(spark: SparkSession, bootstrap_servers: str,
                        topic: str, payload_json_schema: str,
                        starting_offsets: str = "earliest"):
    """The Structured Streaming flavor: ``readStream.format("kafka")``
    mapped to the engine envelope (partition → part_id, offset → lsn,
    value JSON → payload). Feed the result to ``foreachBatch`` with
    ``IngestRunner.apply_batch_df`` exactly like streaming/ingest.py's
    file tail. Requires the spark-sql-kafka package on the classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``) —
    not bundled in this sandbox, hence code-complete but exercised only
    where a broker+package exist."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.col("offset").alias("lsn"),
        F.lit(0).alias("epoch"),
        F.col("partition").alias("part_id"),
        F.from_json(F.col("value").cast("string"), payload_json_schema).alias("_p"),
    )
    # DDL field names: split on commas OUTSIDE <> so nested types
    # (array<int>, map<string,string>) survive
    payload_cols, buf, depth = [], [], 0
    for ch in payload_json_schema + ",":
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            part = "".join(buf).strip()
            if part:
                payload_cols.append(part.split()[0].rstrip(":"))
            buf = []
        else:
            buf.append(ch)
    return parsed.select(
        "lsn", "epoch", "part_id",
        F.coalesce(F.col("_p.op"), F.lit("insert")).alias("op"),
        *[F.col(f"_p.{c}").alias(c) for c in payload_cols if c != "op"],
    )


class LakeChangeConnector(ChangeConnector):
    """Tail ANOTHER lake table's incremental changelog through the
    connector protocol — lake-to-lake continuous replication, the lake
    acting as its own WAL (reference analog: a node's export feeding a
    second node's import, export.cpp → import.cpp).

    Offset mapping: one logical source partition (0); ``lsn`` = the
    UPSTREAM SNAPSHOT VERSION whose window produced the change. Each
    poll() emits the net change batch for the next window of
    ``versions_per_poll`` upstream versions (LakeTable.read_changes), in
    envelope shape (lsn, epoch, part_id, op, payload…). Replayable by
    construction: manifests are immutable, so a fresh connector seeking
    from the downstream's committed watermark redelivers exactly the
    unacknowledged versions, and the watermark filter absorbs overlap.

    The upstream's ``expire_snapshots`` bounds the replay horizon:
    seeking below it raises (read_changes' contract) — the consumer must
    re-bootstrap, as with any log whose tail was truncated. Empty
    windows (folds, property-only commits) produce empty batches the
    runner noop-aborts; they advance no watermark and re-polling them
    after a restart is idempotent."""

    def __init__(self, spark: SparkSession, warehouse: str, table_name: str,
                 versions_per_poll: int = 1, start_at: int | None = None,
                 fs=None):
        from tenzir_spark.lake.table import LakeTable

        self.spark = spark
        # fs (lake/fs.py): read the UPSTREAM's manifests through a
        # portable filesystem — lake-to-lake replication across stores
        self.upstream = LakeTable(warehouse, table_name, fs=fs)
        self.versions_per_poll = max(1, int(versions_per_poll))
        # start_at: a FLOOR on where tailing begins — the re-bootstrap
        # contract the horizon error points to: full-read the upstream at
        # version V out of band (e.g. merge_batch(upstream.read())), then
        # tail with start_at=V. Explicit opt-in, because starting past 0
        # skips history by design. seek() takes max(committed, start_at):
        # a STALE start_at can never rewind an established consumer, and
        # a consumer whose committed watermark fell below the expired
        # horizon is un-wedged by the bootstrap (committed-only semantics
        # would ignore start_at and loop on the horizon error forever).
        self.start_at = start_at
        self._pos = 0  # last consumed upstream snapshot version
        self._batch_no = 0
        self.acked: dict[int, int] = {}

    def seek(self, offsets: dict[int, int]) -> None:
        committed = [int(v) for k, v in offsets.items() if int(k) == 0]
        floor = int(self.start_at) if self.start_at is not None else 0
        self._pos = max(committed + [floor, 0])

    def lag(self) -> int:
        """Upstream versions not yet consumed (replication lag)."""
        return max(0, self.upstream.current_version() - self._pos)

    def poll(self) -> SourceBatch | None:
        from pyspark.sql import functions as F

        head = self.upstream.current_version()
        if self._pos >= head:
            return None
        end = min(self._pos + self.versions_per_poll, head)
        changes = self.upstream.read_changes(self.spark, self._pos, end)
        payload = [c for c in changes.columns if c != "op"]
        df = changes.select(
            F.lit(end).cast("long").alias("lsn"),
            F.lit(0).alias("epoch"),
            F.lit(0).alias("part_id"),
            F.col("op"),
            *payload,
        )
        self._pos = end
        self._batch_no += 1
        # batch_id = the durable window-end upstream version, NOT a
        # per-instance counter: every incremental run constructs a fresh
        # connector, and a counter restarting at 0 would overwrite the
        # downstream's earlier DLQ quarantine dirs and metrics rows
        return SourceBatch(df=df, end_offsets={0: end}, batch_id=end)

    def ack(self, offsets: dict[int, int]) -> None:
        self.acked = {int(k): int(v) for k, v in offsets.items()}


def run_connector(runner, connector: ChangeConnector,
                  max_batches: int | None = None,
                  transform=None) -> dict:
    """Drive a connector through the idempotent micro-batch body. The
    offset-commit protocol: seek from the TABLE's committed watermarks
    (the durable source of truth), apply, then ack the table's NEW
    watermarks — offsets thus advance only after the snapshot commit,
    exactly the reference's manual-commit kafka discipline.

    ``transform`` (DataFrame -> DataFrame) runs the pipeline's operator
    stages between poll and apply (the TQL text path's `where`/`set`/…
    per micro-batch). A transform that FILTERS events keeps exactly-once
    intact: the watermark only advances to the max surviving lsn, so a
    restart redelivers the filtered suffix and the filter + watermark
    absorb it again — idempotent, at worst re-scanned once."""
    runner.ensure_table()
    connector.seek(runner.watermarks())
    applied = 0
    stats = []
    # a transform accepting (df, batch_id) gets the micro-batch id —
    # stateful stages (the dedup indexes' `batch auto`) need it; a
    # plain (df) transform keeps working
    from tenzir_spark.cdc.runner import accepts_batch_id

    two_arg = transform is not None and accepts_batch_id(transform)
    while max_batches is None or applied < max_batches:
        b = connector.poll()
        if b is None:
            break
        if transform is None:
            body = b.df
        elif two_arg:
            body = transform(b.df, b.batch_id)
        else:
            body = transform(b.df)
        st = runner.apply_batch_df(body, b.batch_id)
        wm = {int(k): int(v) for k, v in runner.watermarks().items()}
        connector.ack(wm)
        stats.append(st)
        applied += 1
    return {"batches": applied, "batch_stats": stats}
