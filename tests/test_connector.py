"""Connector protocol: offsets (LSNs) advance only after the snapshot
commit; redelivery and crash-before-ack are absorbed by the watermark
filter (reference kafka semantics, plugins/kafka/src/configuration.cpp:
73-125 manual-commit discipline)."""

import os

import pytest

from tenzir_spark.cdc.runner import IngestRunner
from tenzir_spark.sources.connector import (
    FileLogConnector,
    SimulatedBrokerConnector,
    run_connector,
)


def _mk_records(n=600, parts=3, docs=80):
    """Deterministic keyed log: doc -> partition by hash (keyed-topic
    contract), every 7th op a delete, every 5th lsn redelivered later."""
    import zlib

    recs = []
    for lsn in range(n):
        doc = f"d{(lsn * 37) % docs}"
        part = zlib.crc32(doc.encode()) % parts  # stable keyed routing
        op = "delete" if lsn % 7 == 3 else ("insert" if lsn % 3 == 0 else "update")
        recs.append({
            "lsn": lsn, "part_id": part, "op": op, "doc_id": doc,
            "tokens": [lsn % 50, (lsn * 3) % 50, part], "n_tok": 3,
            "source": f"s{part}",
        })
    return recs


def _oracle_state(records):
    latest = {}
    for r in sorted(records, key=lambda r: r["lsn"]):
        if r["op"] == "delete":
            latest.pop(r["doc_id"], None)
        else:
            latest[r["doc_id"]] = r
    return {
        k: (tuple(v["tokens"]), v["n_tok"], v["source"]) for k, v in latest.items()
    }


def _engine_map(runner):
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in runner.final_state().collect()
    }


@pytest.fixture(scope="module")
def records():
    return _mk_records()


def _kafka_available() -> bool:
    if not os.environ.get("KAFKA_BOOTSTRAP"):
        return False
    try:
        import kafka  # noqa: F401

        return True
    except ImportError:
        return False


def _make_connector(kind: str, spark, records, **kw):
    """Shared factory for the protocol suite: the simulated broker always
    runs; the REAL KafkaConnector runs whenever $KAFKA_BOOTSTRAP points at
    a broker and kafka-python is installed (records are produced to a
    fresh keyed topic first so both connectors see the same log)."""
    if kind == "sim":
        return SimulatedBrokerConnector(spark, records, **kw)
    if not _kafka_available():
        pytest.skip("no kafka broker/client in this environment")
    import json
    import uuid

    from kafka import KafkaProducer
    from kafka.admin import KafkaAdminClient, NewTopic

    from tenzir_spark.sources.connector import KafkaConnector

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = f"tenzir-spark-test-{uuid.uuid4().hex[:8]}"
    n_parts = max(r["part_id"] for r in records) + 1
    KafkaAdminClient(bootstrap_servers=bootstrap).create_topics(
        [NewTopic(topic, num_partitions=n_parts, replication_factor=1)]
    )
    prod = KafkaProducer(bootstrap_servers=bootstrap)
    # lsn == offset contract: produce per partition in lsn order
    for r in sorted(records, key=lambda x: x["lsn"]):
        payload = {k: r[k] for k in ("op", "doc_id", "tokens", "n_tok", "source")}
        prod.send(topic, value=json.dumps(payload).encode(),
                  partition=int(r["part_id"]))
    prod.flush()
    return KafkaConnector(spark, bootstrap, topic,
                          batch_size=kw.get("batch_size", 100))


@pytest.mark.parametrize("kind", ["sim", "kafka"])
def test_broker_replay_with_redelivery(spark, records, tmp_path, kind):
    """At-least-once broker (every poll redelivers a suffix of the prior
    batch) must still converge to the in-order oracle exactly once."""
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8)
    kw = {"batch_size": 97}
    if kind == "sim":
        kw["redeliver_last"] = 25
    conn = _make_connector(kind, spark, records, **kw)
    out = run_connector(r, conn)
    assert out["batches"] >= 6
    assert _engine_map(r) == _oracle_state(records)
    # offsets were acked only from committed watermarks
    wm = {int(k): int(v) for k, v in r.watermarks().items()}
    if kind == "sim":
        assert conn.acked == wm
        for p, off in wm.items():
            ends = max(x["lsn"] for x in records if x["part_id"] == p)
            assert off == ends
    else:
        # kafka lsn == per-partition offset: the watermark is the last
        # offset of each partition (= per-partition record count - 1)
        for p, off in wm.items():
            assert off == sum(1 for x in records if x["part_id"] == p) - 1


@pytest.mark.parametrize("kind", ["sim", "kafka"])
def test_crash_before_ack_resumes_idempotently(spark, records, tmp_path, kind):
    """Stop after 2 batches WITHOUT acking further (simulated crash): a
    fresh connector seeking from the table's committed watermarks must
    redeliver the tail (and any overlap) and converge identically."""
    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    conn = _make_connector(kind, spark, records, batch_size=100)
    run_connector(r, conn, max_batches=2)
    applied_mid = {int(k): int(v) for k, v in r.watermarks().items()}
    assert applied_mid, "some progress must be committed"

    # crash: new runner + new connector; seek comes from the TABLE state
    r2 = IngestRunner(spark, wh, n_buckets=8)
    conn2 = _make_connector(kind, spark, records, batch_size=100)
    run_connector(r2, conn2)
    assert _engine_map(r2) == _oracle_state(records)
    if kind != "sim":
        return  # total-replay noop probe below drives sim positions directly

    # full re-run from scratch over the SAME table: every batch a noop
    v = r2.table.current_version()
    conn3 = SimulatedBrokerConnector(spark, records, batch_size=100)
    conn3.seek({})  # ignore committed offsets: worst-case total replay
    r3 = IngestRunner(spark, wh, n_buckets=8)
    r3.ensure_table()
    while (b := conn3.poll()) is not None:
        r3.apply_batch_df(b.df, 900 + b.batch_id)
    assert r3.table.current_version() == v, "total replay must be pure noop"
    assert _engine_map(r3) == _oracle_state(records)


def test_seek_skips_consumed_positions(spark, records):
    """seek() must position strictly after the committed offsets."""
    conn = SimulatedBrokerConnector(spark, records, batch_size=10**6)
    offsets = {p: 199 for p in {r["part_id"] for r in records}}
    conn.seek(offsets)
    b = conn.poll()
    lsns = [r["lsn"] for r in b.df.select("lsn").collect()]
    assert min(lsns) == 200 and max(lsns) == max(r["lsn"] for r in records)


def test_file_connector_prunes_consumed_batches(spark, tmp_path):
    """FileLogConnector.seek skips whole batch files below the committed
    frontier using parquet footer stats (no data read), and the driver
    loop converges to the same state as IngestRunner.run."""
    from tenzir_spark.cdc.changegen import generate_changes
    from tenzir_spark.cdc.oracle import naive_replay

    d = str(tmp_path / "chg")
    generate_changes(d, n_events=4000, n_docs=500, n_parts=4, n_batches=5)
    oracle = naive_replay(d)

    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    conn = FileLogConnector(spark, d)
    run_connector(r, conn, max_batches=3)

    # resume: a fresh file connector must skip at least the fully-consumed
    # leading batches
    conn2 = FileLogConnector(spark, d)
    conn2.seek(r.watermarks())
    assert conn2._pos >= 1
    r2 = IngestRunner(spark, wh, n_buckets=8)
    run_connector(r2, conn2)

    from tests.util import assert_state_equal

    assert_state_equal(r2.final_state().toPandas(), oracle)


def test_file_connector_keeps_new_partition_batches(spark, tmp_path):
    """A batch holding a NEWLY-APPEARING source partition's events at low
    LSNs must survive seek() even when every KNOWN partition's offset is
    far ahead (missing partitions default to offset -1 — pruning on the
    batch-global max LSN vs min(committed) would silently drop them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "chg"
    b0 = d / "batch-000"
    b0.mkdir(parents=True)
    # part 0 at lsn 0..9 and part 7 (never committed) at lsn 10..19
    pq.write_table(
        pa.table({"lsn": list(range(10)), "part_id": [0] * 10}),
        str(b0 / "p0.parquet"),
    )
    pq.write_table(
        pa.table({"lsn": list(range(10, 20)), "part_id": [7] * 10}),
        str(b0 / "p7.parquet"),
    )
    conn = FileLogConnector(spark, str(d))
    # part 0 fully committed way past this batch; part 7 unknown
    conn.seek({0: 1000})
    assert conn._pos == 0, "batch with an uncommitted new partition was pruned"
    # once part 7 is committed past its max lsn too, the batch IS pruned
    conn.seek({0: 1000, 7: 19})
    assert conn._pos == 1
    # strictly-below offsets keep the batch
    conn.seek({0: 8, 7: 19})
    assert conn._pos == 0


# --------------------------------------------------- lake-to-lake tailing


def _upstream_with_changes(spark, tmp_path):
    """An upstream lake table written through the ENGINE's own runner, so
    its history is a genuine merge-on-read changelog."""
    import pyspark.sql.types as T

    up = IngestRunner(spark, str(tmp_path / "up_wh"), table_name="up",
                      n_buckets=4)
    up.ensure_table()
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])

    def apply(batch_id, rows):
        up.apply_batch_df(spark.createDataFrame(rows, ev_schema), batch_id)

    apply(0, [(f"d{i}", [0, i], 2, "web", "insert", 0, i) for i in range(12)])
    apply(1, [("d3", [1, 3], 2, "wiki", "update", 0, 100),
              ("d5", None, None, None, "delete", 0, 101)])
    return up


@pytest.mark.parametrize("versions_per_poll", [1, 8])
def test_lake_to_lake_replication_converges(spark, tmp_path, versions_per_poll):
    """Tailing an upstream lake through the connector reproduces its
    state downstream; later upstream commits replicate incrementally;
    a crash (fresh connector, no acks) replays idempotently — zero new
    downstream snapshots on pure redelivery."""
    from tenzir_spark.sources.connector import LakeChangeConnector

    up = _upstream_with_changes(spark, tmp_path)
    down = IngestRunner(spark, str(tmp_path / "down_wh"), table_name="down",
                        n_buckets=4)

    def state(runner):
        return {(r["doc_id"], tuple(r["tokens"] or []))
                for r in runner.table.read(spark).collect()}

    conn = LakeChangeConnector(spark, str(tmp_path / "up_wh"), "up",
                               versions_per_poll=versions_per_poll)
    st = run_connector(down, conn)
    assert st["batches"] >= 1
    assert state(down) == state(up)
    assert conn.lag() == 0
    # offsets acked == the downstream's committed watermark (upstream version)
    assert conn.acked == {0: up.table.current_version()}

    # incremental: one more upstream change, tail again
    import pyspark.sql.types as T
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    up.apply_batch_df(spark.createDataFrame(
        [("d0", [9, 9], 2, "code", "update", 0, 200)], ev_schema), 2)
    st2 = run_connector(down, LakeChangeConnector(
        spark, str(tmp_path / "up_wh"), "up",
        versions_per_poll=versions_per_poll))
    assert sum(s["events_in"] for s in st2["batch_stats"]) >= 1
    assert state(down) == state(up)

    # crash/redelivery: a third fresh connector finds nothing fresh and
    # commits no new snapshot (noop-abort on pure replay)
    v_before = down.table.current_version()
    run_connector(down, LakeChangeConnector(
        spark, str(tmp_path / "up_wh"), "up",
        versions_per_poll=versions_per_poll))
    assert down.table.current_version() == v_before
    assert state(down) == state(up)


def test_lake_tail_expired_horizon_raises(spark, tmp_path):
    """If the upstream expired the snapshots a consumer still needs, the
    connector surfaces read_changes' horizon error instead of silently
    skipping changes."""
    from tenzir_spark.sources.connector import LakeChangeConnector

    up = _upstream_with_changes(spark, tmp_path)
    up.table.compact(spark)
    up.table.expire_snapshots(keep_last=1)
    conn = LakeChangeConnector(spark, str(tmp_path / "up_wh"), "up")
    conn.seek({})  # fresh consumer needs the expired tail
    with pytest.raises(ValueError, match="changelog horizon expired"):
        conn.poll()


def test_lake_to_lake_carries_new_columns(spark, tmp_path):
    """Replication across schema evolution: the upstream gains a NEW
    payload column mid-stream; the changelog emits it under the evolved
    schema and the downstream's own reconciliation adds the column —
    lake-to-lake stays faithful through schema change."""
    import pyspark.sql.types as T

    from tenzir_spark.sources.connector import LakeChangeConnector

    base_fields = [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
    env_fields = [
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ]
    up = IngestRunner(spark, str(tmp_path / "up"), table_name="up", n_buckets=4)
    up.ensure_table()
    up.apply_batch_df(spark.createDataFrame(
        [("a", [1], 1, "web", "insert", 0, 1)],
        T.StructType(base_fields + env_fields)), 0)
    # batch 2 carries a brand-new column `meta`
    up.apply_batch_df(spark.createDataFrame(
        [("b", [2], 1, "web", "m1", "insert", 0, 2)],
        T.StructType(base_fields
                     + [T.StructField("meta", T.StringType())]
                     + env_fields)), 1)

    down = IngestRunner(spark, str(tmp_path / "dn"), table_name="dn",
                        n_buckets=4)
    run_connector(down, LakeChangeConnector(spark, str(tmp_path / "up"), "up",
                                            versions_per_poll=1))
    rows = {r["doc_id"]: r for r in down.table.read(spark).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["meta"] == "m1" and rows["a"]["meta"] is None
    assert "meta" in [f.name for f in down.table.schema().fields]


def test_lake_tail_bootstrap_start_at(spark, tmp_path):
    """The re-bootstrap contract end to end: upstream expired its early
    history; a fresh consumer full-reads the current state out of band,
    then tails with start_at=<that version> — converges, and committed
    offsets override start_at on later runs."""
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import LakeTable
    from tenzir_spark.lake.merge import merge_batch
    from tenzir_spark.sources.connector import LakeChangeConnector

    up = _upstream_with_changes(spark, tmp_path)
    up.table.compact(spark)
    up.table.expire_snapshots(keep_last=1)  # tail truncated
    v_boot = up.table.current_version()

    # out-of-band bootstrap: full read -> downstream merge
    down = IngestRunner(spark, str(tmp_path / "dn"), table_name="dn",
                        n_buckets=4)
    down.ensure_table()
    from pyspark.sql import functions as F

    state = up.table.read(spark).select(
        "doc_id", "tokens", "n_tok", "source").withColumn(
        "op", F.lit("insert"))
    merge_batch(spark, down.table, state, key="doc_id")

    # tail from the bootstrap point; one more upstream change replicates
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    up.apply_batch_df(spark.createDataFrame(
        [("d1", [5, 5], 2, "code", "update", 0, 300)], ev_schema), 9)
    st = run_connector(down, LakeChangeConnector(
        spark, str(tmp_path / "up_wh"), "up", start_at=v_boot))
    assert st["batches"] >= 1

    def state_of(t: LakeTable):
        return {(r["doc_id"], tuple(r["tokens"] or []))
                for r in t.read(spark).collect()}

    assert state_of(down.table) == state_of(up.table)
    # a second fresh connector with a stale start_at must NOT rewind:
    # committed offsets win
    v_now = down.table.current_version()
    run_connector(down, LakeChangeConnector(
        spark, str(tmp_path / "up_wh"), "up", start_at=0))
    assert down.table.current_version() == v_now  # pure replay, no-op
