"""Streaming TQL text front-end (run_tql_stream): the reference's
implicit closed streaming pipelines — `tenzir 'from kafka … | where … |
import'` runs continuously with exactly-once offsets
(libtenzir/src/exec_pipeline.cpp:118-184; kafka manual-commit discipline
plugins/kafka/src/configuration.cpp:73-125). Here: textual pipeline tails
the simulated broker through where|import, survives a forced restart, and
the stream:// head returns a real StreamingQuery."""

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tenzir_spark.plans.pipeline import TqlError, run_tql_stream
from tenzir_spark.sources.connector import SimulatedBrokerConnector


def _records(n=240, n_docs=40):
    # keyed routing by construction: doc d(i%40) always lands on
    # partition (i%2) because 40 is even; per-partition lsn strictly
    # increasing (global total order)
    return [
        {"part_id": i % 2, "lsn": i, "op": "insert",
         "doc_id": f"d{i % n_docs}", "tokens": [i, i + 1],
         "n_tok": i % 5, "source": "s"}
        for i in range(n)
    ]


def _expected_lww(records, min_n_tok=2):
    """LWW per doc over the FILTER-SURVIVING events only."""
    best = {}
    for r in records:
        if r["n_tok"] >= min_n_tok:
            cur = best.get(r["doc_id"])
            if cur is None or r["lsn"] > cur["lsn"]:
                best[r["doc_id"]] = r
    return {d: (r["lsn"], tuple(r["tokens"]), r["n_tok"])
            for d, r in best.items()}


def test_tql_stream_broker_where_import_restart(spark, tmp_path):
    recs = _records()
    text = f"from broker://sim | where n_tok >= 2 | import {tmp_path}/wh/t"

    # ---- phase 1: apply two micro-batches, then "kill" the pipeline
    broker = SimulatedBrokerConnector(spark, recs, batch_size=100)
    st1 = run_tql_stream(spark, text, connector=broker, max_batches=2)
    assert st1["batches"] == 2
    v_after_kill = st1["runner"].table.current_version()
    assert v_after_kill == 2

    # ---- phase 2: forced restart — fresh connector AND fresh runner,
    # seeded only by the durable per-partition watermarks in the table
    # snapshot; the broker also redelivers a suffix (at-least-once)
    broker2 = SimulatedBrokerConnector(spark, recs, batch_size=100,
                                       redeliver_last=25)
    st2 = run_tql_stream(spark, text, connector=broker2)
    runner = st2["runner"]
    assert st2["batches"] >= 1

    # final state == LWW over filter-surviving events, computed
    # independently — identical no matter where the kill landed
    rows = runner.table.read(spark).collect()
    got = {r["doc_id"]: (None, tuple(r["tokens"]), r["n_tok"]) for r in rows}
    exp = _expected_lww(recs)
    assert set(got) == set(exp)
    for d, (_, toks, nt) in exp.items():
        assert got[d][1] == toks and got[d][2] == nt

    # watermarks advanced exactly to the max SURVIVING lsn per partition
    surv = [r for r in recs if r["n_tok"] >= 2]
    exp_wm = {}
    for r in surv:
        exp_wm[str(r["part_id"])] = max(
            exp_wm.get(str(r["part_id"]), -1), r["lsn"])
    assert runner.watermarks() == exp_wm
    # ack went back to the broker only after the snapshot commit
    assert broker2.acked == {int(k): v for k, v in exp_wm.items()}

    # ---- phase 3: one more restart — everything at/below the watermark
    # is pruned or absorbed: no new snapshot commits (noop-abort)
    v_final = runner.table.current_version()
    broker3 = SimulatedBrokerConnector(spark, recs, batch_size=100)
    st3 = run_tql_stream(spark, text, connector=broker3)
    assert st3["runner"].table.current_version() == v_final
    assert st3["runner"].table.read(spark).count() == len(exp)


def test_tql_stream_guards(spark, tmp_path):
    recs = _records(20)
    broker = SimulatedBrokerConnector(spark, recs, batch_size=10)
    # no import tail -> a continuous source needs a durable sink
    with pytest.raises(TqlError, match="must end with `import"):
        run_tql_stream(spark, "from broker://sim | where n_tok >= 2",
                       connector=broker)
    # stages must not drop the exactly-once envelope columns
    with pytest.raises(TqlError, match="envelope column"):
        run_tql_stream(
            spark,
            f"from broker://sim | select doc_id | import {tmp_path}/wh/t",
            connector=broker, max_batches=1)
    # unknown scheme without an injected connector: targeted error
    with pytest.raises(TqlError, match="no connector for"):
        run_tql_stream(spark, f"from amqps://x | import {tmp_path}/wh/t")


def test_tql_stream_file_tail_returns_streaming_query(spark, tmp_path):
    """`from stream://<dir> | where … | import <root>` — Structured
    Streaming file tail; the text path returns the started
    StreamingQuery and the transform runs inside foreachBatch."""
    from tenzir_spark.cdc.changegen import generate_changes

    changes = str(tmp_path / "chg")
    generate_changes(changes, n_events=3000, n_docs=300, n_parts=4,
                     n_batches=2, seed=42)
    root = f"{tmp_path}/wh/corpus"
    q = run_tql_stream(
        spark,
        f"from stream://{changes} | where n_tok >= 10 | import {root}",
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    runner = q._tenzir_runner
    n = runner.table.read(spark).count()
    assert n > 0
    # the where ran per micro-batch: nothing under 10 tokens survives
    assert runner.table.read(spark).filter("n_tok < 10").count() == 0
    assert runner.watermarks()  # committed per-partition positions


def test_tql_stream_log_connector_head(spark, tmp_path):
    """`from log://<dir>` tails an on-disk batch-directory change log
    through the connector protocol (footer-pruned seek) — the no-broker
    deployment shape."""
    from tenzir_spark.cdc.changegen import generate_changes

    changes = str(tmp_path / "chg")
    generate_changes(changes, n_events=2000, n_docs=200, n_parts=4,
                     n_batches=2, seed=7)
    root = f"{tmp_path}/wh/corpus"
    st = run_tql_stream(spark, f"from log://{changes} | import {root}")
    assert st["batches"] == 2
    n1 = st["runner"].table.read(spark).count()
    v1 = st["runner"].table.current_version()
    assert n1 > 0
    # restart: footer-pruned seek skips fully-committed batch dirs;
    # nothing new -> no snapshot commits
    st2 = run_tql_stream(spark, f"from log://{changes} | import {root}")
    assert st2["runner"].table.current_version() == v1
    assert st2["runner"].table.read(spark).count() == n1


def test_tql_stream_near_dedup_batch_auto(spark, tmp_path):
    """Continuous dedup-at-ingest: `near-dedup … batch auto` inside a
    streaming pipeline advances the dedup index one partition per
    micro-batch (batch auto = the connector's batch id), so content
    accepted in batch 0 suppresses its re-appearance in batch 1, and a
    forced restart with redelivery stays exactly-once AND re-classifies
    identically (the index probe reads batch < b)."""
    # insert-only content stream: token payloads; d-docs in batch 0
    # (lsn 0-9), e-docs in batch 1 (lsn 10-19); e-docs 0-4 duplicate
    # d-docs 0-4's token content exactly, e-docs 5-9 are fresh
    def tok(i):
        # 14 tokens: >= 2k-1 for k=5, so the doc has >= k distinct
        # windows and is scorable
        return [100 * j + i for j in range(1, 15)]

    recs = [
        {"part_id": i % 2, "lsn": i, "op": "insert", "doc_id": f"d{i}",
         "tokens": tok(i), "n_tok": 14, "source": "s"}
        for i in range(10)
    ] + [
        {"part_id": i % 2, "lsn": 10 + i, "op": "insert",
         "doc_id": f"e{i}", "tokens": tok(i if i < 5 else 50 + i),
         "n_tok": 14, "source": "s"}
        for i in range(10)
    ]
    root = f"{tmp_path}/wh/t"
    idx = f"{tmp_path}/ndi"
    text = (f"from broker://sim | near-dedup tokens by doc_id index {idx} "
            f"batch auto | import {root}")
    broker = SimulatedBrokerConnector(spark, recs, batch_size=10)
    st = run_tql_stream(spark, text, connector=broker)
    assert st["batches"] == 2
    rows = {r["doc_id"] for r in st["runner"].table.read(spark).collect()}
    # batch 0: all 10 d-docs (distinct content); batch 1: only the 5
    # fresh e-docs — the 5 duplicating d-content are dropped pre-apply
    assert rows == {f"d{i}" for i in range(10)} | {
        f"e{i}" for i in range(5, 10)}

    # forced restart, broker redelivers everything: index partitions
    # get overwritten idempotently, the watermark filter absorbs the
    # replay, no new snapshots
    v1 = st["runner"].table.current_version()
    broker2 = SimulatedBrokerConnector(spark, recs, batch_size=10)
    st2 = run_tql_stream(spark, text, connector=broker2)
    assert st2["runner"].table.current_version() == v1
    assert {r["doc_id"]
            for r in st2["runner"].table.read(spark).collect()} == rows

    # `batch auto` outside a streaming context is a targeted error
    from tenzir_spark.plans.pipeline import run_tql
    df = spark.createDataFrame([("a", [1, 2, 3, 4, 5, 6])],
                               "doc_id string, tokens array<int>")
    with pytest.raises(TqlError, match="streaming context"):
        run_tql(df, f"near-dedup tokens by doc_id index {idx} batch auto")


def test_tql_stream_near_dedup_rejects_non_insert_ops(spark, tmp_path):
    """The dedup index is append-only: `near-dedup` on a general binlog
    tail (stream carrying UPDATE ops) fails loud at execution instead of
    silently dropping re-ingested update content; `--allow-updates`
    opts in explicitly."""
    def tok(i):
        return [100 * j + i for j in range(1, 15)]

    recs = [
        {"part_id": 0, "lsn": 0, "op": "insert", "doc_id": "d0",
         "tokens": tok(0), "n_tok": 14, "source": "s"},
        {"part_id": 0, "lsn": 1, "op": "update", "doc_id": "d0",
         "tokens": tok(1), "n_tok": 14, "source": "s"},
    ]
    root = f"{tmp_path}/wh/t"
    idx = f"{tmp_path}/ndi"
    broker = SimulatedBrokerConnector(spark, recs, batch_size=2)
    with pytest.raises(Exception, match="non-insert"):
        run_tql_stream(
            spark,
            f"from broker://sim | near-dedup tokens by doc_id index {idx} "
            f"batch auto | import {root}",
            connector=broker)

    # explicit opt-in: the same stream flows (updates classified like
    # inserts — the documented append-only semantics apply)
    broker2 = SimulatedBrokerConnector(spark, recs, batch_size=2)
    st = run_tql_stream(
        spark,
        f"from broker://sim | near-dedup tokens by doc_id index "
        f"{tmp_path}/ndi2 batch auto --allow-updates | import "
        f"{tmp_path}/wh/t2",
        connector=broker2)
    assert st["batches"] == 1
    rows = {(r["doc_id"], tuple(r["tokens"]))
            for r in st["runner"].table.read(spark).collect()}
    assert rows == {("d0", tuple(tok(1)))}  # LWW kept the update
