"""Custom stateful streaming operators (applyInPandasWithState) and the
watermarked windowed rollup."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F


def _write_batch(spark, d, idx, rows, schema):
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(d, f"b{idx:03d}.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path + ".dir")
    # single file per batch, increasing mtime => deterministic order
    import glob
    import shutil

    src = glob.glob(path + ".dir/part-*.parquet")[0]
    shutil.copy(src, path)
    shutil.rmtree(path + ".dir")
    t = 1_700_000_000 + idx * 10
    os.utime(path, (t, t))


def test_stream_deduplicate_limit_across_batches(spark, tmp_path):
    """At most `limit` events per key across the whole stream; the per-key
    counter survives micro-batch boundaries via GroupState."""
    from tenzir_spark.streaming.stateful import stream_deduplicate

    d = str(tmp_path / "src")
    os.makedirs(d)
    schema = "k string, seq long, v string"
    _write_batch(spark, d, 0, [("a", 1, "a1"), ("a", 2, "a2"), ("a", 3, "a3"),
                               ("b", 4, "b1")], schema)
    _write_batch(spark, d, 1, [("a", 5, "a4"), ("b", 6, "b2"), ("b", 7, "b3"),
                               ("c", 8, "c1")], schema)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_deduplicate(stream, keys=["k"], payload_cols=["seq", "v"], limit=2)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["k"], r["v"]) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # a: first two of batch 0 only (limit reached before batch 1);
    # b: one from each batch; c: its single event
    assert got == {("a", "a1"), ("a", "a2"), ("b", "b1"), ("b", "b2"), ("c", "c1")}


def test_stream_deduplicate_timeout_rearms_key(spark, tmp_path):
    """The reference's `deduplicate --timeout`: after `timeout_ms` of
    silence the key's state expires (fired by a no-data micro-batch) and
    the key emits again."""
    from tenzir_spark.streaming.stateful import stream_deduplicate

    d = str(tmp_path / "src")
    os.makedirs(d)
    schema = "k string, seq long, v string"
    _write_batch(spark, d, 0, [("a", 1, "a1"), ("a", 2, "a2")], schema)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_deduplicate(stream, keys=["k"], payload_cols=["seq", "v"],
                             limit=1, timeout_ms=2000)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_ttl")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if spark.sql("SELECT * FROM dedup_ttl").count() >= 1:
                break
            time.sleep(0.5)
        assert {r["v"] for r in spark.sql("SELECT * FROM dedup_ttl").collect()} == {"a1"}
        time.sleep(6)  # > timeout: state for 'a' expires via no-data batches
        _write_batch(spark, d, 1, [("a", 3, "a3")], schema)
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            vals = {r["v"] for r in spark.sql("SELECT * FROM dedup_ttl").collect()}
            if "a3" in vals:
                break
            time.sleep(0.5)
        assert vals == {"a1", "a3"}, "expired key must emit again"
    finally:
        q.stop()


def test_stream_rollup_watermark_drops_late_events(spark, tmp_path):
    """Windowed streaming summarize: a closed window emits exactly once
    with the right aggregate, and an event far behind the watermark
    arriving in a LATER micro-batch is dropped (never opens its window)."""
    from tenzir_spark.streaming.stateful import stream_rollup

    d = str(tmp_path / "src")
    os.makedirs(d)
    schema = "ts timestamp, v double"
    from datetime import datetime

    def ts(s_):
        return datetime.fromisoformat("2024-01-01 " + s_)

    _write_batch(spark, d, 0, [(ts("10:00:10"), 1.0), (ts("10:00:50"), 2.0),
                               (ts("10:02:30"), 3.0)], schema)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_rollup(stream, "ts", resolution="1 minute", watermark="1 minute",
                        aggs={"n": F.count("*"), "sum_v": F.sum("v")})
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def buckets():
            return {str(r["bucket"]): (r["n"], r["sum_v"])
                    for r in spark.sql("SELECT * FROM rollup_out").collect()}

        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            if "2024-01-01 10:00:00" in buckets():
                break
            time.sleep(0.5)
        assert buckets().get("2024-01-01 10:00:00") == (2, 3.0)

        # a VERY late event (08:00, far beyond the 1-minute watermark now
        # at 10:01:30) arriving in a later micro-batch must be dropped
        _write_batch(spark, d, 1, [(ts("08:00:00"), 100.0)], schema)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            p = q.lastProgress
            if p and p.get("numInputRows", 0) >= 0 and len(q.recentProgress) > 4:
                pass
            time.sleep(1)
            if any(prog.get("numInputRows", 0) > 0 for prog in q.recentProgress[-4:]):
                break
        time.sleep(3)
        assert not any(b.startswith("2024-01-01 08:") for b in buckets()), (
            "late-beyond-watermark event must not open a window")
    finally:
        q.stop()


def test_stream_session_rollup_gap_closes_group(spark, tmp_path):
    """`summarize … timeout <t>` streaming analogue: a key's group
    closes after `gap` of event-time silence; a later event for the
    SAME key opens a fresh session instead of extending the old one."""
    from datetime import datetime

    from tenzir_spark.streaming.stateful import stream_session_rollup

    d = str(tmp_path / "src")
    os.makedirs(d)
    schema = "ts timestamp, k string, v double"

    def ts(s_):
        return datetime.fromisoformat("2024-01-01 " + s_)

    # session 1 for key a: 10:00:00 + 10:00:30 (within 1-minute gap);
    # then silence > gap; session 2 for key a: 10:05:00.
    _write_batch(spark, d, 0, [(ts("10:00:00"), "a", 1.0),
                               (ts("10:00:30"), "a", 2.0),
                               (ts("10:05:00"), "a", 4.0)], schema)
    # advance watermark far past both sessions so they finalize
    _write_batch(spark, d, 1, [(ts("10:30:00"), "z", 0.0)], schema)
    _write_batch(spark, d, 2, [(ts("10:40:00"), "z", 0.0)], schema)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_session_rollup(
        stream, "ts", gap="1 minute", watermark="1 minute",
        aggs={"n": F.count("*"), "sum_v": F.sum("v")}, by=["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("session_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def sessions():
            return sorted(
                (str(r["session_start"]), r["k"], r["n"], r["sum_v"])
                for r in spark.sql(
                    "SELECT * FROM session_out WHERE k = 'a'").collect())

        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if len(sessions()) >= 2:
                break
            time.sleep(1)
        got = sessions()
        assert got == [
            ("2024-01-01 10:00:00", "a", 2, 3.0),
            ("2024-01-01 10:05:00", "a", 1, 4.0),
        ]
    finally:
        q.stop()
