"""publish / subscribe — multi-pipeline confluence over lake topics.

Reference: ``publish <topic>`` / ``subscribe <topic>`` connect pipelines
through named in-process streams (web/docs/operators/publish.md — docs-
only in the OSS tree). The durable Spark re-statement: a topic is an
append-only parquet log under ``<warehouse>/_topics/<name>`` with
monotonically increasing segment files; publishers append segments
atomically, subscribers either read the whole topic (batch), tail it
with Structured Streaming (live), or poll incrementally from a
remembered segment position (the reference's in-memory fanout becomes a
durable, replayable fanout — strictly stronger).

Many publishers / many subscribers compose: appends are new files with
unique names (no coordination), and the file-source ordering contract
(mtime/name) gives each subscriber the same prefix order.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _topic_dir(warehouse: str, topic: str) -> str:
    return os.path.join(warehouse, "_topics", topic)


def publish(df: DataFrame, topic: str, warehouse: str) -> str:
    """Append the DataFrame as one new immutable segment of the topic;
    returns the segment directory. Atomic for readers: parquet files are
    written to a staging dir then renamed in."""
    d = _topic_dir(warehouse, topic)
    os.makedirs(d, exist_ok=True)
    seg = f"seg-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}"
    stage = os.path.join(d, f".stage-{seg}")
    df.write.mode("overwrite").parquet(stage)
    final = os.path.join(d, seg)
    os.replace(stage, final)
    return final


def topic_segments(warehouse: str, topic: str) -> list[str]:
    d = _topic_dir(warehouse, topic)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, s) for s in os.listdir(d) if s.startswith("seg-")
    )


def subscribe(spark: SparkSession, topic: str, warehouse: str,
              from_segment: str | None = None) -> DataFrame:
    """Batch read of the topic — everything published so far, or only the
    segments strictly after ``from_segment`` (incremental poll; pair with
    ``topic_segments()[-1]`` to remember the position)."""
    segs = topic_segments(warehouse, topic)
    if from_segment is not None:
        segs = [s for s in segs if os.path.basename(s) > os.path.basename(from_segment)]
    if not segs:
        raise ValueError(f"topic {topic!r} has no (new) segments")
    return spark.read.parquet(*segs)


def subscribe_stream(spark: SparkSession, topic: str, warehouse: str, schema):
    """Live tail (``subscribe`` in a running pipeline): a Structured
    Streaming file source over the topic directory; combine with
    ``foreachBatch`` or any streaming sink downstream."""
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(_topic_dir(warehouse, topic))
    )
