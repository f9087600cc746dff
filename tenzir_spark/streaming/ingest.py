"""Structured Streaming front-end for the CDC engine.

The batch runner consumes an already-materialized change log; this module
tails it as a STREAM: ``readStream`` file source (stand-in for
``readStream.format("kafka")`` — the reference's kafka connector commits
offsets only after the batch is durable, plugins/kafka/src/
configuration.cpp:73-125) → ``foreachBatch`` → the same idempotent
collapse+MERGE body (runner.apply_batch_df).

Exactly-once composition: Spark's streaming checkpoint gives at-least-once
foreachBatch invocation; our per-partition LSN watermarks (committed
atomically in the table snapshot) make every re-invocation idempotent — the
same RFC-002 design ("restart from the last acknowledged position",
rfc/002-fault-tolerance/README.md:116-127) expressed as
checkpoint ⊕ idempotent sink. Killing the query at ANY point and
restarting (same or fresh checkpoint dir) converges to the identical
table state.

The reference's ``every``/scheduled sources (builtins/operators/
every_cron.cpp) map to ``trigger(processingTime=...)``; a one-shot drain
is ``trigger(availableNow=True)``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from tenzir_spark.cdc.runner import (
    BASE_PAYLOAD_SCHEMA,
    CONTROL_COLS,
    IngestRunner,
    accepts_batch_id,
)

CHANGE_CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), True),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
    ]
)


def change_stream_schema(payload_schema: T.StructType = BASE_PAYLOAD_SCHEMA,
                         extra_fields: list[T.StructField] | None = None) -> T.StructType:
    """Envelope schema for the change stream. Streaming file sources need a
    static schema, so mid-stream ADDED columns must be declared up front
    (``extra_fields``); files written before the evolution read as null —
    the same reconcile-on-read the batch path uses."""
    fields = list(CHANGE_CONTROL_SCHEMA.fields) + list(payload_schema.fields)
    for f in extra_fields or []:
        if f.name not in {x.name for x in fields}:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def stream_ingest(
    spark: SparkSession,
    changes_dir: str,
    warehouse: str,
    *,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
    processing_time: str | None = None,
    checkpoint_dir: str | None = None,
    runner_kwargs: dict | None = None,
    transform=None,
):
    """Tail ``changes_dir`` (batch-*/part-*.parquet) as a stream into the
    lake table at ``warehouse``. Returns the started StreamingQuery.

    - ``processing_time=None`` → ``availableNow`` one-shot drain (drain the
      backlog then stop — use ``q.awaitTermination()``).
    - ``max_files_per_trigger`` bounds micro-batch size (the reference's
      batch-size/timeout knobs, defaults.hpp:32,39-41 analog).
    """
    schema = schema or change_stream_schema()
    runner = IngestRunner(spark, warehouse, **(runner_kwargs or {}))
    runner.ensure_table(
        T.StructType([f for f in schema.fields if f.name not in CONTROL_COLS])
    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # binlog contract: segments of one source partition arrive in order —
    # the file source lists oldest-first (latestFirst=false default), which
    # preserves it for a written-in-order log. pathGlobFilter skips the
    # generator's manifest.json.
    stream = (
        reader.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(changes_dir)
    )

    # a transform accepting (df, batch_id) gets the epoch id — stateful
    # stages (the dedup indexes' `batch auto`) need it; epoch replay
    # after a checkpoint recovery reuses the SAME id, so those stages'
    # overwrite-own-partition discipline stays idempotent
    _two_arg = transform is not None and accepts_batch_id(transform)

    def _apply(df, epoch_id: int) -> None:
        # transform: operator stages between source and sink (the TQL
        # text path compiles `where|set|…` into this hook); runs inside
        # foreachBatch so each micro-batch is transformed then MERGEd
        if transform is None:
            body = df
        elif _two_arg:
            body = transform(df, int(epoch_id))
        else:
            body = transform(df)
        runner.apply_batch_df(body, int(epoch_id))

    writer = stream.writeStream.foreachBatch(_apply).outputMode("update")
    writer = writer.option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(warehouse, "_stream_checkpoint"),
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q._tenzir_runner = runner  # expose for inspection/tests
    return q
