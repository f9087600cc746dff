"""Custom STATEFUL streaming operators via applyInPandasWithState.

The reference's ordered-stream operators keep per-key state inside the
pipeline executor (``deduplicate`` holds a hashmap of seen keys with
``--distance``/``--timeout`` expiry, deduplicate.cpp:268-309; contexts
update live state). Structured Streaming's re-statement is a keyed
GroupState: Spark shuffles each micro-batch by key, hands every key
group plus its persisted state to an Arrow-batched pandas function, and
checkpoints the state store — restart-safe for free.

Two operators:

- ``stream_deduplicate``: emit at most ``limit`` events per key within a
  state lifetime; state expires after ``timeout_ms`` of processing-time
  silence (the reference's ``--timeout``), after which the key emits
  again. Per-key counters live in GroupState, not in Python globals.
- ``stream_rollup``: event-time windowed summarize with a lateness
  watermark — the built-in path (window + watermark), shown here because
  it needs NO custom state and is what `summarize resolution=...`
  compiles to on a stream; late events beyond the watermark are dropped
  by Spark itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_deduplicate(
    events: DataFrame,
    keys: list[str],
    payload_cols: list[str],
    limit: int = 1,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Keyed stream suppression with optional processing-time expiry.

    ``events`` must be a STREAMING DataFrame. Output schema = keys +
    payload_cols. Within one micro-batch the group's rows arrive in
    delivery order; across batches the per-key counter persists in the
    checkpointed state store."""

    def _mk(events_schema):
        fields = []
        for name in keys + payload_cols:
            fields.append(events_schema[name])
        return T.StructType(fields)

    out_schema = _mk(events.schema)
    state_schema = T.StructType([T.StructField("n", T.LongType(), True)])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (n,) = state.get if state.exists else (0,)
        budget = max(limit - n, 0)
        emitted = 0
        for pdf in pdfs:
            if budget > 0:
                take = pdf.iloc[:budget][keys + payload_cols]
                budget -= len(take)
                emitted += len(take)
                if len(take):
                    yield take
        state.update((n + emitted,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def stream_rollup(
    events: DataFrame,
    time_col: str,
    resolution: str = "1 hour",
    watermark: str = "10 minutes",
    aggs: dict | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Streaming `summarize resolution=<r>`: event-time windows with a
    lateness watermark. Events later than ``watermark`` past the max seen
    event time are dropped by the engine (reference analog: ordered
    streams simply close a window when time passes; with out-of-order
    sources the watermark IS that close signal)."""
    aggs = aggs or {"n": F.count("*")}
    w = events.withWatermark(time_col, watermark)
    grouped = w.groupBy(
        F.window(F.col(time_col), resolution).alias("w"), *(by or [])
    )
    out = grouped.agg(*[v.alias(k) for k, v in aggs.items()])
    return out.select(
        F.col("w.start").alias("bucket"), *(by or []),
        *[k for k in aggs],
    )


def stream_session_rollup(
    events: DataFrame,
    time_col: str,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    aggs: dict | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Streaming ``summarize … timeout <t>`` (summarize.md:72-80): a
    group's lifetime is bounded by inactivity — after ``gap`` of
    event-time silence for a key, its aggregate is finalized and a new
    event for the same key opens a FRESH group. That is exactly Spark's
    ``session_window(col, gap)``: windows extend while events keep
    arriving within ``gap`` and close (subject to the lateness
    ``watermark``) when the silence exceeds it. The reference implements
    this with per-group deadline bookkeeping in its streaming hash
    aggregation (summarize.cpp:357-475); here the engine's native
    session windows carry the state in the checkpoint."""
    aggs = aggs or {"n": F.count("*")}
    w = events.withWatermark(time_col, watermark)
    grouped = w.groupBy(
        F.session_window(F.col(time_col), gap).alias("w"), *(by or [])
    )
    out = grouped.agg(*[v.alias(k) for k, v in aggs.items()])
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *(by or []),
        *[k for k in aggs],
    )
