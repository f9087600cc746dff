"""MERGE INTO emulation: bucket-granular copy-on-write upsert/delete.

Equivalent of ``MERGE INTO target USING batch ON target.key = batch.key
WHEN MATCHED AND batch.op='delete' THEN DELETE
WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
(full-row-image CDC semantics — the reference's ``import`` persists whole
events, libtenzir/builtins/operators/import.cpp:23-80; LWW collapse upstream
guarantees one row per key per batch).

Scale reasoning (the part that must survive 100 TB / 1000 executors):
- Only buckets containing touched keys are read and rewritten; untouched
  data files carry over into the new snapshot as pure metadata.  With
  n_buckets sized so a bucket ~ a few GB, a batch touching K distinct
  buckets costs O(K × bucket_size) I/O regardless of total table size.
- The anti-join runs per-bucket: both sides are pre-filtered to the same
  touched buckets, and when the batch key set is small we broadcast it, so
  the big (target) side never shuffles.
- Key skew cannot concentrate here: keys are unique on both sides after
  LWW collapse, and bucket spreading is a uniform hash.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.lake.table import BUCKET_COL, LakeTable

# Below this many distinct keys in the batch, hint a broadcast of the key set
# for the anti-join (typical micro-batches). Above it, fall back to a shuffle
# join — AQE's skew-join splitting handles stragglers.
BROADCAST_KEY_LIMIT = 2_000_000


def merge_batch(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    *,
    key: str = "doc_id",
    op_col: str = "op",
    delete_value: str = "delete",
    new_properties: dict | None = None,
    evolved_schema: T.StructType | None = None,
    batch_rows: int | None = None,
) -> dict:
    """Apply a collapsed batch (exactly one row per key, carrying
    ``op_col``) to ``table``; commits a new snapshot atomically.

    ``evolved_schema`` (payload schema) lets the caller add columns in the
    same commit (schema evolution); old files read back with nulls.
    Returns stats {version, touched_buckets, upserts, deletes, merge_sec}.
    """
    t0 = time.monotonic()
    snap = table.snapshot()
    payload_schema = evolved_schema or T.StructType.fromJson(snap["schema"])
    payload_cols = [f.name for f in payload_schema.fields]

    batch = batch.withColumn(BUCKET_COL, table.bucket_expr(key))
    # Align batch to the (possibly evolved) payload schema: missing -> null.
    aligned_cols = [
        F.col(c).cast(payload_schema[c].dataType).alias(c) if c in batch.columns
        else F.lit(None).cast(payload_schema[c].dataType).alias(c)
        for c in payload_cols
    ]
    batch = batch.select(*aligned_cols, F.col(op_col), F.col(BUCKET_COL))
    # cache ONLY the slim (key, op, bucket) projection for the three stats
    # actions below — never the wide token-array payload (caching wide
    # array columns thrashes GC under task concurrency; the payload flows
    # scan→write exactly once, in the write_commit_files action)
    slim = batch.select(key, op_col, BUCKET_COL).cache()

    touched = sorted(r[0] for r in slim.select(BUCKET_COL).distinct().collect())
    touched_set = set(touched)
    hot_files = [e for e in snap["files"] if e["bucket"] in touched_set]
    cold_files = [e for e in snap["files"] if e["bucket"] not in touched_set]

    target_hot = table.read_files(spark, hot_files, payload_schema).select(
        *payload_cols, BUCKET_COL
    )

    keys = slim.select(key)
    n_keys = batch_rows if batch_rows is not None else slim.count()
    if n_keys <= BROADCAST_KEY_LIMIT:
        keys = F.broadcast(keys)
    survivors = target_hot.join(keys, on=key, how="left_anti")

    upserts = batch.filter(F.col(op_col) != delete_value).select(*payload_cols, BUCKET_COL)
    new_hot = survivors.unionByName(upserts)

    cid = table._alloc_commit_id()
    new_files = table.write_commit_files(new_hot, cid)

    props = dict(snap.get("properties", {}))
    props.update(new_properties or {})
    version = table.commit(cold_files + new_files, payload_schema, props)

    n_deletes = slim.filter(F.col(op_col) == delete_value).count()
    slim.unpersist()
    return {
        "version": version,
        "touched_buckets": len(touched),
        "upserts": n_keys - n_deletes,
        "deletes": n_deletes,
        "merge_sec": time.monotonic() - t0,
    }
