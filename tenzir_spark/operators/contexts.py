"""Stateful enrichment contexts — the reference's context lifecycle.

Reference parity: `context create|update|delete|reset|save|load|inspect`
(web/docs/operators/context.md:16-45; plugin interface
libtenzir/include/tenzir/plugin.hpp:660-762). A context is a named,
updatable keyed state shared by enrichments; the reference keeps it
in-memory per node and snapshots it for save/load.

Spark-first: each context is a small LakeTable (ACID snapshots = the
reference's save/load for free, plus time travel); `update` is the same
LWW MERGE the CDC sink uses (lookup_table.cpp keeps one value per key,
last update wins); `apply` is a broadcast join (enrich.py). The table
layer gives durability the reference's in-memory contexts lack.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tenzir_spark.lake.table import BUCKET_COL, COMMIT_COL, DELETED_COL, LakeTable
from tenzir_spark.operators.enrich import enrich


class ContextStore:
    """Named contexts under ``<root>/contexts/<name>``."""

    def __init__(self, spark: SparkSession, root: str, fs=None):
        self.spark = spark
        self.root = os.path.join(root, "contexts")
        self.fs = fs  # lake/fs.py filesystem; None = LocalFS

    def _table(self, name: str) -> LakeTable:
        return LakeTable(self.root, name, fs=self.fs)

    # ------------------------------------------------------------ lifecycle
    def create(self, name: str, df: DataFrame, key: str) -> None:
        """`context create` + initial population."""
        t = self._table(name)
        if t.exists():
            raise ValueError(f"context {name!r} already exists")
        payload = df.schema
        t.create(payload, n_buckets=4, key=key, properties={"key": key})
        t.append(df.dropDuplicates([key]), key_col=key)

    def update(self, name: str, df: DataFrame) -> None:
        """`context update`: upsert entries, last writer wins per key —
        the same delta-commit path as the CDC sink."""
        t = self._table(name)
        key = t.properties()["key"]
        batch = (
            df.dropDuplicates([key])
            .withColumn(DELETED_COL, F.lit(False))
            .withColumn(BUCKET_COL, t.bucket_expr(key))
        )
        t.delta_commit(batch, schema=t.schema(), properties=t.properties())

    def remove(self, name: str, keys: DataFrame) -> None:
        """Targeted entry removal (tombstone delta)."""
        t = self._table(name)
        key = t.properties()["key"]
        schema = t.schema()
        batch = keys.select(
            *[
                F.col(f.name).cast(f.dataType) if f.name in keys.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        ).withColumn(DELETED_COL, F.lit(True)).withColumn(BUCKET_COL, t.bucket_expr(key))
        t.delta_commit(batch, schema=schema, properties=t.properties())

    def reset(self, name: str) -> None:
        """`context reset`: drop all entries, keep the context."""
        t = self._table(name)
        t.commit([], t.schema(), t.properties())

    def delete(self, name: str) -> None:
        """`context delete`."""
        shutil.rmtree(self._table(name).root)

    # ---------------------------------------------------------- inspection
    def list(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if self._table(d).exists()
        )

    def inspect(self, name: str) -> DataFrame:
        """`context inspect`: current entries."""
        return self._table(name).read(self.spark).drop(BUCKET_COL, COMMIT_COL)

    def inspect_at(self, name: str, version: int) -> DataFrame:
        """Time travel (the reference's save/load snapshots, but queryable).
        Goes through ``LakeTable.read`` so snapshots that mix base and
        merge-on-read delta files resolve LWW correctly (the two file
        kinds have different partition layouts — one read each)."""
        return (
            self._table(name)
            .read(self.spark, version=version)
            .drop(BUCKET_COL, COMMIT_COL)
        )

    # -------------------------------------------------------------- apply
    def apply(self, df: DataFrame, name: str, on, filter: bool = False) -> DataFrame:
        """`enrich <name>`: broadcast-join the context onto events."""
        ctx = self.inspect(name)
        key = self._table(name).properties()["key"]
        if isinstance(on, str) and on != key:
            ctx = ctx.withColumnRenamed(key, on)
        return enrich(df, ctx, on=on, filter=filter)

    def lookup_live(self, stream_df: DataFrame, name: str, on: str) -> DataFrame:
        """`lookup <ctx> --live` (lookup.md:23-40): filter the live feed to
        context matches — a stream-static broadcast join; works on both
        batch and readStream DataFrames."""
        return self.apply(stream_df, name, on=on, filter=True)

    def lookup_snapshot(self, table, name: str, on: str,
                        context_version: int | None = None,
                        data_version: int | None = None) -> DataFrame:
        """`lookup <ctx> --retro --snapshot` (web/docs/operators/lookup.md:80-84):
        pin the CONTEXT state at execution time and run the retrospective
        scan with that pinned state — context updates and data imports
        landing after the snapshot was taken do not change the result.
        Both pins default to the versions current when this is called;
        pass explicit versions to replay an earlier lookup bit-for-bit
        (every snapshot manifest and its files are immutable)."""
        t = self._table(name)
        cv = t.current_version() if context_version is None else context_version
        dv = table.current_version() if data_version is None else data_version
        ctx = self.inspect_at(name, cv)
        key = t.snapshot(cv).get("properties", {}).get(
            "key", t.properties()["key"])
        if on != key:
            ctx = ctx.withColumnRenamed(key, on)
        hist = table.read(self.spark, version=dv).drop(BUCKET_COL, COMMIT_COL)
        return enrich(hist, ctx, on=on, filter=True)

    def lookup_retro(self, table, name: str, on: str,
                     since_version: int | None = None) -> DataFrame:
        """`lookup <ctx> --retro`: when the context gains entries, query
        HISTORICAL data for matches. ``since_version`` restricts the scan
        to context entries added after that context version (the
        translate-updates-into-retro-queries behavior); the storage scan
        itself prunes via the lake manifest."""
        ctx = self.inspect(name)
        if since_version is not None:
            old = self.inspect_at(name, since_version)
            key = self._table(name).properties()["key"]
            ctx = ctx.join(old.select(key), on=key, how="left_anti")
        key = self._table(name).properties()["key"]
        if on != key:
            ctx = ctx.withColumnRenamed(key, on)
        hist = table.read(self.spark)
        return enrich(hist, ctx, on=on, filter=True)
