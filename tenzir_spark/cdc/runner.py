"""The CDC micro-batch driver loop: binlog tail → LWW collapse → MERGE.

This is the engine the north rule asks for. Each micro-batch:

1. **Idempotence filter** — drop events at-or-below the per-source-partition
   LSN watermark committed in the *table's own* snapshot properties. Replay
   of an already-applied batch is a no-op; partial replay applies only the
   unseen suffix. This is the Spark/Iceberg re-statement of the reference's
   exactly-once design ("restart from the last acknowledged position in the
   stream", rfc/002-fault-tolerance/README.md:116-127; Kafka offsets
   committed only after the partition is durable, :253-268).
2. **Schema reconciliation** — new payload columns in the batch (or a
   scripted ``schema_change`` control event) widen the table schema in the
   same atomic commit (reference: cast/schema-upgrade machinery,
   libtenzir/include/tenzir/cast.hpp:28-56,
   libtenzir/include/tenzir/series_builder.hpp:41-67).
3. **LWW collapse** — one surviving row per doc_id (collapse.py).
4. **MERGE** — bucket-granular copy-on-write upsert (lake/merge.py), with
   the new watermarks + last_batch_id committed in the SAME snapshot, so
   data and progress are atomic (crash ⇒ replay is idempotent).
5. **Metrics** — per (batch, source-partition) lineage/throughput rows
   appended to an ``ingest_metrics`` table (reference analog: per-operator
   metrics, libtenzir/include/tenzir/pipeline.hpp:163-221).
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.cdc.collapse import collapse_lww
from tenzir_spark.lake.table import (
    BUCKET_COL,
    COMMIT_COL,
    DELETED_COL,
    LSN_COL,
    NEV_COL,
    PART_COL,
    LakeTable,
)

CONTROL_COLS = ("lsn", "epoch", "part_id", "op")


def accepts_batch_id(transform) -> bool:
    """True when a micro-batch ``transform`` accepts ``(df, batch_id)``:
    stateful stages (the dedup indexes' ``batch auto``) need the id; a
    plain ``(df)`` transform keeps working. Counts POSITIONAL slots only
    — a ``(df, **kw)`` or ``(df, *, opt)`` transform takes ONE
    positional arg; ``*args`` accepts any. Single owner for both
    streaming front-ends (stream_ingest and run_connector)."""
    import inspect

    ps = inspect.signature(transform).parameters.values()
    return (
        any(p.kind == p.VAR_POSITIONAL for p in ps)
        or sum(p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
               for p in ps) >= 2)

BASE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Above this many known source partitions, winners mode stops attaching
# the per-partition observed-metrics watermark (EXACT_WM; one conditional
# max expression per partition — the expression list itself would dominate
# at 10^4 partitions) and pays one slim column-pruned agg job per batch
# instead (still exact for any routing; never the keyed assumption).
EXACT_WM_MAX_PARTS = 256

# Per-mode metric semantics (stats_mode):
# - "full":    events_in = DELIVERED events incl. stale redeliveries;
#              events_deduped = delivered - distinct fresh LSNs (redelivery
#              + duplicate-LSN noise).
# - "winners": metrics come from the delta-file side channel. When the
#              caller supplies per-partition delivered counts (apply_batch
#              recovers them from the input parquet footers), events_in =
#              delivered and events_deduped = delivered - applied
#              (redelivery + LWW-collapse dupes). Without them (an
#              in-memory streaming batch), events_in degrades to FRESH
#              events only and events_deduped to fresh - applied (collapse
#              dupes only) — documented fallback, not an error.
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("events_in", T.LongType(), False),
        T.StructField("events_applied", T.LongType(), False),
        T.StructField("events_deduped", T.LongType(), False),
        T.StructField("watermark_lsn", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)


# numeric-widening lattice (reference: recursive cast machinery with
# numeric promotion, libtenzir/include/tenzir/cast.hpp:28-56)
_INT_RANK = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}
_FRAC_RANK = {T.FloatType: 1, T.DoubleType: 2}


def widen_type(table_t: T.DataType, batch_t: T.DataType) -> T.DataType:
    """The type the TABLE column must take so existing data AND the batch
    both fit without loss: equal types pass through, numeric types widen
    along byte<short<int<long and float<double (arrays recurse on the
    element type), and an integer/fractional mix widens to double. A batch
    NARROWER than the table is fine — the batch upcasts on apply; the
    table never narrows. Anything else (string vs int, struct shape
    changes, ...) raises — silent coercion is the one latent corruption
    this guards against."""
    if table_t == batch_t:
        return table_t
    if isinstance(table_t, T.ArrayType) and isinstance(batch_t, T.ArrayType):
        elem = widen_type(table_t.elementType, batch_t.elementType)
        return T.ArrayType(elem, table_t.containsNull or batch_t.containsNull)
    ti, bi = _INT_RANK.get(type(table_t)), _INT_RANK.get(type(batch_t))
    tf, bf = _FRAC_RANK.get(type(table_t)), _FRAC_RANK.get(type(batch_t))
    if ti and bi:
        return table_t if ti >= bi else batch_t
    if tf and bf:
        return table_t if tf >= bf else batch_t
    if (ti and bf) or (tf and bi):
        # int/float mix: double holds every int32/float exactly; int64
        # values past 2^53 round — same promotion the reference's cast
        # lattice makes, accepted as widening
        return T.DoubleType()
    raise TypeError(
        f"incompatible schema change: table {table_t.simpleString()} vs "
        f"batch {batch_t.simpleString()} (only numeric widening evolves)"
    )


class IngestRunner:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        table_name: str = "corpus",
        n_buckets: int = 32,
        salt_buckets: int = 0,
        key: str = "doc_id",
        compact_min_rows: int = 2_000_000,
        compact_ratio: float = 0.5,
        compact_max_commits: int = 64,
        async_compact: bool = False,
        collapse_mode: str = "maxby",
        stats_mode: str = "full",
        delta_codec: str = "zstd",
        exact_watermarks: bool = False,
        retain_snapshots: int | None = None,
        sorted_compaction: bool = False,
        dlq: bool = False,
        writer_lease: bool = False,
        fs=None,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.table_name = table_name
        # ``fs`` (lake/fs.py) makes the WHOLE warehouse portable: table
        # manifests, metrics and DLQ driver-side IO all route through it
        self.table = LakeTable(warehouse, table_name,
                               delta_codec=delta_codec, fs=fs)
        self.fs = self.table.fs
        self.metrics_dir = os.path.join(warehouse, "ingest_metrics")
        self.n_buckets = n_buckets
        self.salt_buckets = salt_buckets
        self.key = key
        # merge-on-read compaction policy: fold deltas into the base once
        # they exceed max(compact_min_rows, compact_ratio × base rows) or
        # the manifest accumulates too many delta commits.
        self.compact_min_rows = compact_min_rows
        self.compact_ratio = compact_ratio
        self.compact_max_commits = compact_max_commits
        # async_compact overlaps the fold with subsequent batches (the lake
        # layer's commit rebase makes this safe); ingest wall time then
        # excludes the compaction spikes. Off by default for deterministic
        # snapshot counts in tests.
        self.async_compact = async_compact
        self._compact_thread = None
        # snapshot retention: after each completed fold, expire manifests
        # beyond the newest N and GC the files only they referenced
        # (LakeTable.expire_snapshots). None = retain everything (full
        # time travel). The expire runs strictly AFTER a fold completes —
        # never concurrently (the lake layer refuses mid-fold anyway).
        self.retain_snapshots = retain_snapshots
        # opt-in key-sorted folds (row-group-pruned point lookups; ~25%
        # extra fold time — see LakeTable.compact)
        self.sorted_compaction = sorted_compaction
        # opt-in dead-letter quarantine for fresh null-key events (see
        # apply_batch_df). TWO counters per batch: _last_dlq_count is rows
        # NEWLY quarantined (post (part_id, lsn)-dedupe — 0 on a redelivery
        # whose dead letters were already captured), _last_dlq_in_batch is
        # malformed rows CARRIED by the batch regardless of dedupe; both
        # surface in the stats dict (dlq_rejected / dlq_in_batch)
        self.dlq = dlq
        self._last_dlq_count = 0
        self._last_dlq_in_batch = 0
        # fold per-batch metric files into one once this many accumulate
        # (_rollup_metrics); observability must not cost O(batches) files
        self.metrics_rollup_files = 512
        # cross-process single-writer guard (LakeTable.acquire_writer_lease),
        # taken at ensure_table. Off by default so sequential runners over
        # one warehouse in a long-lived process (tests, notebooks) don't
        # need explicit releases; the one-shot CLI turns it ON.
        self.writer_lease = writer_lease
        # "maxby" (algebraic partial-agg; default) or "semijoin" (payload
        # never shuffles; needs file-backed input for _metadata row ids and
        # a broadcastable winner set — see collapse.py for the trade-off)
        self.collapse_mode = collapse_mode
        # "full": a column-pruned stats job over the raw batch runs in a
        # side thread (events_in counts stale deliveries too; watermarks
        # are exact for ANY event→partition assignment).
        # "winners": ONE Spark job per batch — the collapse carries each
        # winner's lsn and collapsed-event count into the delta files, and
        # watermarks/lineage/dedup metrics come from a driver-side pyarrow
        # read of those three int columns. Watermarks derive from winner
        # lsns, exact only under keyed routing (all events of a key in
        # one source partition — the kafka/keyed-topic contract the
        # changegen implements): the max-lsn event of partition P then
        # wins its own key, so max(winner lsn|part=P) == max(lsn|part=P).
        # If keys straddle partitions that equality can fail low and a
        # replay could re-apply a stale straddling event. For such
        # sources either use "full" (the overlapped side scan is exact
        # for any routing; ~15% on a loaded box) or set
        # exact_watermarks=True: a per-known-partition max(lsn) then
        # rides the SAME job as observed metrics (CollectMetrics —
        # map-side accumulator, no extra job; unknown partitions fall
        # back to one slim agg for that batch). One-job semantics for any
        # routing, but the CollectMetrics barrier splits the scan's
        # whole-stage-codegen span and re-materializes the wide token
        # rows — measured 20-35% steady-throughput cost on the sf0.1
        # bench, which is why it is OFF by default and "full" is the
        # recommended non-keyed mode.
        # "winners" falls back to "full" under collapse_mode="semijoin"
        # (the semi join keeps no count column).
        self.stats_mode = stats_mode
        self.exact_watermarks = exact_watermarks

    # ------------------------------------------------------------- helpers
    def ensure_table(self, payload_schema: T.StructType = BASE_PAYLOAD_SCHEMA) -> None:
        if self.writer_lease:
            self.table.acquire_writer_lease()
        if not self.table.exists():
            self.table.create(payload_schema, n_buckets=self.n_buckets, key=self.key,
                              properties={"watermarks": {}, "last_batch_id": -1})

    def _lineage_from_commit(self, cid: int) -> dict[int, int]:
        """Per-source-partition applied counts, read from the delta files'
        ``_part`` lineage column via pyarrow (driver-local, no Spark job).
        Matches on the data-commit id delta_commit reports — NOT the
        snapshot version: the two counters diverge permanently after any
        aborted commit (noop-abort redelivery, empty compaction)."""
        import numpy as np
        import pyarrow.parquet as pq

        counts: dict[int, int] = {}
        for e in self.table.snapshot()["files"]:
            if e.get("kind") == "delta" and e["commit"] == cid:
                col = pq.read_table(
                    os.path.join(self.table.root, e["path"]), columns=[PART_COL]
                )[PART_COL].to_numpy(zero_copy_only=False)
                for p, c in zip(*np.unique(col[col != None], return_counts=True)):  # noqa: E711
                    counts[int(p)] = counts.get(int(p), 0) + int(c)
        return counts

    def _maybe_compact(self) -> None:
        p = self.table.delta_pressure()
        if not p["delta_commits"]:
            return
        threshold = max(self.compact_min_rows,
                        int(self.compact_ratio * p.get("base_rows", 0)))
        if p["delta_rows"] >= threshold or p["delta_commits"] >= self.compact_max_commits:
            if not self.async_compact:
                self.table.compact(self.spark, sort_by_key=self.sorted_compaction)
                self._maybe_expire()
                return
            if self._compact_thread is not None and self._compact_thread.is_alive():
                return  # one background fold at a time; debt retried next batch
            import threading

            def _fold():
                try:
                    self.table.compact(self.spark, sort_by_key=self.sorted_compaction)
                    self._maybe_expire()
                except Exception as e:  # noqa: BLE001 - surfaced at join
                    self._compact_error = e

            self._compact_error = None
            self._compact_thread = threading.Thread(target=_fold, daemon=True)
            self._compact_thread.start()

    def _quarantine(self, rejected: DataFrame, batch_id) -> None:
        """Write a batch's dead letters REPLAY-SAFELY: the rejected rows
        land in a temp attempt dir first; only a non-empty attempt's
        files move into ``<table>_dlq/batch=<id>/`` (uuid-prefixed, so an
        earlier attempt's files are preserved, never overwritten). A
        replay of an already-applied batch produces an EMPTY rejected set
        (everything is below the watermark) — it must not destroy the
        quarantine the original attempt wrote; dead letters survive until
        the operator deletes them.

        Rejected events can be REDELIVERED fresh (winners-mode watermarks
        track winner LSNs only, and a crash before the snapshot commit
        replays the batch in any mode), so new rows dedupe against the
        batch's existing quarantine by (part_id, lsn) — each dead letter
        is kept exactly once no matter how many delivery attempts carry
        it."""
        import uuid as _uuid

        import pyarrow as pa2

        dlq_dir = os.path.join(self.warehouse, f"{self.table_name}_dlq",
                               f"batch={batch_id}")
        tmp_dir = os.path.join(self.warehouse, f"{self.table_name}_dlq",
                               f".attempt-{_uuid.uuid4().hex}")
        rejected.write.mode("overwrite").parquet(self.fs.spark_path(tmp_dir))
        seen = set()
        if self.fs.isdir(dlq_dir):
            for fn in self.fs.listdir(dlq_dir):
                if fn.endswith(".parquet"):
                    t = self.fs.parquet_read(os.path.join(dlq_dir, fn),
                                             columns=["part_id", "lsn"])
                    seen.update(zip(t["part_id"].to_pylist(),
                                    t["lsn"].to_pylist()))
        n_rej = 0
        n_in_batch = 0
        tag = _uuid.uuid4().hex[:8]
        for fn in sorted(self.fs.listdir(tmp_dir)):
            if not fn.endswith(".parquet"):
                continue
            t = self.fs.parquet_read(os.path.join(tmp_dir, fn))
            if t.num_rows == 0:
                continue
            n_in_batch += t.num_rows
            if seen:
                keep = [i for i, pl in enumerate(
                    zip(t["part_id"].to_pylist(), t["lsn"].to_pylist()))
                    if pl not in seen]
                if not keep:
                    continue
                t = t.take(pa2.array(keep, type=pa2.int64()))
            self.fs.makedirs(dlq_dir)
            out = os.path.join(dlq_dir, f"{tag}-{fn}")
            self.fs.parquet_write(t, out + ".inprogress")
            self.fs.rename(out + ".inprogress", out)
            n_rej += t.num_rows
        self.fs.rmtree(tmp_dir)
        if n_rej == 0:
            self.fs.rmdir_if_empty(os.path.dirname(dlq_dir))
        self._last_dlq_count = n_rej
        self._last_dlq_in_batch = n_in_batch

    def _maybe_expire(self) -> None:
        """Retention GC after a completed fold: a fold is the moment old
        delta files fall out of HEAD's manifest, so it is the moment
        expiry actually frees space. No-op when retention is unset."""
        if self.retain_snapshots is not None:
            self.table.expire_snapshots(keep_last=self.retain_snapshots)

    def finish_compaction(self) -> None:
        """Wait for any background fold to complete (call at end of run).
        A failed fold is not a data error (deltas stay; resolution still
        correct) but is surfaced so the operator sees the debt."""
        if self._compact_thread is not None:
            self._compact_thread.join()
            self._compact_thread = None
            if getattr(self, "_compact_error", None) is not None:
                import warnings

                warnings.warn(f"background compaction failed: {self._compact_error!r}")

    def watermarks(self) -> dict[str, int]:
        return dict(self.table.properties().get("watermarks", {}))

    def final_state(self) -> DataFrame:
        return self.table.read(self.spark).drop(BUCKET_COL, COMMIT_COL)

    # ------------------------------------------------------------ the loop
    def apply_batch(self, path: str, batch_id: int) -> dict:
        # derive the batch schema from one parquet footer driver-side —
        # saves the per-batch schema-inference listing job (the files of
        # one batch are written together and share a schema; evolution
        # shows up in the footer just the same)
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = (
            [path] if path.endswith(".parquet")
            else sorted(_glob.glob(os.path.join(path, "*.parquet")))
        )
        reader = self.spark.read
        if files:
            schema = from_arrow_schema(pq.read_schema(files[0]))
            reader = reader.schema(schema)
        delivered = None
        if self.stats_mode == "winners":
            # winners mode only sees fresh/winner events; recover the exact
            # per-partition DELIVERED counts (incl. stale redeliveries)
            # from the input parquet footers — driver-side metadata, no
            # job. Attribution needs per-row-group part_id min==max (true
            # for per-partition files, the keyed-routing layout); a mixed
            # row group voids the recovery and metrics degrade to the
            # documented fresh-only fallback.
            delivered = {}
            for f in files:
                md = pq.read_metadata(f)
                pi = md.schema.names.index("part_id") if "part_id" in md.schema.names else None
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    st_ = g.column(pi).statistics if pi is not None else None
                    if st_ is None or not st_.has_min_max or int(st_.min) != int(st_.max):
                        delivered = None
                        break
                    p = int(st_.min)
                    delivered[p] = delivered.get(p, 0) + g.num_rows
                if delivered is None:
                    break
        st = self.apply_batch_df(reader.parquet(path), batch_id,
                                 delivered_by_part=delivered)
        if self.stats_mode == "winners" and files:
            st["events_in"] = sum(pq.read_metadata(f).num_rows for f in files)
        return st

    def apply_batch_df(self, raw: DataFrame, batch_id: int,
                       delivered_by_part: dict[int, int] | None = None) -> dict:
        """Micro-batch body — also the ``foreachBatch`` target of the
        Structured Streaming front-end (streaming/ingest.py). All durable
        state lives in the table snapshot, so the SAME idempotence guard
        covers batch replay, streaming-checkpoint replay, and redelivery.

        ``delivered_by_part``: optional per-source-partition delivered
        counts (incl. stale redeliveries), used only by winners stats mode
        to report full-mode-comparable events_in (see METRICS_SCHEMA)."""
        t0 = time.monotonic()
        wm = self.watermarks()
        use_winners = self.stats_mode == "winners" and self.collapse_mode != "semijoin"

        # -- idempotence: only events strictly above the committed
        # watermark. The watermark table rides a BROADCAST join, not a
        # literal map: literals embed the values in the generated code, so
        # every batch would compile a fresh codegen unit (measured
        # ~0.3-0.5 s/batch) and at 10^4+ source partitions the generated
        # source itself blows up — the join keeps the plan STABLE across
        # batches (codegen cache hit) and the data out of the code.
        if self.collapse_mode == "semijoin":
            # the semijoin collapse needs the file-source _metadata
            # pseudo-column, which does not survive a join — materialize
            # it as a regular column first
            raw = raw.select("*", "_metadata")
        wm_rows = [(int(k), int(v)) for k, v in wm.items()]
        wm_df = self.spark.createDataFrame(
            wm_rows, T.StructType([
                T.StructField("part_id", T.IntegerType(), False),
                T.StructField("_wm", T.LongType(), False),
            ])
        )
        raw = raw.join(F.broadcast(wm_df), on="part_id", how="left")
        is_fresh = F.col("lsn") > F.coalesce(F.col("_wm"), F.lit(-1))

        # -- exact winners-mode watermarks: per-known-partition max(lsn)
        # as OBSERVED metrics on the raw batch. CollectMetrics evaluates
        # map-side inside the one collapse+write job (no extra pass, no
        # shuffle), and unlike the winner-derived max it is exact for ANY
        # event→partition routing, keyed or not. The expression list uses
        # the same stable partition-id literals every batch, so the plan
        # (and its codegen unit) stays cached. Partitions absent from the
        # watermark map are detected by a catch-all count; their (rare —
        # first batch, partition-count change) watermarks come from one
        # slim column-pruned fallback agg in _props.
        wm_obs = None
        obs_parts: list[int] = []
        raw_pre_obs = raw  # observe-free plan for the rare fallback agg
        if (use_winners and self.exact_watermarks
                and len(wm) <= EXACT_WM_MAX_PARTS):
            from pyspark.sql import Observation

            obs_parts = sorted(int(k) for k in wm.keys())
            unknown = (~F.col("part_id").isin(obs_parts)
                       if obs_parts else F.lit(True))
            wm_obs = Observation()
            raw = raw.observe(
                wm_obs,
                F.count(F.when(unknown, F.lit(1))).alias("_unk"),
                *[
                    F.max(F.when(F.col("part_id") == p, F.col("lsn")))
                    .alias(f"_w{p}")
                    for p in obs_parts
                ],
            )

        stats_box: dict = {}
        if not use_winners:
            # -- "full" mode: lineage counts + watermarks from a slim
            # column-pruned pass over the raw batch, run in a SIDE THREAD
            # so it overlaps the heavy collapse+write job (its result is
            # only needed at the manifest swap)
            import threading

            def _stats_job():
                try:
                    stats_box["pre"] = (
                        raw.groupBy("part_id")
                        .agg(
                            F.count("*").alias("events_in"),
                            F.count(F.when(is_fresh, 1)).alias("fresh"),
                            F.count_distinct(F.when(is_fresh, F.col("lsn"))).alias("fresh_unique"),
                            F.max(F.when(is_fresh, F.col("lsn"))).alias("wmax"),
                        )
                        .collect()
                    )
                except Exception as e:  # noqa: BLE001 - re-raised at join
                    stats_box["error"] = e

            stats_thread = threading.Thread(target=_stats_job, daemon=True)
            stats_thread.start()

            def _stats():
                stats_thread.join()
                if "error" in stats_box:
                    raise stats_box["error"]
                if "new_wm" not in stats_box:
                    new_wm = dict(wm)
                    for r in stats_box["pre"]:
                        if r["wmax"] is not None:
                            k = str(int(r["part_id"]))
                            new_wm[k] = max(int(new_wm.get(k, -1)), int(r["wmax"]))
                    stats_box["new_wm"] = new_wm
                return stats_box

        # -- schema reconciliation: added columns append; a column whose
        # batch dtype differs WIDENS the table schema along the numeric
        # lattice (widen_type; raises on a non-widening change). The
        # parquet reader serves old narrow files under the widened schema
        # natively, so no rewrite — cast-on-read, the reference's model.
        table_schema = self.table.schema()
        batch_payload = [
            f for f in raw.schema.fields
            if f.name not in CONTROL_COLS and f.name not in ("_wm", "_metadata")
        ]
        new_fields = [f for f in batch_payload if f.name not in table_schema.names]
        widened = {}
        for f in batch_payload:
            if f.name in table_schema.names:
                cur = table_schema[f.name].dataType
                w = widen_type(cur, f.dataType)
                if w != cur:
                    widened[f.name] = w
        evolved = (
            T.StructType(
                [
                    T.StructField(f.name, widened.get(f.name, f.dataType), f.nullable)
                    for f in table_schema.fields
                ]
                + [T.StructField(f.name, f.dataType, True) for f in new_fields]
            )
            if new_fields or widened
            else table_schema
        )

        # SHARED apply predicate: the DLQ's quarantine-completeness
        # invariant ("anything fresh the engine won't apply either
        # quarantines or is a control event") depends on the quarantine
        # filter being the exact complement of THIS expression — one
        # definition, both consumers
        applicable = (
            (F.col("op") != "schema_change") & F.col(self.key).isNotNull()
        )
        if self.dlq:
            # dead-letter quarantine: a FRESH data event the engine won't
            # apply (null key → no LWW identity; null op → fails the apply
            # filter, null-safely) lands in <warehouse>/<table>_dlq/
            # batch=<id>/ with its full envelope for operator replay after
            # repair (repaired rows re-inject with NEW lsns — their
            # originals are already below the committed watermark).
            # Opt-in: one extra filtered write job per batch, only
            # rejected rows shuffle (reference analog: diagnostics
            # surface dropped events, builtins/operators/diagnostics.cpp).
            self._quarantine(
                raw.filter(
                    is_fresh
                    & ~F.coalesce(applicable, F.lit(False))
                    & ~F.col("op").eqNullSafe("schema_change")
                ).drop("_wm"),
                batch_id,
            )
        data = raw.filter(is_fresh & applicable).drop("_wm")
        if self.collapse_mode == "semijoin":
            from tenzir_spark.cdc.collapse import collapse_lww_semijoin

            collapsed = collapse_lww_semijoin(data, key=self.key, order="lsn")
        else:
            collapsed = collapse_lww(data, key=self.key, order="lsn",
                                     salt_buckets=self.salt_buckets,
                                     count_col=NEV_COL if use_winners else None)
        # merge-on-read delta: payload aligned to the (possibly evolved)
        # schema + bucket + tombstone flag + source-partition lineage.
        # ONE Spark job (collapse→write); rows/buckets/lineage come from
        # the written parquet footers — no cache of wide token arrays
        # (caching them thrashes GC under high task concurrency).
        extra = [
            (F.col("op") == "delete").alias(DELETED_COL),
            F.col("part_id").alias(PART_COL),
        ]
        if use_winners:
            extra += [F.col("lsn").alias(LSN_COL), F.col(NEV_COL)]
        delta = collapsed.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in collapsed.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in evolved.fields
            ],
            *extra,
        ).withColumn(BUCKET_COL, self.table.bucket_expr(self.key))

        if use_winners:
            def _props(entries):
                st = self._winner_stats(entries)
                stats_box.update(st)
                new_wm = dict(wm)
                if wm_obs is not None:
                    # the delta write (an action over the observed plan)
                    # has completed by manifest-swap time, so .get is
                    # immediate — exact per-partition delivered maxes
                    m = wm_obs.get
                    for p in obs_parts:
                        v = m[f"_w{p}"]
                        if v is not None:
                            k = str(p)
                            new_wm[k] = max(int(new_wm.get(k, -1)), int(v))
                    if m["_unk"]:
                        # partitions not yet in the watermark map: one
                        # slim (part_id, lsn)-pruned agg over just their
                        # rows — pays a job only on partition-appearance
                        # batches (incl. the very first batch)
                        unk_rows = (
                            raw_pre_obs.filter(~F.col("part_id").isin(obs_parts))
                            if obs_parts else raw_pre_obs
                        )
                        for r in (unk_rows.groupBy("part_id")
                                  .agg(F.max("lsn").alias("_mx")).collect()):
                            k = str(int(r["part_id"]))
                            new_wm[k] = max(int(new_wm.get(k, -1)), int(r["_mx"]))
                elif self.exact_watermarks:
                    # > EXACT_WM_MAX_PARTS known partitions: the observed
                    # expression list would dominate, so pay ONE slim
                    # (part_id, lsn)-pruned agg per batch instead —
                    # exactness never silently degrades to the
                    # keyed-routing assumption
                    for r in (raw_pre_obs.groupBy("part_id")
                              .agg(F.max("lsn").alias("_mx")).collect()):
                        k = str(int(r["part_id"]))
                        new_wm[k] = max(int(new_wm.get(k, -1)), int(r["_mx"]))
                else:
                    # keyed-routing contract: winner lsns stand in for the
                    # per-partition delivered maxes (see __init__ note)
                    for p, mx in st["wmax"].items():
                        k = str(p)
                        new_wm[k] = max(int(new_wm.get(k, -1)), int(mx))
                stats_box["new_wm"] = new_wm
                if new_wm == wm:
                    return {}  # pure redelivery: no progress to record
                return {"watermarks": new_wm, "last_batch_id": batch_id}
        else:
            def _props(entries):
                s = _stats()
                if s["new_wm"] == wm:
                    return {}  # pure redelivery: no progress to record
                return {"watermarks": s["new_wm"], "last_batch_id": batch_id}

        # pure redelivery nets out to a no-op: empty delta + unchanged
        # watermarks/schema → delta_commit aborts without a snapshot
        version, dstats = self.table.delta_commit(
            delta, schema=evolved, properties=_props, allow_noop_abort=True,
        )
        n_keys = dstats["rows"]
        if version is not None:
            self._maybe_compact()
        wall_ms = int((time.monotonic() - t0) * 1000)

        if use_winners:
            new_wm = stats_box.get("new_wm", dict(wm))
            applied = stats_box.get("applied", {})
            fresh = stats_box.get("fresh", {})
            # events_in per partition: exact delivered count when the
            # caller recovered it from footers, else the documented
            # fresh-only fallback (METRICS_SCHEMA semantics note)
            ev_in = delivered_by_part if delivered_by_part is not None else fresh
            metrics = [
                (
                    batch_id, int(p), int(ev_in.get(p, fresh.get(p, 0))),
                    int(applied.get(p, 0)),
                    int(ev_in.get(p, fresh.get(p, 0))) - int(applied.get(p, 0)),
                    int(new_wm.get(str(int(p)), -1)), wall_ms,
                )
                for p in sorted(set(fresh) | set(ev_in))
            ]
            events_in = sum(ev_in.values())
            fresh_total = sum(fresh.values())
        else:
            applied_by_part = (
                self._lineage_from_commit(dstats["cid"]) if version is not None else {}
            )
            s = _stats()
            pre, new_wm = s["pre"], s["new_wm"]
            fresh_total = sum(r["fresh"] for r in pre)
            events_in = sum(r["events_in"] for r in pre)
            metrics = [
                (
                    batch_id,
                    int(r["part_id"]),
                    int(r["events_in"]),
                    applied_by_part.get(int(r["part_id"]), 0),
                    int(r["events_in"]) - int(r["fresh_unique"]),
                    int(new_wm.get(str(int(r["part_id"])), -1)),
                    wall_ms,
                )
                for r in pre
            ]
        self._write_metrics(metrics, batch_id)
        return {
            "batch_id": batch_id,
            "events_in": events_in,
            "fresh": fresh_total,
            "applied_keys": n_keys,
            "wall_ms": wall_ms,
            "version": self.table.current_version(),
            # dlq_rejected = NEWLY quarantined (0 on a redelivery whose
            # dead letters were already captured); dlq_in_batch = malformed
            # rows carried by this delivery regardless of dedupe
            "dlq_rejected": self._last_dlq_count if self.dlq else 0,
            "dlq_in_batch": self._last_dlq_in_batch if self.dlq else 0,
        }

    def _winner_stats(self, entries: list[dict]) -> dict:
        """One-job stats: per-source-partition applied counts, collapsed
        fresh-event counts, and max winner LSN, read driver-side from the
        freshly written delta files' three int side-channel columns
        (``_part``/``_lsn``/``_n_ev``) — microseconds of pyarrow against a
        second Spark job over the batch."""
        import numpy as np
        import pyarrow.parquet as pq

        applied: dict[int, int] = {}
        fresh: dict[int, int] = {}
        wmax: dict[int, int] = {}
        for e in entries:
            tbl = pq.read_table(
                os.path.join(self.table.root, e["path"]),
                columns=[PART_COL, LSN_COL, NEV_COL],
            )
            parts = tbl[PART_COL].to_numpy(zero_copy_only=False).astype(np.int64)
            lsns = tbl[LSN_COL].to_numpy(zero_copy_only=False).astype(np.int64)
            nevs = tbl[NEV_COL].to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(parts):
                continue
            # single-pass grouped reductions (bincount / scatter-max):
            # with millions of winner rows a per-partition mask loop costs
            # ~1 s of driver time per batch — this is ~10 ms
            n = int(parts.max()) + 1
            cnt = np.bincount(parts, minlength=n)
            nev_sum = np.bincount(parts, weights=nevs, minlength=n).astype(np.int64)
            mx = np.full(n, -1, dtype=np.int64)
            np.maximum.at(mx, parts, lsns)
            for p in np.nonzero(cnt)[0]:
                pi = int(p)
                applied[pi] = applied.get(pi, 0) + int(cnt[p])
                fresh[pi] = fresh.get(pi, 0) + int(nev_sum[p])
                wmax[pi] = max(wmax.get(pi, -1), int(mx[p]))
        return {"applied": applied, "fresh": fresh, "wmax": wmax}

    def _write_metrics(self, rows: list[tuple], batch_id: int) -> None:
        """Metrics are tiny driver-local lineage rows — writing them through
        a Spark job costs a full job-launch round trip per batch; pyarrow
        writes them in microseconds. (On a cluster the metrics table would
        be object-store parquet just the same.)"""
        import pyarrow as pa

        self.fs.makedirs(self.metrics_dir)
        names = [f.name for f in METRICS_SCHEMA.fields]
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        tbl = pa.table(
            {n: pa.array(c, type=pa.int64() if n != "part_id" else pa.int32())
             for n, c in zip(names, cols)}
        )
        self.fs.parquet_write(
            tbl,
            os.path.join(self.metrics_dir, f"batch-{batch_id:06d}.parquet"))
        try:
            entries = [f for f in self.fs.listdir(self.metrics_dir)
                       if f.endswith(".parquet")]
        except OSError:
            return
        if len(entries) > self.metrics_rollup_files:
            self._rollup_metrics(entries)

    def _rollup_metrics(self, entries: list[str]) -> None:
        """Bound the metrics table's FILE COUNT (10^6 batches must not mean
        10^6 parquet files — listing alone would dominate): fold all metric
        files into one, driver-side pyarrow. Duplicate (batch_id, part_id)
        rows — a batch redelivered after an earlier fold — resolve
        keep-last (newest attempt), matching the per-batch overwrite
        semantics of the un-folded layout; between folds both attempts are
        transiently visible (observability rows, not engine state).
        Crash-safe in the duplicates-over-loss direction: the folded file
        is published (atomic rename) BEFORE the originals are removed."""
        import pyarrow as pa

        paths = [os.path.join(self.metrics_dir, f) for f in sorted(entries)]
        merged = pa.concat_tables([self.fs.parquet_read(p) for p in paths])
        df = merged.to_pandas().drop_duplicates(
            ["batch_id", "part_id"], keep="last")
        hi = int(df["batch_id"].max()) if len(df) else 0
        out = os.path.join(self.metrics_dir, f"agg-{hi:09d}.parquet")
        # dot-prefixed temp: Spark's directory listing skips dotfiles, so
        # a crash mid-write can never leave a truncated file that breaks
        # (or a complete one that double-counts) every later metrics read
        tmp = os.path.join(self.metrics_dir, f".agg-{hi:09d}.inprogress")
        self.fs.parquet_write(
            pa.Table.from_pandas(df, schema=merged.schema,
                                 preserve_index=False), tmp)
        self.fs.rename(tmp, out)
        for p in paths:
            if p != out:
                try:
                    self.fs.remove(p)
                except FileNotFoundError:
                    pass

    def run(self, changes_dir: str, start_batch: int = 0, max_batches: int | None = None) -> dict:
        """Consume the change log; resumable — re-running from ANY
        ``start_batch`` ≤ the true position yields the identical final
        table (watermark idempotence)."""
        self.ensure_table()
        files = sorted(
            p for p in glob.glob(os.path.join(changes_dir, "batch-*"))
            if os.path.isdir(p) or p.endswith(".parquet")
        )
        if max_batches is not None:
            files = files[: start_batch + max_batches]
        t0 = time.monotonic()
        events = 0
        batch_stats = []
        for i, path in enumerate(files):
            if i < start_batch:
                continue
            st = self.apply_batch(path, i)
            events += st["events_in"]
            batch_stats.append(st)
        self.finish_compaction()
        wall = time.monotonic() - t0
        return {
            "batches": len(batch_stats),
            "events_in": events,
            "wall_sec": wall,
            "events_per_sec": events / wall if wall > 0 else 0.0,
            "batch_stats": batch_stats,
        }

    def read_metrics(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(
            self.fs.spark_path(self.metrics_dir))
