"""Lake table layer: atomic snapshots, bucket pruning, merge semantics."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from tenzir_spark.lake import BUCKET_COL, LakeTable, merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_append_read(spark, tmp_path):
    t = LakeTable(str(tmp_path), "t1")
    t.create(SCHEMA, n_buckets=4)
    df = _mk(spark, [("a", [1, 2], 2, "web"), ("b", [3], 1, "code")])
    t.append(df, key_col="doc_id")
    got = t.read(spark)
    assert {r["doc_id"] for r in got.collect()} == {"a", "b"}
    assert t.current_version() == 1


def test_merge_upsert_delete(spark, tmp_path):
    t = LakeTable(str(tmp_path), "t2")
    t.create(SCHEMA, n_buckets=4)
    t.append(_mk(spark, [("a", [1], 1, "web"), ("b", [2], 1, "web"), ("c", [3], 1, "web")]), "doc_id")

    batch = spark.createDataFrame(
        [("a", [9, 9], 2, "code", "update"), ("b", None, None, None, "delete"), ("d", [4], 1, "wiki", "insert")],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())]),
    )
    merge_batch(spark, t, batch, key="doc_id")
    rows = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert set(rows) == {"a", "c", "d"}
    assert rows["a"]["tokens"] == [9, 9] and rows["a"]["source"] == "code"


def test_cold_buckets_not_rewritten(spark, tmp_path):
    t = LakeTable(str(tmp_path), "t3")
    t.create(SCHEMA, n_buckets=16)
    base = _mk(spark, [(f"k{i}", [i], 1, "web") for i in range(200)])
    t.append(base, "doc_id")
    files_before = {e["path"]: e for e in t.snapshot()["files"]}

    batch = spark.createDataFrame(
        [("k0", [99], 1, "web", "update")],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())]),
    )
    st = merge_batch(spark, t, batch, key="doc_id")
    assert st["touched_buckets"] == 1
    files_after = {e["path"]: e for e in t.snapshot()["files"]}
    carried = set(files_before) & set(files_after)
    # every untouched bucket's file survives as metadata-only carry-over
    touched_bucket = next(e["bucket"] for p, e in files_after.items() if p not in files_before)
    assert all(files_before[p]["bucket"] != touched_bucket for p in carried)
    assert len(carried) >= len(files_before) - 2


def test_schema_evolution_on_read(spark, tmp_path):
    t = LakeTable(str(tmp_path), "t4")
    t.create(SCHEMA, n_buckets=4)
    t.append(_mk(spark, [("a", [1], 1, "web")]), "doc_id")

    evolved = T.StructType(list(SCHEMA.fields) + [T.StructField("meta", T.StringType(), True)])
    batch = spark.createDataFrame(
        [("b", [2], 1, "web", "m1", "insert")],
        T.StructType(list(evolved.fields) + [T.StructField("op", T.StringType())]),
    )
    merge_batch(spark, t, batch, key="doc_id", evolved_schema=evolved)
    rows = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert rows["a"]["meta"] is None and rows["b"]["meta"] == "m1"


def test_atomic_snapshot_isolation(spark, tmp_path):
    t = LakeTable(str(tmp_path), "t5")
    t.create(SCHEMA, n_buckets=4, properties={"watermarks": {"0": 5}})
    assert t.properties()["watermarks"] == {"0": 5}
    t.append(_mk(spark, [("a", [1], 1, "web")]), "doc_id", properties={"watermarks": {"0": 9}})
    assert t.properties()["watermarks"] == {"0": 9}
    # old snapshot still readable (time travel)
    assert t.snapshot(0)["properties"]["watermarks"] == {"0": 5}
    assert t.read_files(spark, t.snapshot(0)["files"]).count() == 0


def _delta_df(spark, t, rows):
    """Payload rows + _bucket/_deleted, shaped like the runner's delta."""
    df = _mk(spark, rows)
    return df.withColumn(BUCKET_COL, t.bucket_expr("doc_id")).withColumn(
        "_deleted", F.lit(False)
    )


def test_concurrent_fold_preserves_lower_cid_delta(spark, tmp_path):
    """Lost-update race: a delta whose cid was allocated BEFORE the fold's
    but which publishes only after the fold pinned its snapshot must still
    win LWW — the folded base preserves per-row ORIGINAL commit ids, so
    the rebase is sound for any interleaving (no abort, no livelock)."""
    t = LakeTable(str(tmp_path), "t6")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web")]),
                   schema=SCHEMA, properties={})
    orig_write = t.write_commit_files
    raced = {}

    def write_then_publish(df, commit_version, **kw):
        out = orig_write(df, commit_version, **kw)
        # a delta that allocated earlier (lower cid than the fold's)
        # publishes while the fold is between write and swap
        raced["v"], _ = LakeTable.delta_commit(
            t, _delta_df(spark, t, [("a", [7, 7], 2, "code")]),
            schema=SCHEMA, properties={})
        return out

    # simulate the delta having allocated its cid BEFORE the fold
    low_cid = t._alloc_commit_id()
    t._next_cid = low_cid  # the mid-fold delta will reuse this lower cid
    t.write_commit_files = write_then_publish
    try:
        v = t.compact(spark)
    finally:
        t.write_commit_files = orig_write
    assert v is not None, "fold must complete (no abort)"
    rows = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert rows["a"]["tokens"] == [7, 7], "mid-fold delta must not be lost"
    # second fold absorbs the raced delta too
    assert t.compact(spark) is not None
    assert t.delta_pressure()["delta_commits"] == 0
    rows = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert rows["a"]["tokens"] == [7, 7]


def test_fold_preserves_original_commit_order(spark, tmp_path):
    """Folded base rows keep their original _commit: an UPDATE delta
    written after the fold pinned (higher cid) wins; a fold never
    promotes old rows above later deltas (tombstone-resurrection guard)."""
    from pyspark.sql import functions as F

    t = LakeTable(str(tmp_path), "t7")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web"), ("b", [2], 1, "web")]),
                   schema=SCHEMA, properties={})
    t.delta_commit(_delta_df(spark, t, [("a", [3], 1, "wiki")]),
                   schema=SCHEMA, properties={})
    assert t.compact(spark) is not None
    base = t.read(spark)
    commits = {r["doc_id"]: r["_commit"] for r in base.collect()}
    assert commits["a"] > commits["b"], "winner keeps its ORIGINAL commit"
    # a delete after the fold must not resurrect
    tomb = _delta_df(spark, t, [("a", None, None, None)]).withColumn(
        "_deleted", F.lit(True))
    t.delta_commit(tomb, schema=SCHEMA, properties={})
    assert {r["doc_id"] for r in t.read(spark).collect()} == {"b"}
    assert t.compact(spark) is not None
    assert {r["doc_id"] for r in t.read(spark).collect()} == {"b"}


def test_time_travel_read(spark, tmp_path):
    """read(version=k) replays exactly the state a reader at snapshot k
    saw — manifests and data files are immutable, so time travel costs
    nothing (Iceberg snapshot-isolation analog)."""
    t = LakeTable(str(tmp_path), "t_tt")
    t.create(SCHEMA, n_buckets=4)
    t.append(_mk(spark, [("a", [1], 1, "web")]), key_col="doc_id")
    v1 = t.current_version()
    t.append(_mk(spark, [("b", [2], 1, "code")]), key_col="doc_id")
    from tenzir_spark.lake.table import DELETED_COL

    upd = _mk(spark, [("a", [9], 1, "wiki")]).withColumn(
        BUCKET_COL, t.bucket_expr("doc_id")).withColumn(DELETED_COL, F.lit(False))
    t.delta_commit(upd, schema=SCHEMA, properties={})
    assert {r["doc_id"] for r in t.read(spark, version=v1).collect()} == {"a"}
    assert t.read(spark, version=v1).filter("doc_id='a'").first()["tokens"] == [1]
    now = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}
    assert now == {"a": [9], "b": [2]}
    # version 0: empty table
    assert t.read(spark, version=0).count() == 0


def test_bucket_pruned_point_lookup(spark, tmp_path):
    """lookup() hashes the key to its bucket and reads only that bucket's
    files; the result matches an unpruned filter, incl. under
    merge-on-read deltas and after deletes."""
    t = LakeTable(str(tmp_path), "t_pl")
    t.create(SCHEMA, n_buckets=8)
    rows = [(f"d{i}", [i], 1, "web") for i in range(64)]
    t.append(_mk(spark, rows), key_col="doc_id")

    for key in ("d3", "d41"):
        got = t.lookup(spark, key).collect()
        assert len(got) == 1 and got[0]["tokens"] == [int(key[1:])]
        # pruning actually prunes: the chosen bucket holds < all the files
        b = t.bucket_of(spark, key)
        base_files = [e for e in t.snapshot()["files"]
                      if e.get("kind", "base") == "base"]
        pruned = [e for e in base_files if e["bucket"] == b]
        assert 0 < len(pruned) < len(base_files)

    # under a delta: updated value wins, tombstoned key disappears
    from tenzir_spark.lake.table import DELETED_COL

    upd = _mk(spark, [("d3", [99], 1, "wiki")]).withColumn(
        BUCKET_COL, t.bucket_expr("doc_id")).withColumn(DELETED_COL, F.lit(False))
    t.delta_commit(upd, schema=SCHEMA, properties={})
    assert t.lookup(spark, "d3").first()["tokens"] == [99]
    tomb = _mk(spark, [("d41", None, None, None)]).withColumn(
        BUCKET_COL, t.bucket_expr("doc_id")).withColumn(DELETED_COL, F.lit(True))
    t.delta_commit(tomb, schema=SCHEMA, properties={})
    assert t.lookup(spark, "d41").count() == 0
    # time-travel lookup still sees the pre-delete row
    assert t.lookup(spark, "d41", version=1).first()["tokens"] == [41]


# ----------------------------------------------------------- maintenance


def _walk_data_files(t):
    import os

    out = set()
    for dirpath, _d, files in os.walk(t.data_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(dirpath, fn), t.root))
    return out


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots drops old manifests and deletes exactly the data
    files no retained snapshot references; the current table state and
    retained time travel are untouched (Iceberg expire_snapshots)."""
    t = LakeTable(str(tmp_path), "t_exp")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web"), ("b", [2], 1, "web")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 1}})
    t.delta_commit(_delta_df(spark, t, [("a", [9], 1, "wiki")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 2}})
    t.compact(spark)  # supersedes both delta files
    t.delta_commit(_delta_df(spark, t, [("c", [3], 1, "web")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 3}})
    before = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}
    n_versions = len(t.versions())
    assert n_versions == 5  # create + 2 deltas + fold + delta

    st = t.expire_snapshots(keep_last=2)
    assert st["expired_versions"] == [0, 1, 2]
    assert st["deleted_files"] >= 2  # the two folded delta files
    assert t.versions() == [3, 4]
    # current state identical, retained time travel works, expired raises
    assert {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()} == before
    assert {r["doc_id"] for r in t.read(spark, version=3).collect()} == {"a", "b"}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.snapshot(1)
    # disk files == union of retained manifests (no dead files remain)
    live = set()
    for v in t.versions():
        live.update(e["path"] for e in t.snapshot(v)["files"])
    assert _walk_data_files(t) == live
    # idempotent / no-op second call
    assert t.expire_snapshots(keep_last=2)["expired_versions"] == []


def test_expire_refuses_mid_fold(tmp_path):
    t = LakeTable(str(tmp_path), "t_exp2")
    t.create(SCHEMA, n_buckets=4)
    t._compacting = True
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="in-flight"):
        t.expire_snapshots(keep_last=1)
    t._compacting = False
    assert t.expire_snapshots(keep_last=1)["expired_versions"] == []


def test_prune_skips_inflight_staging_dirs(tmp_path):
    """The empty-dir prune after expire/orphan GC must NEVER remove a
    Hadoop committer staging tree: with async compaction the fold thread
    runs expiry while the foreground apply is mid-write, and its
    ``_temporary/<app>/_temporary/attempt_*`` dirs are momentarily empty
    — rmdir'ing one aborts the in-flight batch job (observed at
    10^9-event endurance scale: chmod on the attempt dir fails with
    ENOENT and the whole stage is cancelled)."""
    import os

    t = LakeTable(str(tmp_path), "t_prune")
    t.create(SCHEMA, n_buckets=4)
    staging = os.path.join(
        t.data_dir, "_commit=73", "_temporary", "0", "_temporary",
        "attempt_202608190548_0390_m_000011_15708")
    os.makedirs(staging)
    dot_staging = os.path.join(t.data_dir, "_commit=74",
                               ".spark-staging-abc", "part")
    os.makedirs(dot_staging)
    genuinely_empty = os.path.join(t.data_dir, "_commit=5", "_bucket=1")
    os.makedirs(genuinely_empty)

    t._prune_empty_data_dirs()

    assert os.path.isdir(staging), "in-flight committer dir was pruned"
    assert os.path.isdir(dot_staging), "dot-staging dir was pruned"
    assert not os.path.exists(genuinely_empty)
    assert not os.path.exists(os.path.dirname(genuinely_empty))


def test_remove_orphan_files(spark, tmp_path):
    """Crash leftovers (files in no retained manifest) are GC'd only once
    older than the safety threshold — an in-flight commit's files are
    always younger and never touched."""
    import os
    import time

    t = LakeTable(str(tmp_path), "t_orph")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web")]),
                   schema=SCHEMA, properties={})
    stray_dir = os.path.join(t.data_dir, "_commit=999")
    os.makedirs(stray_dir)
    stray = os.path.join(stray_dir, "part-crash.parquet")
    with open(stray, "wb") as f:
        f.write(b"not really parquet")
    # too young: kept
    assert t.remove_orphan_files(older_than_s=3600)["deleted_files"] == 0
    assert os.path.exists(stray)
    # age it past the threshold: removed, dir pruned, table intact
    old = time.time() - 7200
    os.utime(stray, (old, old))
    st = t.remove_orphan_files(older_than_s=3600)
    assert st["deleted_files"] == 1
    assert not os.path.exists(stray_dir)
    assert t.read(spark).count() == 1


def test_rollback_restores_state_and_watermarks(spark, tmp_path):
    """rollback publishes a NEW snapshot duplicating an old one: data AND
    replay watermarks rewind together, so re-ingesting the undone events
    re-applies them (the exactly-once contract survives the rewind)."""
    t = LakeTable(str(tmp_path), "t_rb")
    t.create(SCHEMA, n_buckets=4)
    v1 = t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web")]),
                        schema=SCHEMA, properties={"watermarks": {"0": 10}})[0]
    t.delta_commit(_delta_df(spark, t, [("a", [2], 1, "web"), ("b", [5], 1, "web")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 20}})
    v3 = t.rollback(v1)
    assert v3 == 3 and t.current_version() == 3
    rows = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}
    assert rows == {"a": [1]}
    assert t.properties()["watermarks"] == {"0": 10}
    # history stays linear: ingest continues on top of the rollback
    t.delta_commit(_delta_df(spark, t, [("b", [7], 1, "web")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 21}})
    rows = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}
    assert rows == {"a": [1], "b": [7]}
    # the rolled-back-over snapshot is still there for forensic time travel
    assert {r["doc_id"] for r in t.read(spark, version=2).collect()} == {"a", "b"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired or unknown"):
        t.rollback(99)


def test_sorted_compaction_row_groups(spark, tmp_path):
    """Compaction writes each bucket file sorted by the primary key
    (Iceberg sort-order analog): parquet row-group min/max stats then
    prune point lookups to ~one row group."""
    import os

    import pyarrow.parquet as pq

    t = LakeTable(str(tmp_path), "t_sort")
    t.create(SCHEMA, n_buckets=2)
    rows = [(f"d{i:04d}", [i], 1, "web") for i in range(500)]
    t.delta_commit(_delta_df(spark, t, rows), schema=SCHEMA, properties={})
    t.compact(spark, sort_by_key=True)
    base = [e for e in t.snapshot()["files"] if e.get("kind", "base") == "base"]
    assert base
    for e in base:
        col = pq.read_table(os.path.join(t.root, e["path"]),
                            columns=["doc_id"])["doc_id"].to_pylist()
        assert col == sorted(col), f"bucket file {e['path']} not key-sorted"
    # and the fold changed nothing semantically
    got = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}
    assert got == {f"d{i:04d}": [i] for i in range(500)}


def test_runner_retention_bounds_history(spark, tmp_path):
    """IngestRunner(retain_snapshots=N) expires after each fold: the
    manifest count stays bounded while ingest marches on."""
    import pyspark.sql.types as T2

    from tenzir_spark.cdc.runner import IngestRunner

    runner = IngestRunner(
        spark, str(tmp_path / "wh"), n_buckets=4,
        compact_min_rows=1, compact_max_commits=1,  # fold every batch
        retain_snapshots=2,
    )
    runner.ensure_table()
    ev_schema = T2.StructType([
        T2.StructField("doc_id", T2.StringType()),
        T2.StructField("tokens", T2.ArrayType(T2.IntegerType())),
        T2.StructField("n_tok", T2.IntegerType()),
        T2.StructField("source", T2.StringType()),
        T2.StructField("op", T2.StringType()),
        T2.StructField("part_id", T2.IntegerType()),
        T2.StructField("lsn", T2.LongType()),
    ])
    for b in range(4):
        df = spark.createDataFrame(
            [(f"d{i}", [b, i], 2, "web", "upsert", 0, b * 10 + i)
             for i in range(8)], ev_schema)
        runner.apply_batch_df(df, batch_id=b)
    assert len(runner.table.versions()) <= 4  # bounded, not one-per-commit
    rows = {r["doc_id"]: r["tokens"] for r in runner.table.read(spark).collect()}
    assert rows == {f"d{i}": [3, i] for i in range(8)}


# ------------------------------------------------------ incremental read


def test_read_changes_net_per_key(spark, tmp_path):
    """read_changes emits the NET change per key between two snapshots,
    shaped as a change batch (payload + op) — cost ∝ changed rows."""
    t = LakeTable(str(tmp_path), "t_ch")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web"), ("b", [2], 1, "web")]),
                   schema=SCHEMA, properties={})     # v1
    t.delta_commit(_delta_df(spark, t, [("a", [9], 1, "wiki")]),
                   schema=SCHEMA, properties={})     # v2
    tomb = _delta_df(spark, t, [("b", None, None, None)]).withColumn(
        "_deleted", F.lit(True))
    t.delta_commit(tomb, schema=SCHEMA, properties={})  # v3

    ch = {r["doc_id"]: r for r in t.read_changes(spark, 0).collect()}
    assert set(ch) == {"a", "b"}
    assert ch["a"]["op"] == "upsert" and ch["a"]["tokens"] == [9]  # net of 2 changes
    assert ch["b"]["op"] == "delete"
    # windowed: only the middle commit
    ch12 = {r["doc_id"]: r for r in t.read_changes(spark, 1, 2).collect()}
    assert set(ch12) == {"a"} and ch12["a"]["tokens"] == [9]
    # empty window
    assert t.read_changes(spark, 3).count() == 0
    assert "op" in t.read_changes(spark, 3).columns


def test_read_changes_fold_transparent_and_horizon(spark, tmp_path):
    """A fold inside the window is invisible to the changelog (the folded
    delta files are still listed by intermediate manifests); expiring
    those manifests bounds the horizon with a clear error."""
    import pytest as _pytest

    t = LakeTable(str(tmp_path), "t_ch2")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web")]),
                   schema=SCHEMA, properties={})     # v1
    t.compact(spark)                                 # v2 (folds v1's delta)
    t.delta_commit(_delta_df(spark, t, [("b", [2], 1, "web")]),
                   schema=SCHEMA, properties={})     # v3
    ch = {r["doc_id"]: r["op"] for r in t.read_changes(spark, 0).collect()}
    assert ch == {"a": "upsert", "b": "upsert"}  # fold didn't hide a's change
    # the fold itself adds no changes
    assert t.read_changes(spark, 1, 2).count() == 0
    t.expire_snapshots(keep_last=2)  # drops v0/v1 manifests
    with _pytest.raises(ValueError, match="changelog horizon expired"):
        t.read_changes(spark, 0)
    # horizon inside retention still fine
    assert t.read_changes(spark, 2).count() == 1


def test_read_changes_downstream_apply_roundtrip(spark, tmp_path):
    """The changelog IS a valid change batch: applying it to a second
    table with the engine's own merge reproduces the source state —
    lake-to-lake incremental replication."""
    src = LakeTable(str(tmp_path), "src")
    src.create(SCHEMA, n_buckets=4)
    src.delta_commit(_delta_df(spark, src, [("a", [1], 1, "web"),
                                            ("b", [2], 1, "web"),
                                            ("c", [3], 1, "web")]),
                     schema=SCHEMA, properties={})
    dst = LakeTable(str(tmp_path), "dst")
    dst.create(SCHEMA, n_buckets=4)
    merge_batch(spark, dst, src.read_changes(spark, 0), key="doc_id")
    sync_point = src.current_version()

    src.delta_commit(_delta_df(spark, src, [("a", [7], 1, "code")]),
                     schema=SCHEMA, properties={})
    tomb = _delta_df(spark, src, [("c", None, None, None)]).withColumn(
        "_deleted", F.lit(True))
    src.delta_commit(tomb, schema=SCHEMA, properties={})
    merge_batch(spark, dst, src.read_changes(spark, sync_point), key="doc_id")

    want = {(r["doc_id"], tuple(r["tokens"] or []))
            for r in src.read(spark).collect()}
    got = {(r["doc_id"], tuple(r["tokens"] or []))
           for r in dst.read(spark).collect()}
    assert got == want == {("a", (7,)), ("b", (2,))}


def test_writer_lease_single_writer(spark, tmp_path):
    """Cross-process single-writer guard: a second table handle cannot
    take the lease while the first holds it; release (or process death —
    flock) frees it. Readers are unaffected."""
    import pytest as _pytest

    t1 = LakeTable(str(tmp_path), "t_lease")
    t1.create(SCHEMA, n_buckets=4)
    t1.acquire_writer_lease()
    t1.acquire_writer_lease()  # idempotent for the holder

    t2 = LakeTable(str(tmp_path), "t_lease")
    with _pytest.raises(RuntimeError, match="writer lease"):
        t2.acquire_writer_lease()
    # reading needs no lease
    t1.append(_mk(spark, [("a", [1], 1, "web")]), "doc_id")
    assert t2.read(spark).count() == 1

    t1.release_writer_lease()
    t2.acquire_writer_lease()
    t2.release_writer_lease()


def test_read_changes_random_invariant(spark, tmp_path):
    """Changelog completeness, randomized: for EVERY snapshot pair
    (v_i < v_j) of a random op history (upserts/deletes/a mid-history
    fold), applying read_changes(v_i, v_j) on top of state(v_i)
    reproduces state(v_j) exactly."""
    import random

    rng = random.Random(7)
    t = LakeTable(str(tmp_path), "t_rand")
    t.create(SCHEMA, n_buckets=4)
    keys = [f"k{i}" for i in range(12)]
    versions = [0]
    for b in range(5):
        chosen = rng.sample(keys, rng.randint(2, 6))
        live = [(k, [b, rng.randint(0, 99)], 2, "web")
                for k in chosen if rng.random() >= 0.3]
        dead = [k for k in chosen if k not in {r[0] for r in live}]
        parts = []
        if live:
            parts.append(_delta_df(spark, t, live))
        if dead:
            parts.append(_delta_df(
                spark, t, [(k, None, None, None) for k in dead]
            ).withColumn("_deleted", F.lit(True)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        t.delta_commit(df, schema=SCHEMA, properties={})
        versions.append(t.current_version())
        if b == 2:
            t.compact(spark)
            versions.append(t.current_version())

    state = {
        v: {r["doc_id"]: tuple(r["tokens"]) for r in
            t.read(spark, version=v).collect()}
        for v in versions
    }
    for i in range(len(versions)):
        for j in range(i + 1, len(versions)):
            vi, vj = versions[i], versions[j]
            replayed = dict(state[vi])
            for r in t.read_changes(spark, vi, vj).collect():
                if r["op"] == "delete":
                    replayed.pop(r["doc_id"], None)
                else:
                    replayed[r["doc_id"]] = tuple(r["tokens"])
            assert replayed == state[vj], (vi, vj)


def test_read_changes_refuses_rollback_window(spark, tmp_path):
    """A changelog window crossing a rollback raises: the reversion of
    keys touched after the rollback target has no delta-file
    representation, so an incremental read would silently miss changes.
    Windows strictly after the rollback work again."""
    import pytest as _pytest

    t = LakeTable(str(tmp_path), "t_rbch")
    t.create(SCHEMA, n_buckets=4)
    v1 = t.delta_commit(_delta_df(spark, t, [("a", [1], 1, "web")]),
                        schema=SCHEMA, properties={})[0]
    t.delta_commit(_delta_df(spark, t, [("b", [2], 1, "web")]),
                   schema=SCHEMA, properties={})
    v_rb = t.rollback(v1)  # v3: state back to {a}
    with _pytest.raises(ValueError, match="crosses a rollback"):
        t.read_changes(spark, v1)
    with _pytest.raises(ValueError, match="crosses a rollback"):
        t.read_changes(spark, 0, v_rb)
    # fresh consumer after re-bootstrap: windows past the rollback work
    t.delta_commit(_delta_df(spark, t, [("c", [3], 1, "web")]),
                   schema=SCHEMA, properties={})
    ch = {r["doc_id"]: r["op"] for r in t.read_changes(spark, v_rb).collect()}
    assert ch == {"c": "upsert"}


def test_rebucket_spec_evolution(spark, tmp_path):
    """Bucket-spec evolution: the table rewrites under a new bucket
    count with identical content; ingest continues under the new spec;
    time-travel lookups hash with the OLD spec for old versions; deltas
    present or a mid-rewrite commit make it refuse."""
    import pytest as _pytest

    t = LakeTable(str(tmp_path), "t_rbk")
    t.create(SCHEMA, n_buckets=4)
    rows = [(f"k{i}", [i], 1, "web") for i in range(100)]
    t.delta_commit(_delta_df(spark, t, rows), schema=SCHEMA, properties={})

    with _pytest.raises(RuntimeError, match="fully folded"):
        t.rebucket(spark, 16)
    t.compact(spark)
    v_old = t.current_version()
    before = {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()}

    v_new = t.rebucket(spark, 16)
    assert t.n_buckets() == 16 and v_new == t.current_version()
    assert {r["doc_id"]: r["tokens"] for r in t.read(spark).collect()} == before
    # every base file sits in a NEW bucket numbering, one file per bucket
    base = [e for e in t.snapshot()["files"]]
    assert {e["bucket"] for e in base} <= set(range(16))
    assert len({e["bucket"] for e in base}) > 4  # actually spread wider

    # lookups: current spec and time-travel against the old spec
    assert t.lookup(spark, "k7").first()["tokens"] == [7]
    assert t.lookup(spark, "k7", version=v_old).first()["tokens"] == [7]

    # ingest continues under the new spec and folds cleanly
    t.delta_commit(_delta_df(spark, t, [("k7", [99], 1, "wiki")]),
                   schema=SCHEMA, properties={})
    assert t.lookup(spark, "k7").first()["tokens"] == [99]
    assert t.compact(spark) is not None
    assert t.lookup(spark, "k7").first()["tokens"] == [99]
    assert t.read(spark).count() == 100

    # a commit landing mid-rewrite is refused at the swap
    orig_write = t.write_commit_files

    def write_then_sneak(df, cid, **kw):
        out = orig_write(df, cid, **kw)
        t.delta_commit(_delta_df(spark, t, [("zz", [1], 1, "web")]),
                       schema=SCHEMA, properties={})
        return out

    t.compact(spark)
    t.write_commit_files = write_then_sneak
    try:
        with _pytest.raises(RuntimeError, match="changed during rebucket"):
            t.rebucket(spark, 8)
    finally:
        t.write_commit_files = orig_write


def test_maintain_cli_commands(spark, tmp_path, capsys):
    """jobs/maintain.py drives every maintenance op end to end (invoked
    in-process; each command prints one JSON line)."""
    import json as _json

    from jobs.maintain import main as maintain

    t = LakeTable(str(tmp_path), "corpus")
    t.create(SCHEMA, n_buckets=4)
    t.delta_commit(_delta_df(spark, t, [(f"k{i}", [i], 1, "web")
                                        for i in range(20)]),
                   schema=SCHEMA, properties={"watermarks": {"0": 19}})
    t.delta_commit(_delta_df(spark, t, [("k0", [99], 1, "wiki")]),
                   schema=SCHEMA, properties={"watermarks": {"0": 20}})

    base = ["--warehouse", str(tmp_path), "--table", "corpus", "--cores", "4"]
    out = maintain(base + ["history"])
    assert [h["version"] for h in out["history"]] == [0, 1, 2]

    out = maintain(base + ["compact"])
    assert out["version"] == 3
    out = maintain(base + ["expire", "--keep", "1"])
    assert out["expired_versions"] == [0, 1, 2]
    out = maintain(base + ["orphans", "--older-than", "3600"])
    assert out["deleted_files"] == 0  # everything here is younger than 1h
    import pytest as _pytest

    with _pytest.raises(ValueError, match="in-flight"):
        maintain(base + ["orphans", "--older-than", "5"])
    out = maintain(base + ["rebucket", "--buckets", "8"])
    assert out["n_buckets"] == 8
    out = maintain(base + ["rollback", "--to", "3"])
    assert out["version"] == 5

    # table survived the whole gauntlet with the right content
    t2 = LakeTable(str(tmp_path), "corpus")
    rows = {r["doc_id"]: r["tokens"] for r in t2.read(spark).collect()}
    assert rows["k0"] == [99] and len(rows) == 20
    assert t2.properties()["watermarks"] == {"0": 20}
    # each maintain() call released its short-lived lease holder objects,
    # and the stdout contract held (one JSON line per command)
    printed = [l for l in capsys.readouterr().out.strip().splitlines()
               if l.startswith("{")]
    assert all(_json.loads(l) is not None for l in printed)


def test_expire_age_window(spark, tmp_path):
    """expire_snapshots(older_than_s=...) keeps snapshots younger than
    the window even past keep_last — count AND age must both allow a
    drop (Iceberg older_than semantics)."""
    import json as _json
    import os as _os
    import time as _time

    t = LakeTable(str(tmp_path), "t_age")
    t.create(SCHEMA, n_buckets=4)
    for i in range(4):
        t.delta_commit(_delta_df(spark, t, [(f"k{i}", [i], 1, "web")]),
                       schema=SCHEMA, properties={})
    # age v1/v2 artificially (rewrite their manifests with an old ts)
    for v in (1, 2):
        p = _os.path.join(t.meta_dir, f"v{v:08d}.json")
        snap = _json.load(open(p))
        snap["ts"] = _time.time() - 7200
        open(p, "w").write(_json.dumps(snap))
    st = t.expire_snapshots(keep_last=1, older_than_s=3600)
    # v3/v4 are young (kept by age), v0 has no ts (infinitely old),
    # v1/v2 aged out; v4 also kept as head
    assert st["expired_versions"] == [0, 1, 2]
    assert t.versions() == [3, 4]
    assert {r["doc_id"] for r in t.read(spark).collect()} == {"k0", "k1", "k2", "k3"}
    # history surfaces the commit timestamp
    assert all(h["ts"] is not None for h in t.history())


def test_maintenance_refuses_foreign_writer(tmp_path):
    """expire/orphans probe WRITER_LOCK: a lease held by ANOTHER writer
    (another process; flock conflicts across fds, so a second instance
    models it) refuses maintenance GC — its background fold may pin files
    this GC would delete. The lease HOLDER itself is unaffected."""
    import pytest as _pytest

    writer = LakeTable(str(tmp_path), "t_lease")
    writer.create(SCHEMA, n_buckets=4)
    writer.acquire_writer_lease()
    try:
        other = LakeTable(str(tmp_path), "t_lease")
        with _pytest.raises(RuntimeError, match="writer lease"):
            other.expire_snapshots(keep_last=1)
        with _pytest.raises(RuntimeError, match="writer lease"):
            other.remove_orphan_files(older_than_s=3600)
        # the writer itself may still run maintenance
        assert writer.expire_snapshots(keep_last=1)["expired_versions"] == []
    finally:
        writer.release_writer_lease()
    # lease released -> maintenance allowed again
    assert other.expire_snapshots(keep_last=1)["expired_versions"] == []
