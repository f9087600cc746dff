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

    def write_then_publish(df, commit_version):
        out = orig_write(df, commit_version)
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
