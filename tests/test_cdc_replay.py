"""CDC engine correctness: full replay, resume, redelivery, evolution.

The invariant (BASELINE.json north rule): after replay from ANY checkpoint,
the final table state equals the naive in-order oracle bit-for-bit under
per-row token-array equality.
"""

import os

import pytest

from tenzir_spark.cdc.changegen import generate_changes
from tenzir_spark.cdc.oracle import naive_replay
from tenzir_spark.cdc.runner import IngestRunner

from tests.util import assert_state_equal

N_EVENTS = 8_000
N_BATCHES = 8
SC_BATCH = 5  # schema_change introduced in batch 5


@pytest.fixture(scope="module")
def changes_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changes"))
    generate_changes(
        d,
        n_events=N_EVENTS,
        n_docs=900,
        n_parts=4,
        n_batches=N_BATCHES,
        schema_change_batch=SC_BATCH,
        hot_doc_count=3,
        hot_frac=0.2,
    )
    return d


@pytest.fixture(scope="module")
def oracle(changes_dir):
    return naive_replay(changes_dir)


def _engine_state(runner):
    return runner.final_state().toPandas()


def test_full_replay_matches_oracle(spark, changes_dir, oracle, tmp_path):
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8)
    stats = r.run(changes_dir)
    assert stats["batches"] == N_BATCHES
    assert stats["events_in"] > N_EVENTS  # dups delivered
    assert_state_equal(_engine_state(r), oracle)


def test_resume_from_checkpoint(spark, changes_dir, oracle, tmp_path):
    wh = str(tmp_path / "wh")
    r1 = IngestRunner(spark, wh, n_buckets=8)
    r1.run(changes_dir, max_batches=3)
    # simulate crash: brand-new runner over the same warehouse, restart
    # from an EARLIER position than actually applied (over-replay)
    r2 = IngestRunner(spark, wh, n_buckets=8)
    r2.run(changes_dir, start_batch=1)
    assert_state_equal(_engine_state(r2), oracle)


def test_duplicate_batch_redelivery_is_noop(spark, changes_dir, oracle, tmp_path):
    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    r.run(changes_dir)
    v = r.table.current_version()
    # redeliver every batch again — exactly-once must hold
    import glob

    for i, p in enumerate(sorted(glob.glob(os.path.join(changes_dir, "batch-*")))):
        r.apply_batch(p, 100 + i)
    assert r.table.current_version() == v  # no new snapshots
    assert_state_equal(_engine_state(r), oracle)


def test_schema_evolution_added_column(spark, changes_dir, oracle, tmp_path):
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8)
    r.run(changes_dir)
    state = _engine_state(r)
    assert "meta" in state.columns
    assert state["meta"].notna().any(), "post-evolution rows must carry meta"
    # rows untouched since before the evolution read back as null
    assert_state_equal(state, oracle)


def test_metrics_lineage(spark, changes_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8)
    stats = r.run(changes_dir)
    m = r.read_metrics().toPandas()
    assert set(m.columns) == {
        "batch_id", "part_id", "events_in", "events_applied",
        "events_deduped", "watermark_lsn", "wall_ms",
    }
    delivered = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(changes_dir, "batch-*", "part-*.parquet"))
    )
    assert int(m["events_in"].sum()) == delivered == stats["events_in"]
    assert (m.groupby("part_id")["watermark_lsn"].max() > 0).all()


def test_salted_collapse_equivalent(spark, changes_dir, oracle, tmp_path):
    # two-phase salted collapse (for pathological hot keys) must be
    # semantically identical to the default single-phase algebraic form
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8, salt_buckets=16)
    r.run(changes_dir)
    assert_state_equal(_engine_state(r), oracle)


def test_compaction_preserves_state(spark, changes_dir, oracle, tmp_path):
    # force compaction after nearly every batch; final state must be
    # identical and delta debt must be folded into the base
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8,
                     compact_min_rows=1, compact_ratio=0.0)
    r.run(changes_dir)
    p = r.table.delta_pressure()
    assert p["delta_commits"] == 0, "compaction must fold all deltas"
    assert_state_equal(_engine_state(r), oracle)


def test_mor_resolution_without_compaction(spark, changes_dir, oracle, tmp_path):
    # never compact: the merge-on-read resolution alone must produce the
    # oracle state (tombstones filtered, highest commit wins per key)
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8,
                     compact_min_rows=10**12, compact_max_commits=10**6)
    r.run(changes_dir)
    assert r.table.delta_pressure()["delta_commits"] > 0
    assert_state_equal(_engine_state(r), oracle)


def test_async_compaction_preserves_state(spark, changes_dir, oracle, tmp_path):
    # background folds overlap subsequent batches; rebase keeps newer
    # deltas; final state must still equal the oracle
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8,
                     compact_min_rows=1, compact_ratio=0.0, async_compact=True)
    r.run(changes_dir)
    assert_state_equal(_engine_state(r), oracle)


def test_crash_mid_commit_is_invisible(spark, changes_dir, oracle, tmp_path, monkeypatch):
    """ACID: a crash AFTER delta files are written but BEFORE the manifest
    swap leaves orphan files only — table state unchanged, and the retried
    batch converges to the oracle (the reference's durability-ack chain,
    rfc/002-fault-tolerance/README.md:116-127)."""
    import glob

    from tenzir_spark.lake.table import LakeTable

    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    batches = sorted(glob.glob(os.path.join(changes_dir, "batch-*")))
    r.ensure_table()
    r.apply_batch(batches[0], 0)
    v_before = r.table.current_version()

    real_commit = LakeTable.commit

    def exploding_commit(self, *a, **k):
        raise RuntimeError("simulated crash before manifest swap")

    monkeypatch.setattr(LakeTable, "commit", exploding_commit)
    with pytest.raises(RuntimeError):
        r.apply_batch(batches[1], 1)
    monkeypatch.setattr(LakeTable, "commit", real_commit)

    # crash left no visible change
    assert r.table.current_version() == v_before
    # retry the batch, then the rest — identical final state
    for i, p in enumerate(batches[1:], start=1):
        r.apply_batch(p, i)
    assert_state_equal(_engine_state(r), oracle)


def test_rebatching_invariance(spark, tmp_path):
    """The SAME logical log delivered as 1, 3, or 8 micro-batches must
    produce the identical final table (micro-batch boundaries are an
    operational artifact, not a semantic one)."""
    states = []
    for nb in (1, 3, 8):
        d = str(tmp_path / f"chg_{nb}")
        generate_changes(d, n_events=6_000, n_docs=700, n_parts=4,
                         n_batches=nb, hot_doc_count=3, hot_frac=0.2)
        r = IngestRunner(spark, str(tmp_path / f"wh_{nb}"), n_buckets=8)
        r.run(d)
        states.append(_engine_state(r))
    assert_state_equal(states[0], states[1])
    assert_state_equal(states[0], states[2])


def test_extreme_hot_key_skew(spark, tmp_path):
    """60% of all events hitting ONE doc (pathological skew): algebraic
    partial aggregation must keep the collapse correct; result equals the
    oracle; salted variant agrees."""
    d = str(tmp_path / "chg_skew")
    generate_changes(d, n_events=10_000, n_docs=500, n_parts=4, n_batches=4,
                     hot_doc_count=1, hot_frac=0.6)
    oracle = naive_replay(d)
    r1 = IngestRunner(spark, str(tmp_path / "wh_plain"), n_buckets=8)
    r1.run(d)
    assert_state_equal(_engine_state(r1), oracle)
    r2 = IngestRunner(spark, str(tmp_path / "wh_salt"), n_buckets=8, salt_buckets=16)
    r2.run(d)
    assert_state_equal(_engine_state(r2), oracle)


def test_semijoin_collapse_mode_matches_oracle(spark, changes_dir, oracle, tmp_path):
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=8,
                     collapse_mode="semijoin")
    r.run(changes_dir)
    assert_state_equal(_engine_state(r), oracle)


def test_lineage_survives_cid_version_divergence(spark, changes_dir, tmp_path):
    """A noop-aborted redelivery burns a commit id without bumping the
    snapshot version; per-partition lineage for LATER batches must still
    be reported (regression: lineage matched on version, not cid)."""
    import glob

    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8)
    r.ensure_table()
    batches = sorted(glob.glob(os.path.join(changes_dir, "batch-*")))
    r.apply_batch(batches[0], 0)
    r.apply_batch(batches[0], 1)  # pure redelivery -> noop abort, burns a cid
    r.apply_batch(batches[1], 2)  # fresh batch AFTER the divergence
    m = r.read_metrics().toPandas()
    applied = m[m.batch_id == 2]["events_applied"].sum()
    assert applied > 0, "lineage must survive cid/version divergence"


def test_winners_stats_mode_matches_oracle(spark, changes_dir, oracle, tmp_path):
    """One-job stats mode: watermarks/lineage from the delta files' side
    channel columns, no second scan — final state must equal the oracle
    through replay, redelivery, and resume."""
    import glob

    wh = str(tmp_path / "wh")
    r = IngestRunner(spark, wh, n_buckets=8, stats_mode="winners")
    r.run(changes_dir)
    assert_state_equal(_engine_state(r), oracle)
    v = r.table.current_version()
    # full redelivery: noop (exactly-once)
    for i, p in enumerate(sorted(glob.glob(os.path.join(changes_dir, "batch-*")))):
        r.apply_batch(p, 200 + i)
    assert r.table.current_version() == v
    assert_state_equal(_engine_state(r), oracle)
    # resume over-replay from an earlier position
    r2 = IngestRunner(spark, wh, n_buckets=8, stats_mode="winners")
    r2.run(changes_dir, start_batch=2)
    assert_state_equal(_engine_state(r2), oracle)
    # watermarks identical to full mode's
    rf = IngestRunner(spark, str(tmp_path / "wh_full"), n_buckets=8, stats_mode="full")
    rf.run(changes_dir)
    assert r.watermarks() == rf.watermarks()


def test_winners_mode_single_action_per_batch(spark, changes_dir, tmp_path):
    """The point of winners mode: ONE pass over the batch (the
    collapse→write action; AQE materializes it as one job per query
    stage) — full mode additionally runs the side-thread stats scan.
    Measured via global job-id consumption, which covers all threads."""
    import glob

    batches = sorted(glob.glob(os.path.join(changes_dir, "batch-*")))
    sc = spark.sparkContext

    def probe_job_id(tag):
        sc.setJobGroup(tag, tag)
        spark.range(1).count()
        ids = sc.statusTracker().getJobIdsForGroup(tag)
        return max(ids)

    def jobs_consumed(runner, path, bid, tag):
        runner.finish_compaction()
        before = probe_job_id(f"{tag}-before")
        runner.apply_batch(path, bid)
        runner.finish_compaction()
        after = probe_job_id(f"{tag}-after")
        return after - before - 1

    rw = IngestRunner(spark, str(tmp_path / "whw"), n_buckets=8, stats_mode="winners")
    rw.ensure_table()
    rf = IngestRunner(spark, str(tmp_path / "whf"), n_buckets=8, stats_mode="full")
    rf.ensure_table()
    # batch 1 (batch 0 pays one-time schema/listing jobs)
    jobs_for = {}
    for tag, r in (("w", rw), ("f", rf)):
        r.apply_batch(batches[0], 0)
        jobs_for[tag] = jobs_consumed(r, batches[1], 1, tag)
    assert jobs_for["w"] < jobs_for["f"], (
        f"winners mode must consume fewer jobs ({jobs_for})")


def _mini_batch(spark, rows):
    """(part_id, lsn, op, doc_id, n_tok) rows → a change-batch DataFrame
    with the full control + base payload schema."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ])
    data = [(p, lsn, 0, op, d, [n, n + 1], n, "s") for p, lsn, op, d, n in rows]
    return spark.createDataFrame(data, schema)


def test_winners_exact_watermarks_nonkeyed_routing(spark, tmp_path):
    """Keys straddling partitions: partition 0's max-lsn event (A,5) loses
    key A to partition 1's (A,10), so the winner-derived watermark misses
    part 0 entirely. The observed-metrics watermark must still record the
    TRUE per-partition delivered max, and a redelivery of (A,5) must be a
    noop — the exactly-once contract without the keyed-routing assumption."""
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4,
                     stats_mode="winners", exact_watermarks=True)
    r.ensure_table()
    r.apply_batch_df(_mini_batch(spark, [
        (0, 5, "upsert", "A", 50),
        (1, 10, "upsert", "A", 100),
        (1, 3, "upsert", "B", 30),
    ]), 0)
    assert r.watermarks() == {"0": 5, "1": 10}
    v = r.table.current_version()
    # stale straddling event redelivered alone: must NOT re-apply
    r.apply_batch_df(_mini_batch(spark, [(0, 5, "upsert", "A", 50)]), 1)
    assert r.table.current_version() == v
    state = {row["doc_id"]: row["n_tok"] for row in r.final_state().collect()}
    assert state == {"A": 100, "B": 30}
    # the control: winner-derived watermarks (exact_watermarks=False)
    # genuinely miss part 0 here — proves the observed path is load-bearing
    r2 = IngestRunner(spark, str(tmp_path / "wh2"), n_buckets=4,
                      stats_mode="winners", exact_watermarks=False)
    r2.ensure_table()
    r2.apply_batch_df(_mini_batch(spark, [
        (0, 5, "upsert", "A", 50),
        (1, 10, "upsert", "A", 100),
        (1, 3, "upsert", "B", 30),
    ]), 0)
    assert "0" not in r2.watermarks()


def test_winners_exact_watermarks_new_partition_fallback(spark, tmp_path):
    """A partition first seen mid-stream isn't in the observed expression
    list — the catch-all must detect it and the fallback agg must record
    its exact watermark (deletes count too)."""
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4,
                     stats_mode="winners", exact_watermarks=True)
    r.ensure_table()
    r.apply_batch_df(_mini_batch(spark, [
        (0, 1, "upsert", "A", 10),
        (0, 2, "upsert", "B", 20),
    ]), 0)
    assert r.watermarks() == {"0": 2}
    # part 7 appears; its max-lsn event (C,31) loses to part 0's (C,40)
    r.apply_batch_df(_mini_batch(spark, [
        (7, 30, "upsert", "D", 5),
        (7, 31, "upsert", "C", 7),
        (0, 40, "upsert", "C", 70),
    ]), 1)
    assert r.watermarks() == {"0": 40, "7": 31}
    state = {row["doc_id"]: row["n_tok"] for row in r.final_state().collect()}
    assert state == {"A": 10, "B": 20, "C": 70, "D": 5}


def test_winners_exact_watermarks_over_partition_cap(spark, tmp_path,
                                                     monkeypatch):
    """With more known partitions than EXACT_WM_MAX_PARTS the observed
    expression list is skipped, but exactness must NOT degrade to the
    keyed-routing assumption — the slim per-batch agg takes over."""
    from tenzir_spark.cdc import runner as runner_mod

    monkeypatch.setattr(runner_mod, "EXACT_WM_MAX_PARTS", 1)
    r = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4,
                     stats_mode="winners", exact_watermarks=True)
    r.ensure_table()
    r.apply_batch_df(_mini_batch(spark, [
        (0, 1, "upsert", "A", 10),
        (1, 2, "upsert", "B", 20),
    ]), 0)
    assert r.watermarks() == {"0": 1, "1": 2}
    # two known partitions > cap of 1 → slim-agg path; part 0's max-lsn
    # event (A,5) loses key A to part 1's (A,10), so winner lsns would
    # miss part 0 — the slim agg must still record it
    r.apply_batch_df(_mini_batch(spark, [
        (0, 5, "upsert", "A", 50),
        (1, 10, "upsert", "A", 100),
    ]), 1)
    assert r.watermarks() == {"0": 5, "1": 10}
    v = r.table.current_version()
    r.apply_batch_df(_mini_batch(spark, [(0, 5, "upsert", "A", 50)]), 2)
    assert r.table.current_version() == v
    state = {row["doc_id"]: row["n_tok"] for row in r.final_state().collect()}
    assert state == {"A": 100, "B": 20}


def test_randomized_nonkeyed_stream_matches_oracle(spark, tmp_path):
    """Adversarial sweep: a dense global WAL with random NON-KEYED
    routing (keys straddle partitions freely), 15% deletes, random batch
    cut points, within-batch shuffling, probabilistic full-batch
    redeliveries and a mid-stream crash (new runner over the same
    warehouse re-delivering its last batch). Final state must equal the
    in-lsn-order oracle in BOTH exact configurations: full stats mode,
    and winners mode with exact_watermarks (the non-keyed-safe variant)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        n_events, n_parts = 600, 5
        docs = [f"d{i}" for i in range(40)]
        events = []
        for lsn in range(n_events):
            part = rng.randrange(n_parts)
            doc = rng.choice(docs)
            if rng.random() < 0.15:
                events.append((part, lsn, "delete", doc, 0))
            else:
                events.append((part, lsn, "upsert", doc,
                               rng.randrange(1, 500)))
        oracle_state: dict[str, int] = {}
        for _part, _lsn, op, doc, n in events:
            if op == "delete":
                oracle_state.pop(doc, None)
            else:
                oracle_state[doc] = n
        cuts = sorted(rng.sample(range(1, n_events), 4))
        batches = [events[a:b] for a, b in zip([0] + cuts, cuts + [n_events])]

        for mode_kw in ({"stats_mode": "winners", "exact_watermarks": True},
                        {"stats_mode": "full"}):
            wh = str(tmp_path / f"wh_{seed}_{mode_kw['stats_mode']}")
            r = IngestRunner(spark, wh, n_buckets=4, **mode_kw)
            r.ensure_table()
            bid = 0
            for i, b in enumerate(batches):
                rows = b[:]
                rng.shuffle(rows)
                r.apply_batch_df(_mini_batch(spark, rows), bid)
                bid += 1
                if rng.random() < 0.4:  # broker redelivers the batch
                    r.apply_batch_df(_mini_batch(spark, rows), bid)
                    bid += 1
                if i == 2:  # crash: fresh runner, re-deliver last batch
                    r = IngestRunner(spark, wh, n_buckets=4, **mode_kw)
                    r.apply_batch_df(_mini_batch(spark, rows), bid)
                    bid += 1
            got = {row["doc_id"]: row["n_tok"]
                   for row in r.final_state().collect()}
            assert got == oracle_state, (seed, mode_kw)


def test_dlq_quarantines_null_key_events(spark, tmp_path):
    """With dlq=True a fresh data event without a primary key lands in
    <warehouse>/<table>_dlq/batch=<id>/ (full envelope, operator-replayable
    after repair) instead of vanishing; clean batches leave no directory,
    and redelivered stale null-key events are NOT re-quarantined."""
    import os

    import pyspark.sql.types as T

    from tenzir_spark.cdc.runner import IngestRunner

    runner = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4, dlq=True)
    runner.ensure_table()
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    rows = [("d1", [1], 1, "web", "insert", 0, 0),
            (None, [2], 1, "web", "insert", 0, 1),
            (None, None, None, None, "delete", 0, 2),
            ("d9", [9], 1, "web", None, 0, 5),  # null OP, keyed: un-appliable
            ("d2", [3], 1, "web", "insert", 0, 3)]
    st = runner.apply_batch_df(spark.createDataFrame(rows, ev_schema), 0)
    assert st["dlq_rejected"] == 3
    dlq_dir = str(tmp_path / "wh" / "corpus_dlq" / "batch=0")
    got = spark.read.parquet(dlq_dir)
    assert got.count() == 3
    assert {r["lsn"] for r in got.collect()} == {1, 2, 5}
    assert "op" in got.columns  # full envelope kept for replay
    # applied table has only the keyed rows
    assert {r["doc_id"] for r in runner.table.read(spark).collect()} == {"d1", "d2"}

    # clean batch: no quarantine dir
    st2 = runner.apply_batch_df(spark.createDataFrame(
        [("d3", [4], 1, "web", "insert", 0, 4)], ev_schema), 1)
    assert st2["dlq_rejected"] == 0
    assert not os.path.exists(str(tmp_path / "wh" / "corpus_dlq" / "batch=1"))

    # pure redelivery of batch 0: stale null-key events are below the
    # watermark (not fresh) and must not be re-quarantined
    runner.apply_batch_df(spark.createDataFrame(rows, ev_schema), 0)
    assert runner._last_dlq_count == 0
    # ... and the replay did NOT destroy the original quarantine
    assert spark.read.parquet(dlq_dir).count() == 3


def test_metrics_rollup_bounds_file_count(spark, tmp_path):
    """Per-batch metric files fold into one once the count crosses the
    threshold — file count stays O(1) with batch count, rows intact;
    a batch redelivered after a fold resolves keep-last at the next fold
    (same replace semantics as the un-folded layout)."""
    import os

    import pyspark.sql.types as T

    from tenzir_spark.cdc.runner import IngestRunner

    runner = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4)
    runner.ensure_table()
    runner.metrics_rollup_files = 3
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    for b in range(6):
        runner.apply_batch_df(spark.createDataFrame(
            [(f"d{b}", [b], 1, "web", "insert", 0, b)], ev_schema), b)
    files = [f for f in os.listdir(runner.metrics_dir) if f.endswith(".parquet")]
    assert len(files) <= 4, files  # folded, not one per batch
    m = runner.read_metrics()
    assert m.count() == 6  # one (batch, part) row per batch, none lost
    assert {r["batch_id"] for r in m.collect()} == set(range(6))
    assert all(r["events_in"] == 1 for r in m.collect())

    # redeliver batch 0 (stale) -> overwrites/duplicates transiently;
    # after the next fold the newest attempt wins and the count is stable
    runner.apply_batch_df(spark.createDataFrame(
        [(f"d0", [0], 1, "web", "insert", 0, 0)], ev_schema), 0)
    runner._rollup_metrics(
        [f for f in os.listdir(runner.metrics_dir) if f.endswith(".parquet")])
    m2 = runner.read_metrics()
    assert m2.count() == 6
    redel = m2.filter("batch_id = 0").first()
    assert redel["events_applied"] == 0  # the redelivery attempt's row won


def test_maintenance_features_are_semantics_neutral(spark, tmp_path):
    """Integration soak: the SAME change log ingested (a) with engine
    defaults and (b) with every maintenance feature on — snapshot
    retention, DLQ, async compaction, key-sorted folds, low fold
    thresholds — must produce the IDENTICAL final table (row-level,
    token-array equality). Maintenance is operability machinery; it may
    never touch the exactly-once result. Also proves retention actually
    bounds the manifest count under real ingest."""
    from tenzir_spark.cdc.changegen import generate_changes
    from tenzir_spark.cdc.runner import IngestRunner

    chg = str(tmp_path / "chg")
    generate_changes(chg, n_events=60_000, n_docs=4_000, n_parts=4,
                     n_batches=6, schema_change_batch=3)

    plain = IngestRunner(spark, str(tmp_path / "wh_plain"), n_buckets=8)
    plain.run(chg)

    maxed = IngestRunner(
        spark, str(tmp_path / "wh_maxed"), n_buckets=8,
        compact_min_rows=5_000, compact_max_commits=2,
        async_compact=True, retain_snapshots=2, sorted_compaction=True,
        dlq=True, stats_mode="winners",
    )
    maxed.run(chg)
    maxed.finish_compaction()

    def fingerprint(runner):
        df = runner.table.read(spark)
        cols = sorted(c for c in df.columns if not c.startswith("_"))
        return sorted(tuple(r[c] if not isinstance(r[c], list) else tuple(r[c])
                            for c in cols)
                      for r in df.collect())

    assert fingerprint(plain) == fingerprint(maxed)
    # retention really bounded history (plain retains one per commit)
    assert len(maxed.table.versions()) < len(plain.table.versions())
    # clean generated log: nothing quarantined
    import os

    assert not os.path.exists(str(tmp_path / "wh_maxed" / "corpus_dlq"))


def test_dlq_dedupes_redelivered_rejects(spark, tmp_path):
    """Winners-mode watermarks track winner LSNs only, so a rejected
    event holding a partition's max LSN is redelivered FRESH every time —
    the quarantine dedupes by (part_id, lsn): one copy, however many
    delivery attempts carry it."""
    import pyspark.sql.types as T

    from tenzir_spark.cdc.runner import IngestRunner

    runner = IngestRunner(spark, str(tmp_path / "wh"), n_buckets=4,
                          dlq=True, stats_mode="winners")
    runner.ensure_table()
    ev_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
    ])
    rows = [("d1", [1], 1, "web", "insert", 0, 0),
            (None, [9], 1, "web", "insert", 0, 5)]  # max LSN, null key
    df = spark.createDataFrame(rows, ev_schema)
    runner.apply_batch_df(df, 0)
    assert runner._last_dlq_count == 1
    # watermark covers only the winner (lsn 0) -> redelivery finds the
    # reject fresh again; the quarantine must not grow
    assert runner.watermarks() == {"0": 0}
    st2 = runner.apply_batch_df(df, 0)
    assert runner._last_dlq_count == 0  # nothing NEW quarantined
    # …but the batch still CARRIED a malformed event — the in-batch
    # counter reports it so a redelivery doesn't read as clean
    assert st2["dlq_rejected"] == 0 and st2["dlq_in_batch"] == 1
    dlq = spark.read.parquet(str(tmp_path / "wh" / "corpus_dlq" / "batch=0"))
    assert dlq.count() == 1 and dlq.first()["lsn"] == 5
