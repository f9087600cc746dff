"""Structured Streaming CDC ingest: stream-drain equals oracle; restart
with a fresh checkpoint (full source replay) is idempotent."""

import pyspark.sql.types as T
import pytest

from tenzir_spark.cdc.changegen import generate_changes
from tenzir_spark.cdc.oracle import naive_replay
from tenzir_spark.streaming import stream_ingest
from tenzir_spark.streaming.ingest import change_stream_schema

from tests.util import assert_state_equal


@pytest.fixture(scope="module")
def changes_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_changes"))
    generate_changes(d, n_events=6_000, n_docs=700, n_parts=4, n_batches=6,
                     schema_change_batch=4, hot_doc_count=3, hot_frac=0.2)
    return d


@pytest.fixture(scope="module")
def oracle(changes_dir):
    return naive_replay(changes_dir)


SCHEMA = change_stream_schema(
    extra_fields=[T.StructField("meta", T.StringType(), True)]
)


def _final(q):
    return q._tenzir_runner.final_state().toPandas()


def test_stream_drain_matches_oracle(spark, changes_dir, oracle, tmp_path):
    q = stream_ingest(spark, changes_dir, str(tmp_path / "wh"), schema=SCHEMA,
                      max_files_per_trigger=5,
                      runner_kwargs={"n_buckets": 8})
    q.awaitTermination()
    assert_state_equal(_final(q), oracle)


def test_stream_restart_fresh_checkpoint_idempotent(spark, changes_dir, oracle, tmp_path):
    wh = str(tmp_path / "wh")
    q1 = stream_ingest(spark, changes_dir, wh, schema=SCHEMA,
                       runner_kwargs={"n_buckets": 8})
    q1.awaitTermination()
    v = q1._tenzir_runner.table.current_version()
    # fresh checkpoint dir → Spark replays the WHOLE source; LSN watermarks
    # must make every re-applied micro-batch a no-op
    q2 = stream_ingest(spark, changes_dir, wh, schema=SCHEMA,
                       checkpoint_dir=str(tmp_path / "ckpt2"),
                       runner_kwargs={"n_buckets": 8})
    q2.awaitTermination()
    assert q2._tenzir_runner.table.current_version() == v
    assert_state_equal(_final(q2), oracle)


def test_stream_incremental_tail(spark, oracle, tmp_path):
    """New batch directories appearing AFTER the first drain are picked up
    by a second availableNow pass over the same checkpoint (the tail)."""
    import shutil

    src = str(tmp_path / "grow_changes")
    generate_changes(src, n_events=6_000, n_docs=700, n_parts=4, n_batches=6,
                     schema_change_batch=4, hot_doc_count=3, hot_frac=0.2)
    # hide the last two batches, drain, then reveal them and drain again
    hidden = str(tmp_path / "hidden")
    import os

    os.makedirs(hidden)
    for b in ("batch-00004", "batch-00005"):
        shutil.move(os.path.join(src, b), os.path.join(hidden, b))
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    q1 = stream_ingest(spark, src, wh, schema=SCHEMA, checkpoint_dir=ckpt,
                       runner_kwargs={"n_buckets": 8})
    q1.awaitTermination()
    for b in ("batch-00004", "batch-00005"):
        shutil.move(os.path.join(hidden, b), os.path.join(src, b))
    q2 = stream_ingest(spark, src, wh, schema=SCHEMA, checkpoint_dir=ckpt,
                       runner_kwargs={"n_buckets": 8})
    q2.awaitTermination()
    assert_state_equal(_final(q2), naive_replay(src))
