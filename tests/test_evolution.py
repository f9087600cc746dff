"""Type-widening schema evolution: a batch whose existing column WIDENED
(int->long, float->double, array<int>->array<long>) must widen the table
schema along the numeric lattice (reference: cast.hpp:28-56) instead of
silently downcasting values into the old type; non-widening changes raise;
narrower batches upcast losslessly; replay invariance holds across an
evolution."""

import pytest
from pyspark.sql import types as T

from tenzir_spark.cdc.runner import BASE_PAYLOAD_SCHEMA, IngestRunner, widen_type

BIG = 3_000_000_000  # > 2^31: truncates if silently downcast to int


def _envelope(payload_fields):
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("epoch", T.IntegerType(), True),
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("op", T.StringType(), False),
        ]
        + payload_fields
    )


NARROW = _envelope(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)
WIDE = _envelope(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.LongType()), True),
        T.StructField("n_tok", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _runner(spark, tmp_path, name="wh"):
    r = IngestRunner(spark, str(tmp_path / name), n_buckets=4)
    r.ensure_table()
    return r


def test_widen_type_lattice():
    assert widen_type(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen_type(T.LongType(), T.IntegerType()) == T.LongType()
    assert widen_type(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widen_type(T.ByteType(), T.ShortType()) == T.ShortType()
    assert widen_type(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())
    ) == T.ArrayType(T.LongType(), True)
    assert widen_type(T.IntegerType(), T.DoubleType()) == T.DoubleType()
    assert widen_type(T.DoubleType(), T.LongType()) == T.DoubleType()
    with pytest.raises(TypeError):
        widen_type(T.IntegerType(), T.StringType())
    with pytest.raises(TypeError):
        widen_type(T.ArrayType(T.IntegerType()), T.StringType())


def test_int_to_long_widens_and_preserves_values(spark, tmp_path):
    r = _runner(spark, tmp_path)
    r.apply_batch_df(
        spark.createDataFrame([(0, 0, 0, "insert", "a", [1, 2], 2, "s0")], NARROW), 0
    )
    # widened batch: value only representable in int64
    r.apply_batch_df(
        spark.createDataFrame(
            [(1, 0, 0, "insert", "b", [BIG, 5], BIG, "s0")], WIDE
        ),
        1,
    )
    sch = r.table.schema()
    assert sch["n_tok"].dataType == T.LongType()
    assert sch["tokens"].dataType == T.ArrayType(T.LongType(), True)
    state = {row["doc_id"]: row for row in r.final_state().collect()}
    assert state["b"]["n_tok"] == BIG
    assert state["b"]["tokens"] == [BIG, 5]
    # pre-evolution rows read back unchanged under the widened schema
    assert state["a"]["n_tok"] == 2 and state["a"]["tokens"] == [1, 2]


def test_float_to_double_widens(spark, tmp_path):
    r = _runner(spark, tmp_path)
    f32 = _envelope(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("score", T.FloatType(), True),
        ]
    )
    f64 = _envelope(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    r.apply_batch_df(spark.createDataFrame([(0, 0, 0, "insert", "a", 1.5)], f32), 0)
    r.apply_batch_df(
        spark.createDataFrame([(1, 0, 0, "insert", "b", 1e300)], f64), 1
    )
    assert r.table.schema()["score"].dataType == T.DoubleType()
    state = {row["doc_id"]: row for row in r.final_state().collect()}
    assert state["b"]["score"] == 1e300
    assert state["a"]["score"] == 1.5


def test_narrower_batch_upcasts_without_narrowing(spark, tmp_path):
    r = _runner(spark, tmp_path)
    r.apply_batch_df(
        spark.createDataFrame([(0, 0, 0, "insert", "a", [BIG], BIG, "s0")], WIDE), 0
    )
    # a later narrow batch must NOT narrow the table back
    r.apply_batch_df(
        spark.createDataFrame([(1, 0, 0, "insert", "c", [3], 3, "s0")], NARROW), 1
    )
    sch = r.table.schema()
    assert sch["n_tok"].dataType == T.LongType()
    state = {row["doc_id"]: row for row in r.final_state().collect()}
    assert state["a"]["n_tok"] == BIG and state["c"]["n_tok"] == 3


def test_non_widening_change_rejected(spark, tmp_path):
    r = _runner(spark, tmp_path)
    r.apply_batch_df(
        spark.createDataFrame([(0, 0, 0, "insert", "a", [1], 1, "s0")], NARROW), 0
    )
    bad = _envelope(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.StringType(), True),
        ]
    )
    with pytest.raises(TypeError, match="incompatible schema change"):
        r.apply_batch_df(
            spark.createDataFrame([(1, 0, 0, "insert", "b", "oops")], bad), 1
        )
    # the rejected batch must leave no trace: schema and state unchanged
    assert r.table.schema()["n_tok"].dataType == T.IntegerType()
    assert {row["doc_id"] for row in r.final_state().collect()} == {"a"}


def test_replay_across_widening_is_idempotent(spark, tmp_path):
    r = _runner(spark, tmp_path)
    b0 = spark.createDataFrame([(0, 0, 0, "insert", "a", [1], 1, "s0")], NARROW)
    b1 = spark.createDataFrame([(1, 0, 0, "insert", "b", [BIG], BIG, "s0")], WIDE)
    r.apply_batch_df(b0, 0)
    r.apply_batch_df(b1, 1)
    v = r.table.current_version()
    # full redelivery (incl. the pre-widening batch) must be a pure noop
    r.apply_batch_df(b0, 100)
    r.apply_batch_df(b1, 101)
    assert r.table.current_version() == v
    state = {row["doc_id"]: row for row in r.final_state().collect()}
    assert state["b"]["n_tok"] == BIG and state["a"]["n_tok"] == 1
