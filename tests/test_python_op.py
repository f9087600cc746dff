"""`python` operator tests — vectorized self-batch semantics."""

import pytest
from pyspark.sql import Row, functions as F

from tenzir_spark.operators.python_op import python_transform


def _df(spark):
    return spark.createDataFrame(
        [Row(a=i, b=float(i) / 2, s=f"v{i}") for i in range(200)])


def test_python_modify_add_delete(spark):
    out = python_transform(
        _df(spark),
        "self.c = self.a * 10 + 1\n"
        "self.s = self.s.str.upper()\n"
        "del self.b\n",
        schema="a long, s string, c long")
    rows = {r["a"]: r for r in out.collect()}
    assert rows[3]["c"] == 31 and rows[3]["s"] == "V3"
    assert "b" not in out.columns


def test_python_scalar_broadcast_and_inferred_schema(spark):
    out = python_transform(
        _df(spark),
        "self.tag = 'hello'\n"
        "self.half = self.a // 2\n")
    assert dict(out.dtypes)["tag"] == "string"
    assert dict(out.dtypes)["half"] == "bigint"
    assert out.filter(F.col("tag") == "hello").count() == 200
    assert out.filter(F.col("half") == F.col("a") - F.col("half")).count() >= 100


def test_python_missing_field_and_requirements(spark):
    with pytest.raises(Exception, match="no field"):
        python_transform(_df(spark), "self.x = self.nope + 1").collect()
    with pytest.raises(NotImplementedError):
        python_transform(_df(spark), "pass", requirements="requests")


def test_python_numpy_vectorized(spark):
    out = python_transform(
        _df(spark),
        "self.lg = np.log1p(self.b)\n"
        "self.r = np.where(self.a % 2 == 0, 'even', 'odd')\n")
    r = out.filter(F.col("a") == 4).first()
    import math

    assert abs(r["lg"] - math.log1p(2.0)) < 1e-9 and r["r"] == "even"


def test_python_pipeline_stage(spark):
    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = _df(spark)
    out = run_tql(
        df,
        'python "self.d = self.a + 7" | where d >= 200 | select a, d')
    assert out.count() == 7
    with pytest.raises(TqlError):
        run_tql(df, "python")

    out2 = run_tql(
        df,
        'python "self.e = self.b * 4" --schema "a long, e double" '
        "| select a, e")
    assert out2.first()["e"] == pytest.approx(out2.first()["a"] * 2.0)
