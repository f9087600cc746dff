"""The ``python`` operator — user Python over events, vectorized.

Reference: builtins/operators/python.cpp (524 LoC) + the
python-side executor (python/tenzir/tools/python_operator_executor.py),
documented in web/docs/operators/python.md: user code sees an implicit
``self`` representing the event, mutates fields via ``self.a = ...``,
adds fields by assignment, removes them with ``del self.a`` — and runs
**row at a time** ("applies the provided Python code to each input row
one by one", python.md:30-35).

Spark-first re-expression keeps the exact ``self.field`` surface but
binds ``self`` to a *vectorized* event batch: attribute reads return the
column as a pandas Series, assignments set whole columns (pandas
broadcasting makes ``self.x = self.a * 2`` and ``self.tag = "hi"`` both
work unchanged), ``del`` drops a column. One ``exec`` per Arrow batch —
thousands of events per Python invocation instead of one — which is the
mandated UDF shape for this engine (no per-row Python in any path).

Output schema: explicit DDL wins; otherwise it is inferred by running
the SAME code once, driver-side, over a small sampled prototype batch
(deterministic, bounded). The reference's ``--requirements`` venv
machinery is environment management, not query semantics — this sandbox
has a fixed interpreter, so a non-empty ``requirements`` raises.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class _EventBatch:
    """The ``self`` object user code sees: a vectorized event.

    ``self.a`` -> pandas Series of field ``a`` (AttributeError if
    absent, like the reference's missing-field diagnostic);
    ``self.a = <series|scalar>`` upserts the field; ``del self.a``
    drops it. Column order: existing fields in place, added fields
    appended in assignment order (python.md's add-field semantics).
    """

    __slots__ = ("_pdf",)

    def __init__(self, pdf: pd.DataFrame):
        object.__setattr__(self, "_pdf", pdf)

    def __getattr__(self, name: str):
        try:
            return self._pdf[name]
        except KeyError:
            raise AttributeError(f"event has no field {name!r}") from None

    def __setattr__(self, name: str, value) -> None:
        self._pdf[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self._pdf[name]
        except KeyError:
            raise AttributeError(f"event has no field {name!r}") from None


def _run_code(compiled, pdf: pd.DataFrame) -> pd.DataFrame:
    import math

    import numpy as np

    ev = _EventBatch(pdf)
    # the executor exposes the common numerics modules, mirroring the
    # reference's implicit imports in its venv
    exec(compiled, {"self": ev, "pd": pd, "np": np, "math": math})
    return ev._pdf


_DTYPE_TO_SPARK = {
    "int8": T.ByteType, "int16": T.ShortType, "int32": T.IntegerType,
    "int64": T.LongType, "float32": T.FloatType, "float64": T.DoubleType,
    "bool": T.BooleanType, "boolean": T.BooleanType,
    "datetime64[ns]": T.TimestampType, "datetime64[us]": T.TimestampType,
}


def _infer_schema(sample: pd.DataFrame) -> T.StructType:
    fields = []
    for name in sample.columns:
        s = sample[name]
        tname = str(s.dtype)
        if tname in _DTYPE_TO_SPARK:
            t = _DTYPE_TO_SPARK[tname]()
        else:
            vals = s.dropna()
            v = vals.iloc[0] if len(vals) else ""
            if isinstance(v, bool):
                t = T.BooleanType()
            elif isinstance(v, int):
                t = T.LongType()
            elif isinstance(v, float):
                t = T.DoubleType()
            elif isinstance(v, (bytes, bytearray)):
                t = T.BinaryType()
            elif isinstance(v, (list, tuple)):
                t = T.ArrayType(T.StringType())
            else:
                t = T.StringType()
        fields.append(T.StructField(name, t))
    return T.StructType(fields)


def python_transform(df: DataFrame, code: str,
                     schema: T.StructType | str | None = None,
                     requirements: str = "",
                     sample_rows: int = 100) -> DataFrame:
    """Apply ``code`` (the reference's ``python "<code>"`` stage) to every
    event, vectorized per Arrow batch. ``schema`` is the OUTPUT schema
    (DDL or StructType); when omitted it is inferred by executing the
    code over ``sample_rows`` driver-side sample rows."""
    if requirements:
        raise NotImplementedError(
            "python --requirements needs a venv-managed interpreter; this "
            "engine runs a fixed interpreter (python.md's create-venvs "
            "machinery is node configuration, not pipeline semantics)")
    compiled = compile(code, "<python operator>", "exec")

    if schema is None:
        sample = df.limit(sample_rows).toPandas()
        schema = _infer_schema(_run_code(compiled, sample))
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _run_code(compiled, pdf)
            yield out[names]

    return df.mapInPandas(_apply, schema)
