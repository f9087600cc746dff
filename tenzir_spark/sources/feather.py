"""Arrow IPC / Feather reader+writer (reference: the feather format
plugin persists/loads Arrow IPC files, libtenzir/builtins/formats —
the reference's own store format).

Spark has no native Arrow-IPC file source, so this is a DISTRIBUTED
reader built from public pieces: the binaryFile source lists + ships the
files, and a ``mapInPandas`` stage decodes each file with pyarrow inside
the executors (Arrow→pandas→Arrow round trip; zero per-row Python). Good
for the many-small-files shape Arrow IPC is used for; a single giant IPC
file would need record-batch-range splitting (documented limitation —
parquet remains the storage format of the lake).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_feather(df: DataFrame, path: str, compression: str = "zstd") -> list[str]:
    """Write ~one .feather (Arrow IPC) file per Arrow batch — an
    executor-side ``mapInPandas`` stage (rows travel as Arrow buffers,
    never through per-row Python); returns the written file names."""
    import os

    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        import pyarrow as pa
        import pyarrow.feather as pf

        for pdf in batches:
            if not len(pdf):
                continue
            fn = f"{path}/part-{uuid.uuid4().hex}.feather"
            pf.write_feather(pa.Table.from_pandas(pdf, preserve_index=False),
                             fn, compression=compression)
            yield pd.DataFrame({"file": [fn]})

    return [r["file"] for r in df.mapInPandas(_write, "file string").collect()]


def read_feather(spark: SparkSession, path: str,
                 schema: T.StructType | str | None = None) -> DataFrame:
    """Distributed Arrow IPC read: binaryFile scan → per-file pyarrow
    decode in ``mapInPandas``. ``schema`` is required for an empty glob;
    otherwise it is inferred from the first file (driver-side footer
    read, no data)."""
    import glob as _glob

    import pyarrow.feather as pf

    if schema is None:
        first = sorted(
            _glob.glob(f"{path}/*.feather") + _glob.glob(f"{path}/*.arrow")
            + ([path] if path.endswith((".feather", ".arrow")) else [])
        )
        if not first:
            raise ValueError(f"no feather files under {path} and no schema given")
        from pyspark.sql.pandas.types import from_arrow_schema

        probe = pf.read_table(first[0])
        schema = from_arrow_schema(probe.schema)

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{feather,arrow}" if not path.endswith(
            (".feather", ".arrow")) else "*")
        .load(path)
        .select("content")
    )

    names = [f.name for f in schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                tbl = pf.read_table(io.BytesIO(bytes(blob)))
                out = tbl.to_pandas()
                yield out[names]

    return binary.mapInPandas(decode, schema)
