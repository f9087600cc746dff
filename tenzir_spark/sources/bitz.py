"""BITZ — the engine's internal wire format (reference:
libtenzir/builtins/formats/bitz.cpp:9-67 — a size-prefixed dump of the
engine's wire representation; 8-byte network-order length header, then
one serialized record-batch message; web/docs/formats/bitz.md documents
it as "a thin wrapper around Arrow's record batches" for lossless
node-to-node transfer).

Re-expressed Spark-first: the payload of each frame is an Arrow IPC
stream carrying ONE record batch (this engine's wire representation —
the reference's payload is its own FlatBuffers table and is documented
as version-unstable, so byte-compatibility is a non-goal; frame layout
parity is the contract). A bitz stream is therefore:

    [u64 big-endian payload length][Arrow IPC stream bytes] ...repeated

Writer: ``mapInPandas`` — each executor appends one frame per Arrow
batch into its own part file (rows never pass per-row Python). Reader:
``binaryFile`` scan ships whole files to executors; a ``mapInPandas``
stage walks the frames with pyarrow. Files are the unit of parallelism
(same shape as the feather reader — bitz is a transfer format for
many smallish messages, not a storage format).
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_HDR = struct.Struct(">Q")  # network byte order, like the reference


def _encode_frames(table) -> bytes:
    """Serialize each record batch of an Arrow table as one bitz frame."""
    import pyarrow as pa

    out = io.BytesIO()
    for batch in table.to_batches():
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        payload = sink.getvalue()
        out.write(_HDR.pack(len(payload)))
        out.write(payload)
    return out.getvalue()


def decode_frames(blob: bytes) -> list:
    """Parse a bitz byte stream into Arrow tables (one per frame).
    Raises ValueError on a truncated header or payload, mirroring the
    reference's unexpected-length diagnostics (bitz.cpp:46-63)."""
    import pyarrow as pa

    tables, pos, n = [], 0, len(blob)
    while pos < n:
        if n - pos < _HDR.size:
            raise ValueError(f"unexpected BITZ header length {n - pos}")
        (length,) = _HDR.unpack_from(blob, pos)
        pos += _HDR.size
        if n - pos < length:
            raise ValueError(
                f"unexpected message length {n - pos}, expected {length}")
        with pa.ipc.open_stream(pa.BufferReader(blob[pos:pos + length])) as r:
            tables.append(r.read_all())
        pos += length
    return tables


def write_bitz(df: DataFrame, path: str) -> list[str]:
    """Write ``df`` as bitz part files (one file per executor partition,
    one frame per Arrow batch); returns the written file names."""
    import os

    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        import pyarrow as pa

        fn = None
        fh = None
        for pdf in batches:
            if not len(pdf):
                continue
            if fh is None:
                fn = f"{path}/part-{uuid.uuid4().hex}.bitz"
                fh = open(fn, "wb")
            fh.write(_encode_frames(pa.Table.from_pandas(
                pdf, preserve_index=False)))
        if fh is not None:
            fh.close()
            yield pd.DataFrame({"file": [fn]})

    return [r["file"] for r in df.mapInPandas(_write, "file string").collect()]


def read_bitz(spark: SparkSession, path: str,
              schema: T.StructType | str | None = None) -> DataFrame:
    """Distributed bitz read: binaryFile scan → per-file frame walk in
    ``mapInPandas``. ``schema`` is inferred from the first frame of the
    first file when omitted (driver-side probe, reads one frame)."""
    import glob as _glob

    if schema is None:
        first = sorted(
            _glob.glob(f"{path}/*.bitz")
            + ([path] if path.endswith(".bitz") else []))
        if not first:
            raise ValueError(f"no bitz files under {path} and no schema given")
        from pyspark.sql.pandas.types import from_arrow_schema

        with open(first[0], "rb") as fh:
            hdr = fh.read(_HDR.size)
            (length,) = _HDR.unpack(hdr)
            probe = decode_frames(hdr + fh.read(length))[0]
        schema = from_arrow_schema(probe.schema)

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter",
                "*.bitz" if not path.endswith(".bitz") else "*")
        .load(path)
        .select("content")
    )
    names = [f.name for f in schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                for tbl in decode_frames(bytes(blob)):
                    yield tbl.to_pandas()[names]

    return binary.mapInPandas(decode, schema)
