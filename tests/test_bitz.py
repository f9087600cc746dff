"""BITZ wire-format round-trip + frame-codec unit checks."""

import struct

import pytest
from pyspark.sql import Row


def test_bitz_roundtrip(spark, tmp_path):
    from tenzir_spark.sources.bitz import read_bitz, write_bitz

    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", n=i, score=i / 3.0) for i in range(400)]
    ).repartition(4)
    files = write_bitz(df, str(tmp_path / "bz"))
    assert len(files) >= 1 and all(f.endswith(".bitz") for f in files)

    back = read_bitz(spark, str(tmp_path / "bz"))
    assert back.count() == 400
    a = sorted((r["doc_id"], r["n"], round(r["score"], 6)) for r in back.collect())
    b = sorted((r["doc_id"], r["n"], round(r["score"], 6)) for r in df.collect())
    assert a == b


def test_bitz_frame_layout_and_errors(tmp_path):
    """Frame = u64 big-endian length + Arrow IPC stream; truncated
    header/payload raise like the reference's diagnostics."""
    import pyarrow as pa

    from tenzir_spark.sources.bitz import _encode_frames, decode_frames

    tbl = pa.table({"x": [1, 2, 3], "s": ["a", "b", "c"]})
    blob = _encode_frames(tbl)
    (length,) = struct.unpack_from(">Q", blob, 0)
    assert length == len(blob) - 8  # single frame, header accounts for rest

    # two concatenated frames decode to two tables
    tables = decode_frames(blob + blob)
    assert len(tables) == 2
    assert tables[0].to_pydict() == tbl.to_pydict()

    with pytest.raises(ValueError, match="header"):
        decode_frames(blob + b"\x00\x00\x00")  # dangling partial header
    with pytest.raises(ValueError, match="message length"):
        decode_frames(blob[:-1])  # truncated payload


def test_bitz_schema_inference_probe(spark, tmp_path):
    from tenzir_spark.sources.bitz import read_bitz, write_bitz

    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    write_bitz(df.coalesce(1), str(tmp_path / "bz"))
    back = read_bitz(spark, str(tmp_path / "bz"))  # no schema given
    assert sorted(back.columns) == ["a", "b"]
    assert back.count() == 2
