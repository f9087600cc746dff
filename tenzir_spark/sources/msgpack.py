"""MessagePack codec + ``read msgpack`` source (public format spec:
msgpack.org, github.com/msgpack/msgpack spec.md).

The reference ships a fluent-bit integration (plugins/fluent-bit) whose
wire representation is msgpack; this module provides the codec layer the
forward-protocol source (sources/fluentbit.py) builds on, plus a generic
``read_msgpack`` for files of concatenated msgpack maps (one map = one
event), mirroring how ``read json --ndjson`` treats a stream of objects.

Pure stdlib ``struct`` implementation of the complete spec — every
family: nil/bool, positive/negative fixint, u8-u64, i8-i64, f32/f64,
fixstr/str8-32, bin8-32, fixarray/array16-32, fixmap/map16-32,
fixext1-16/ext8-32. The encoder always emits the smallest encoding
(deterministic bytes for a given value — the registry oracle relies on
that). Decoding a self-describing format is inherently per-value Python;
the Spark readers therefore run it inside ``mapInPandas`` over
``binaryFile`` frames so it distributes per file, the same shape as the
feather/bitz readers (wire formats, not storage formats).
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class Ext(NamedTuple):
    """A msgpack extension value (spec: ext family, application-defined
    type code -128..127 + payload bytes)."""

    code: int
    data: bytes


class MsgpackError(ValueError):
    pass


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _pack_into(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += b"\xd9" + bytes([n])
        elif n < 0x10000:
            out += b"\xda" + struct.pack(">H", n)
        elif n < 0x100000000:
            out += b"\xdb" + struct.pack(">I", n)
        else:
            raise MsgpackError("string too long for msgpack")
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n < 0x100:
            out += b"\xc4" + bytes([n])
        elif n < 0x10000:
            out += b"\xc5" + struct.pack(">H", n)
        elif n < 0x100000000:
            out += b"\xc6" + struct.pack(">I", n)
        else:
            raise MsgpackError("binary too long for msgpack")
        out += b
    elif isinstance(obj, Ext):
        _pack_ext(obj, out)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out += b"\xdc" + struct.pack(">H", n)
        elif n < 0x100000000:
            out += b"\xdd" + struct.pack(">I", n)
        else:
            raise MsgpackError("array too long for msgpack")
        for v in obj:
            _pack_into(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out += b"\xde" + struct.pack(">H", n)
        elif n < 0x100000000:
            out += b"\xdf" + struct.pack(">I", n)
        else:
            raise MsgpackError("map too long for msgpack")
        for k, v in obj.items():
            _pack_into(k, out)
            _pack_into(v, out)
    else:
        raise MsgpackError(f"cannot msgpack-encode {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 0x100:
        out += b"\xcc" + bytes([v])
    elif 0 <= v < 0x10000:
        out += b"\xcd" + struct.pack(">H", v)
    elif 0 <= v < 0x100000000:
        out += b"\xce" + struct.pack(">I", v)
    elif 0 <= v < 0x10000000000000000:
        out += b"\xcf" + struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out += b"\xd0" + struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out += b"\xd1" + struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out += b"\xd2" + struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out += b"\xd3" + struct.pack(">q", v)
    else:
        raise MsgpackError(f"integer out of msgpack range: {v}")


_FIXEXT = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}


def _pack_ext(e: Ext, out: bytearray) -> None:
    n = len(e.data)
    if n in _FIXEXT:
        out.append(_FIXEXT[n])
    elif n < 0x100:
        out += b"\xc7" + bytes([n])
    elif n < 0x10000:
        out += b"\xc8" + struct.pack(">H", n)
    elif n < 0x100000000:
        out += b"\xc9" + struct.pack(">I", n)
    else:
        raise MsgpackError("ext payload too long for msgpack")
    out += struct.pack(">b", e.code)
    out += e.data


def pack(obj) -> bytes:
    """Encode one value; always the smallest spec encoding."""
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def unpack_from(buf: bytes, pos: int = 0):
    """Decode one value at ``pos``; returns ``(value, next_pos)``."""
    try:
        return _unpack(buf, pos)
    except (struct.error, IndexError) as exc:
        raise MsgpackError(f"truncated msgpack data at {pos}") from exc


def _take(buf: bytes, pos: int, n: int) -> bytes:
    end = pos + n
    if end > len(buf):
        raise MsgpackError(f"truncated msgpack data at {pos}")
    return buf[pos:end]


def _unpack(buf: bytes, pos: int):
    b = buf[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return _take(buf, pos, n).decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        n = buf[pos]
        return bytes(_take(buf, pos + 1, n)), pos + 1 + n
    if b == 0xC5:
        (n,) = struct.unpack_from(">H", buf, pos)
        return bytes(_take(buf, pos + 2, n)), pos + 2 + n
    if b == 0xC6:
        (n,) = struct.unpack_from(">I", buf, pos)
        return bytes(_take(buf, pos + 4, n)), pos + 4 + n
    if b == 0xC7:
        n = buf[pos]
        return _unpack_ext(buf, pos + 1, n)
    if b == 0xC8:
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_ext(buf, pos + 2, n)
    if b == 0xC9:
        (n,) = struct.unpack_from(">I", buf, pos)
        return _unpack_ext(buf, pos + 4, n)
    if b == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b == 0xCC:
        return buf[pos], pos + 1
    if b == 0xCD:
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    if b == 0xCE:
        return struct.unpack_from(">I", buf, pos)[0], pos + 4
    if b == 0xCF:
        return struct.unpack_from(">Q", buf, pos)[0], pos + 8
    if b == 0xD0:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if b == 0xD1:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if b == 0xD2:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if b == 0xD3:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if 0xD4 <= b <= 0xD8:
        n = 1 << (b - 0xD4)
        return _unpack_ext(buf, pos, n)
    if b == 0xD9:
        n = buf[pos]
        return _take(buf, pos + 1, n).decode("utf-8"), pos + 1 + n
    if b == 0xDA:
        (n,) = struct.unpack_from(">H", buf, pos)
        return _take(buf, pos + 2, n).decode("utf-8"), pos + 2 + n
    if b == 0xDB:
        (n,) = struct.unpack_from(">I", buf, pos)
        return _take(buf, pos + 4, n).decode("utf-8"), pos + 4 + n
    if b == 0xDC:
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_array(buf, pos + 2, n)
    if b == 0xDD:
        (n,) = struct.unpack_from(">I", buf, pos)
        return _unpack_array(buf, pos + 4, n)
    if b == 0xDE:
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_map(buf, pos + 2, n)
    if b == 0xDF:
        (n,) = struct.unpack_from(">I", buf, pos)
        return _unpack_map(buf, pos + 4, n)
    raise MsgpackError(f"reserved msgpack type byte 0xc1 at {pos - 1}")


def _unpack_ext(buf: bytes, pos: int, n: int):
    (code,) = struct.unpack_from(">b", buf, pos)
    return Ext(code, bytes(_take(buf, pos + 1, n))), pos + 1 + n


def _unpack_array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack(buf, pos)
        out.append(v)
    return out, pos


def _unpack_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack(buf, pos)
        v, pos = _unpack(buf, pos)
        out[k] = v
    return out, pos


def unpack_all(buf: bytes) -> list:
    """Decode a stream of concatenated msgpack values to exhaustion."""
    out, pos = [], 0
    while pos < len(buf):
        v, pos = unpack_from(buf, pos)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# Spark source: files of concatenated msgpack maps (one map = one event)
# ---------------------------------------------------------------------------


def read_msgpack(spark, path: str, schema=None):
    """``read msgpack`` — each top-level msgpack map in the byte stream
    is one event (the ndjson analogue). ``binaryFile`` scan + per-file
    decode in ``mapInPandas``; files are the unit of parallelism.
    ``schema`` (DDL string or StructType) selects/casts the record
    fields; inferred from the first map of the first file when omitted."""
    import glob as _glob
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    if schema is None:
        files = sorted(_glob.glob(f"{path}/*") if not path.endswith(
            (".msgpack", ".bin")) else [path]) or [path]
        with open(files[0], "rb") as fh:
            first, _ = unpack_from(fh.read())
        if not isinstance(first, dict):
            raise MsgpackError("cannot infer schema: first value not a map")
        schema = T.StructType([
            T.StructField(k, _py_to_spark_type(v)) for k, v in first.items()])
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]

    binary = (
        spark.read.format("binaryFile").load(path).select("content"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = [v for v in unpack_all(bytes(blob))
                        if isinstance(v, dict)]
                if rows:
                    yield pd.DataFrame(
                        {n: [r.get(n) for r in rows] for n in names})

    return binary.mapInPandas(decode, schema)


def write_msgpack(df, path: str) -> list[str]:
    """``write msgpack`` — one file per executor partition, each row one
    top-level msgpack map (the ndjson analogue); returns file names."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        fn = fh = None
        for pdf in batches:
            if not len(pdf):
                continue
            if fh is None:
                fn = f"{path}/part-{uuid.uuid4().hex}.msgpack"
                fh = open(fn, "wb")
            for rec in pdf.to_dict("records"):
                fh.write(pack({k: _plain_value(v) for k, v in rec.items()}))
        if fh is not None:
            fh.close()
            yield pd.DataFrame({"file": [fn]})

    return [r["file"] for r in df.mapInPandas(_write, "file string").collect()]


def _plain_value(v):
    """numpy scalar / pandas NaN-NaT -> plain python for the encoder."""
    if v is None:
        return None
    try:
        if v != v:  # NaN/NaT
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return [_plain_value(x) for x in seq]
    return v


def _py_to_spark_type(v):
    from pyspark.sql import types as T

    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, bytes):
        return T.BinaryType()
    if isinstance(v, list):
        return T.ArrayType(T.StringType())
    return T.StringType()
