"""Scalar/value transform operators.

Reference parity:
- hash      -> libtenzir/builtins/operators/hash.cpp (hash.md:19-31):
  SHA-256 of a field (+ optional salt) into <field>_hashed
- timeshift -> libtenzir/builtins/operators/timeshift.cpp (timeshift.md:16-40)
- parse     -> libtenzir/builtins/operators/parse.cpp (parse.md:16-21):
  apply a parser to a string field; JSON via from_json, key=value via
  str_to_map, regex via regexp_extract (format inventory SURVEY.md §2.2)
- time parsing -> libtenzir/builtins/operators/time.cpp:478-530
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_field(df: DataFrame, field: str, salt: str | None = None,
               out: str | None = None) -> DataFrame:
    """SHA-256 digest of a field into ``<field>_hashed`` (hash.md)."""
    col = F.col(field).cast("string")
    if salt:
        col = F.concat(col, F.lit(salt))
    return df.withColumn(out or f"{field}_hashed", F.sha2(col, 256))


def timeshift(df: DataFrame, field: str, start: str | None = None,
              speed: float = 1.0) -> DataFrame:
    """Re-anchor a time column to ``start`` and re-scale inter-event gaps by
    ``speed`` (timeshift.md:16-40). The anchor (min over the whole input) is
    a scalar aggregate broadcast into the projection — one extra pass, no
    per-row Python."""
    ts = F.col(field).cast("timestamp")  # NTZ parquet cols -> TIMESTAMP (UTC session)
    # The anchor is a 1-row scalar aggregate broadcast-crossJoined back in.
    # (An unbounded `min(...) over ()` window would force EVERY row through
    # one task — Exchange SinglePartition; the agg scan here is column-pruned
    # and fully parallel, and the 1-row side is a broadcast.)
    anchor = df.agg(F.min(ts).alias("_ts_anchor"))
    out = df.crossJoin(F.broadcast(anchor))
    a = F.col("_ts_anchor")
    delta_us = (F.unix_micros(ts) - F.unix_micros(a)) / F.lit(speed)
    base = F.to_timestamp(F.lit(start)) if start else a
    shifted = F.timestamp_micros((F.unix_micros(base) + delta_us).cast("long"))
    return out.withColumn(field, shifted).drop("_ts_anchor")


def parse_json_field(df: DataFrame, field: str, schema: str,
                     prefix: str | None = None) -> DataFrame:
    """``parse <field> json`` — parse a JSON string column into typed
    columns (reference JSON parser: libtenzir/builtins/formats/json.cpp,
    schema inference via series_builder; here the schema is explicit or
    pre-inferred with spark.read.json semantics)."""
    parsed = F.from_json(F.col(field), schema)
    out = df.withColumn("_parsed", parsed)
    pfx = prefix if prefix is not None else f"{field}_"
    for name in out.select("_parsed.*").columns:
        out = out.withColumn(f"{pfx}{name}", F.col(f"_parsed.{name}"))
    return out.drop("_parsed")


def parse_kv_field(df: DataFrame, field: str, pair_sep: str = r"\s+",
                   kv_sep: str = "=") -> DataFrame:
    """``read kv`` analog (libtenzir/builtins/formats/kv.cpp): split a
    key=value string into a map column."""
    return df.withColumn(f"{field}_kv", F.str_to_map(F.col(field), F.lit(pair_sep), F.lit(kv_sep)))


def pseudonymize_ip(df: DataFrame, field: str, seed: str = "tenzir",
                    out: str | None = None, prf: str = "pandas") -> DataFrame:
    """``pseudonymize -m crypto-pan`` analog (pseudonymize.md:20-40,
    libtenzir/builtins/operators/pseudonymize.cpp): prefix-preserving IPv4
    anonymization. Same structural guarantee as Crypto-PAn — two addresses
    sharing a k-bit prefix map to outputs sharing exactly a k-bit prefix —
    built on a keyed PRF per prefix (vectorized siphash over numpy; the
    reference uses AES, unavailable here; SAME structure, different PRF).

    Vectorization: 32 hash_array calls over the whole batch (one per bit),
    zero per-row Python.

    Keying: ``hash_array``'s ``hash_key`` is IGNORED for numeric arrays
    (pandas hashes ints with an unkeyed splitmix-style mix), so the seed
    must enter through the VALUE domain — a 64-bit digest of the seed is
    XOR-mixed into every (prefix, bit) input before hashing. Different
    seeds therefore produce different mappings, and inverting the map
    requires the seed, which is the Crypto-PAn-style guarantee claimed.

    ``prf="md5"`` swaps the pandas hash for the last-hex-digit parity of
    md5(str(mixed value)) — per-row Python, SLOW, but engine-portable: an
    independent SQL engine replays the whole prefix-preserving
    construction bit for bit (pseudonymize_exact oracle). Verification
    twin only; production keeps the vectorized pandas PRF.
    """
    import hashlib

    import numpy as np
    from pandas.util import hash_array
    from pyspark.sql import types as T

    if prf not in ("pandas", "md5"):
        raise ValueError(f"prf must be 'pandas' or 'md5', got {prf!r}")
    seed64 = np.uint64(
        int.from_bytes(hashlib.sha256(seed.encode()).digest()[:8], "big")
    )

    @F.pandas_udf(T.StringType())
    def _anon(s: pd.Series) -> pd.Series:
        valid = s.notna()
        parts = s.where(valid, "0.0.0.0").str.split(".", expand=True)
        ip = np.zeros(len(s), dtype=np.uint32)
        for i in range(4):
            ip = (ip << np.uint32(8)) | parts[i].astype(np.uint32).to_numpy()
        outv = np.zeros(len(s), dtype=np.uint32)
        for bit in range(32):
            # PRF of the (bit)-bit prefix decides the flip of bit `bit`
            prefix = (ip >> np.uint32(32 - bit)).astype(np.uint64) if bit else np.zeros(len(s), dtype=np.uint64)
            # mix the bit index AND the seed digest into the hashed domain
            mixed = ((prefix << np.uint64(6)) | np.uint64(bit)) ^ seed64
            if prf == "md5":
                flip = np.fromiter(
                    (int(hashlib.md5(str(int(v)).encode()).hexdigest()[-1], 16) & 1
                     for v in mixed),
                    dtype=np.uint32, count=len(mixed))
            else:
                h = hash_array(mixed)
                flip = (h & np.uint64(1)).astype(np.uint32)
            orig = (ip >> np.uint32(31 - bit)) & np.uint32(1)
            outv = (outv << np.uint32(1)) | (orig ^ flip)
        octets = [((outv >> np.uint32(sh)) & np.uint32(255)).astype("U3") for sh in (24, 16, 8, 0)]
        dot = np.full(len(s), ".", dtype="U1")
        joined = np.char.add(
            np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
                octets[0], dot), octets[1]), dot), octets[2]), dot), octets[3],
        )
        return pd.Series(joined).where(valid.to_numpy(), None)

    return df.withColumn(out or f"{field}_pseudonymized", _anon(F.col(field)))


_CODECS = {
    "gzip": ("gzip", "compress", "decompress"),
    "zlib": ("zlib", "compress", "decompress"),
    "bz2": ("bz2", "compress", "decompress"),
    "lzma": ("lzma", "compress", "decompress"),
    "xz": ("lzma", "compress", "decompress"),
}


def _codec_fn(codec: str, direction: str):
    """Resolve a (de)compression callable. zstd/lz4 are used when their
    modules exist; the stdlib codecs always work (import-try gating, no
    hard deps)."""
    if codec in ("zstd", "zstandard"):
        try:
            import zstandard  # noqa: F401

            if direction == "compress":
                return lambda b: zstandard.ZstdCompressor().compress(b)
            return lambda b: zstandard.ZstdDecompressor().decompress(b)
        except ImportError as e:
            raise ValueError("zstd codec needs the zstandard module") from e
    if codec == "lz4":
        try:
            import lz4.frame

            return lz4.frame.compress if direction == "compress" else lz4.frame.decompress
        except ImportError as e:
            raise ValueError("lz4 codec needs the lz4 module") from e
    if codec not in _CODECS:
        raise ValueError(f"unknown codec {codec!r} ({sorted(_CODECS)} + zstd/lz4)")
    mod, comp, decomp = _CODECS[codec]
    import importlib

    m = importlib.import_module(mod)
    return getattr(m, comp if direction == "compress" else decomp)


def compress_field(df: DataFrame, field: str, codec: str = "gzip",
                   out: str | None = None) -> DataFrame:
    """``compress <codec>`` (compress.cpp wraps a byte stream in a codec;
    here per-VALUE compression of a binary/string column). Arrow-batched
    pandas UDF — the codec is C-backed, Python touches only the buffer
    objects."""
    from pyspark.sql import types as T

    fn = _codec_fn(codec, "compress")

    @F.pandas_udf(T.BinaryType())
    def _comp(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(
            v if isinstance(v, (bytes, bytearray)) else str(v).encode()))

    return df.withColumn(out or f"{field}_{codec}", _comp(F.col(field)))


def decompress_field(df: DataFrame, field: str, codec: str = "gzip",
                     out: str | None = None) -> DataFrame:
    """``decompress <codec>`` — inverse of compress_field."""
    from pyspark.sql import types as T

    fn = _codec_fn(codec, "decompress")

    @F.pandas_udf(T.BinaryType())
    def _decomp(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(
            bytes(v) if isinstance(v, (bytes, bytearray, memoryview))
            else str(v).encode()))

    return df.withColumn(out or f"{field}_raw", _decomp(F.col(field)))


def parse_grok_field(df: DataFrame, field: str, pattern: str,
                     names: list[str]) -> DataFrame:
    """grok-lite (libtenzir/builtins/formats/grok.cpp): a regex with capture
    groups extracted into named columns."""
    out = df
    for i, name in enumerate(names, start=1):
        out = out.withColumn(name, F.regexp_extract(F.col(field), pattern, i))
    return out
