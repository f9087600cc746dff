"""Vectorized token-array functions (pandas/Arrow UDFs — NEVER per-row
Python, per the input_hint mandate).

The reference's UDF story is the ``python`` operator, which is explicitly
row-at-a-time over Arrow IPC (web/docs/operators/python.md:30-35,
python/tenzir/tools/python_operator_executor.py); these functions are the
"we are required to do better" path: every kernel below works on the
FLATTENED Arrow values buffer + offsets with numpy ufuncs — zero Python
per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql import types as T

_P = np.uint64(1099511628211)  # FNV-ish odd multiplier
_SEED = np.uint64(1469598103934665603)
_MAXLEN = 4096  # max supported token-sequence length for the pow table
_POWTABLE = np.empty(_MAXLEN, dtype=np.uint64)
with np.errstate(over="ignore"):
    _POWTABLE[0] = np.uint64(1)
    for _i in range(1, _MAXLEN):
        _POWTABLE[_i] = _POWTABLE[_i - 1] * _P  # wraps mod 2^64 by design
np.seterr(over="ignore")  # uint64 wraparound IS the modulus in these kernels


def _ragged(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """pandas Series of list<int32> -> (values, offsets, null_mask)."""
    arr = pa.array(series, type=pa.list_(pa.int32()))
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    nulls = np.asarray(arr.is_null())
    return values, offsets, nulls


@F.pandas_udf(T.LongType())
def tokens_fingerprint(tokens: pd.Series) -> pd.Series:
    """Order-sensitive 64-bit polynomial fingerprint of each token array —
    the per-row token-array-equality invariant checker. Fully vectorized:
    position index via repeat/arange, power table lookup, reduceat sum
    (uint64 wraparound is the modulus)."""
    values, offsets, nulls = _ragged(tokens)
    lens = np.diff(offsets)
    total = int(offsets[-1]) if len(offsets) else 0
    if total:
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
        terms = (values.astype(np.uint64) ^ _SEED) * _POWTABLE[pos]
        starts = offsets[:-1].copy()
        # reduceat with repeated indices (empty rows) returns the element at
        # the index — mask empties after.
        sums = np.zeros(len(lens), dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            red = np.add.reduceat(terms, starts[nonempty])
            sums[nonempty] = red
    else:
        sums = np.zeros(len(lens), dtype=np.uint64)
    mixed = (sums ^ (lens.astype(np.uint64) * _P)).astype(np.int64)
    out = pd.Series(mixed)
    out[nulls] = None
    return out


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def tokens_truncate_512(tokens: pd.Series) -> pd.Series:
    """Truncate every sequence to 512 tokens — pure Arrow compute kernel
    (list_slice), no Python per row."""
    arr = pa.array(tokens, type=pa.list_(pa.int32()))
    out = pa.compute.list_slice(arr, 0, 512)
    return out.to_pandas()


def token_stats(df, tokens_col: str = "tokens"):
    """JVM-side token-array stats (no UDF needed — prefer these when the
    expression language suffices): length, min/max id, OOV count."""
    t = F.col(tokens_col)
    return df.withColumns(
        {
            "tok_len": F.size(t),
            "tok_min": F.array_min(t),
            "tok_max": F.array_max(t),
            "tok_sum_weighted": F.expr(
                f"aggregate(zip_with({tokens_col}, sequence(1, size({tokens_col})),"
                " (x, i) -> cast(x as bigint) * i), 0L, (acc, v) -> acc + v)"
            ),
        }
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def token_minhash_8(tokens: pd.Series) -> pd.Series:
    """MinHash signature (8 permutations) over token 3-gram shingles,
    vectorized: shingle hashes from strided windows of the flattened
    buffer, per-row min via minimum.reduceat. Powers token-level near-dup
    detection on the corpus table."""
    values, offsets, nulls = _ragged(tokens)
    lens = np.diff(offsets)
    n_sh = np.maximum(lens - 2, 0)
    sh_off = np.concatenate([[0], np.cumsum(n_sh)])
    total = int(sh_off[-1])
    A = np.uint64(2654435761)
    B = np.uint64(40503)
    C = np.uint64(2246822519)
    seeds = np.arange(1, 9, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    if total:
        starts = np.repeat(offsets[:-1], n_sh) + (
            np.arange(total, dtype=np.int64) - np.repeat(sh_off[:-1], n_sh)
        )
        v = values.astype(np.uint64)
        base = v[starts] * A + v[starts + 1] * B + v[starts + 2] * C
        sigs = np.empty((8, len(lens)), dtype=np.uint64)
        row_has = n_sh > 0
        red_idx = sh_off[:-1][row_has]
        for s in range(8):
            h = base * _P + seeds[s]
            h ^= h >> np.uint64(33)
            col = np.full(len(lens), np.uint64(0xFFFFFFFFFFFFFFFF))
            col[row_has] = np.minimum.reduceat(h, red_idx)
            sigs[s] = col
    else:
        sigs = np.full((8, len(lens)), np.uint64(0xFFFFFFFFFFFFFFFF))
    out_vals = sigs.T.astype(np.int64)
    result = pd.Series(list(out_vals))
    result[nulls] = None
    return result
