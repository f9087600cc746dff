"""Enrichment — the reference's only join family.

Reference parity:
- enrich/contexts interface -> libtenzir/include/tenzir/plugin.hpp:660-762;
  enrich.md:20-60 (left-enrich events with per-value context output;
  --filter makes it inner)
- lookup-table context -> libtenzir/builtins/contexts/lookup_table.cpp:
  213-290 (exact robin-map lookup; subnet tree for CIDR)
- bloom-filter context -> libtenzir/builtins/contexts/bloom_filter.cpp

Spark-first: a context is just a (small) keyed DataFrame; enrich is a
broadcast hash join — the big side never shuffles. For contexts too large
to broadcast, drop the hint and let AQE pick a shuffle join with skew
splitting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_table_context(ctx_df: DataFrame, key: str) -> DataFrame:
    """Normalize a context table: unique keys, renamed for joining
    (lookup_table.cpp keeps one value per key — last update wins)."""
    return ctx_df.dropDuplicates([key])


def enrich(
    df: DataFrame,
    ctx: DataFrame,
    on: str | list[str],
    filter: bool = False,
    broadcast: bool = True,
) -> DataFrame:
    """Left-enrich rows with context fields (enrich.md). ``filter=True``
    keeps only matching rows (--filter). Context is broadcast by default —
    the reference ships the whole lookup table to every node too."""
    right = F.broadcast(ctx) if broadcast else ctx
    return df.join(right, on=on, how="inner" if filter else "left")


class BloomFilter:
    """Deterministic vectorized Bloom filter (bloom_filter.cpp /
    src/sketch/bloom_filter.cpp analog). Double-hashing scheme
    h_i = h1 + i*h2 (Kirsch-Mitzenmacher) over md5 halves — stable across
    engines and runs, unlike JVM sketch internals. All ops are numpy
    array-at-a-time; the bitset broadcasts to executors."""

    def __init__(self, expected: int = 1_000_000, fpp: float = 0.01,
                 hash_mode: str = "pandas"):
        import math

        if hash_mode not in ("pandas", "md5"):
            raise ValueError(f"hash_mode must be 'pandas' or 'md5', got {hash_mode!r}")
        m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        self.m = 1 << max(6, (m - 1).bit_length())  # power of two → mask
        self.k = max(1, round(self.m / expected * math.log(2)))
        self.hash_mode = hash_mode
        import numpy as np

        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _h12(self, values) -> tuple:
        """Vectorized dual hash, deterministic across processes, no per-row
        Python. ``hash_array``'s ``hash_key`` is ignored for numeric
        arrays, so h2 cannot come from a second keyed call (it would
        degenerate to h1|1 and correlate every probe); instead h2 is an
        independent xorshift-multiply remix of h1 — the standard finalizer
        trick for deriving a second hash from one 64-bit state."""
        import numpy as np
        from pandas.util import hash_array

        arr = np.asarray(values)
        if self.hash_mode == "md5":
            # engine-portable h1: high 8 bytes of md5(str(value)). Slower
            # (per-value hashlib) — the VERIFICATION twin mode that lets an
            # independent SQL engine replay the whole probe math
            # (bloom_membership_exact); production keeps the vectorized
            # pandas hash. int/str keys only (str() must round-trip the
            # textual form the oracle hashes).
            import hashlib

            h1 = np.fromiter(
                (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
                 for v in arr),
                dtype=np.uint64, count=len(arr))
        else:
            if arr.dtype == object:
                arr = arr.astype(str).astype(object)
            h1 = hash_array(arr, hash_key="tenzirsparkbl00A").astype(np.uint64)
        x = h1 ^ np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        h2 = x | np.uint64(1)
        return h1, h2

    def add_many(self, values) -> None:
        import numpy as np

        h1, h2 = self._h12(values)
        mask = np.uint64(self.m - 1)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))

    def might_contain_many(self, values):
        import numpy as np

        h1, h2 = self._h12(values)
        mask = np.uint64(self.m - 1)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & mask
            got = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (got >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out


def bloom_filter_context(df: DataFrame, col: str, expected: int | None = None,
                         fpp: float = 0.01,
                         hash_mode: str = "pandas",
                         max_keys: int | None = 5_000_000) -> BloomFilter:
    """Build a Bloom filter context over a column. The context table is
    broadcast-small by definition (the reference ships whole contexts to
    every node, plugin.hpp:660-727), so a driver-side collect of the key
    column is the same data movement — but nothing used to enforce the
    contract, so ``max_keys`` bounds the collect (the LIMIT rides the
    same job: at most max_keys+1 rows ever reach the driver) and raises
    a clear error instead of OOMing the driver on a mistakenly-large
    DataFrame; ``max_keys=None`` opts out. ``expected`` defaults to the
    actual key count, so the advertised fpp holds regardless of caller
    guesses; pass it explicitly only to pre-size for future updates."""
    keyed = df.select(col).filter(F.col(col).isNotNull())
    if max_keys is not None:
        rows = keyed.limit(max_keys + 1).collect()
        if len(rows) > max_keys:
            raise ValueError(
                f"bloom_filter_context: context column {col!r} exceeds "
                f"max_keys={max_keys} — contexts are broadcast-small by "
                "contract; pre-aggregate the keys or pass a larger "
                "max_keys (or max_keys=None) explicitly")
    else:
        rows = keyed.collect()
    keys = [r[0] for r in rows]
    bf = BloomFilter(expected if expected is not None else max(len(keys), 64),
                     fpp, hash_mode=hash_mode)
    bf.add_many(keys)
    return bf


def enrich_bloom(df: DataFrame, bloom: BloomFilter, col: str, out: str = "matched") -> DataFrame:
    """Tag rows whose value might be in the Bloom context; Arrow-batched
    pandas UDF, numpy bit probes — no per-row Python."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(bloom)

    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def _contains(s: pd.Series) -> pd.Series:
        bf = b.value
        valid = s.notna()
        import numpy as np

        res = np.zeros(len(s), dtype=bool)
        if valid.any():
            res[valid.to_numpy()] = bf.might_contain_many(s[valid].tolist())
        return pd.Series(res)

    return df.withColumn(out, _contains(F.col(col)))


def enrich_range(
    df: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval-containment enrich over a numeric domain — the geoip
    pattern (the reference's geoip plugin resolves an IP against MaxMind
    range tables; this is the same join shape without the MaxMind dep,
    generalizing ``enrich_subnet``'s prefix trick to arbitrary ranges).

    Spark plans ``x BETWEEN lo AND hi`` joins as BroadcastNestedLoopJoin —
    O(rows × intervals) comparisons. Instead: expand each interval to the
    fixed-width buckets it overlaps (intervals are broadcast-small, so the
    expansion is cheap), bucket each probe value, and broadcast
    EQUI-join on the bucket before the exact containment filter — each row
    is checked only against intervals sharing its bucket. ``bucket_width``
    defaults to the median interval length (driver-computed from the
    small side)."""
    if bucket_width is None:
        med = intervals.select(
            F.median(F.col(hi_col) - F.col(lo_col)).alias("m")
        ).first()["m"]
        bucket_width = max(int(med or 1), 1)
    w = F.lit(int(bucket_width))
    ctx_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    # bucket → ARRAY of overlapping intervals: the probe join is then 1:1
    # (no row multiplication, no post-join re-collapse of the payload);
    # the exact containment check walks the per-bucket list JVM-side
    per_bucket = (
        intervals.withColumn(
            "_rb",
            F.explode(
                F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
            ),
        )
        .groupBy("_rb")
        # array_sort: collect_list order is partition-dependent, so the
        # per-bucket list is sorted by (lo, hi, ...) — OVERLAPPING intervals
        # deterministically resolve to the lowest-lo match (a BETWEEN-join
        # oracle emits one row per match; disjoint intervals agree exactly)
        .agg(F.array_sort(
            F.collect_list(F.struct(lo_col, hi_col, *ctx_cols))
        ).alias("_ivs"))
    )
    probe = df.withColumn("_rb", F.floor(F.col(value_col) / w))
    x = F.col(value_col)
    match = F.get(
        F.filter(F.col("_ivs"), lambda i: (x >= i[lo_col]) & (x <= i[hi_col])),
        0,
    )
    return (
        probe.join(F.broadcast(per_bucket), on="_rb", how="left")
        .select(*df.columns, *[match[c].alias(c) for c in ctx_cols])
    )


def enrich_subnet(df: DataFrame, subnets: DataFrame, ip_col: str,
                  cidr_prefix_col: str = "prefix", cidr_net_col: str = "net24") -> DataFrame:
    """CIDR-containment enrich (lookup-table subnet tree analog,
    lookup_table.cpp:80-115) via prefix-expansion equi-join: the subnet
    table is pre-expanded to a fixed prefix granularity so the probe is a
    plain broadcast equi-join instead of a range join."""
    probe = df.withColumn(cidr_net_col, F.substring_index(F.col(ip_col), ".", 3))
    return probe.join(F.broadcast(subnets), on=cidr_net_col, how="left")
