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


def bloom_filter_context(df: DataFrame, col: str, expected: int = 1_000_000,
                         fpp: float = 0.01):
    """Build a Bloom filter over a column (bloom_filter.cpp analog) using
    Spark's built-in DataFrameStatFunctions (JVM-side, mergeable)."""
    return df.stat.bloomFilter(col, expected, fpp)


def enrich_bloom(df: DataFrame, bloom, col: str, out: str = "matched") -> DataFrame:
    """Tag rows whose value might be in the Bloom context. The filter object
    is serialized once into the task closure (broadcast semantics)."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(bloom)

    from pyspark.sql import types as T
    import pandas as pd

    @F.pandas_udf(T.BooleanType())
    def _contains(s: pd.Series) -> pd.Series:
        bf = b.value
        return s.map(lambda v: v is not None and bf.mightContain(v))

    return df.withColumn(out, _contains(F.col(col)))


def enrich_subnet(df: DataFrame, subnets: DataFrame, ip_col: str,
                  cidr_prefix_col: str = "prefix", cidr_net_col: str = "net24") -> DataFrame:
    """CIDR-containment enrich (lookup-table subnet tree analog,
    lookup_table.cpp:80-115) via prefix-expansion equi-join: the subnet
    table is pre-expanded to a fixed prefix granularity so the probe is a
    plain broadcast equi-join instead of a range join."""
    probe = df.withColumn(cidr_net_col, F.substring_index(F.col(ip_col), ".", 3))
    return probe.join(F.broadcast(subnets), on=cidr_net_col, how="left")
