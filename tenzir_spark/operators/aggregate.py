"""Aggregation / sort / top-k operators.

Reference parity:
- summarize -> libtenzir/builtins/operators/summarize.cpp:150-218,357-475
  (streaming hash-agg over robin_map buckets; we get Tungsten hash agg with
  map-side partial aggregation + spill for free)
- the 13 aggregation functions -> libtenzir/builtins/aggregation-functions/
  (sum.cpp, min.cpp, max.cpp, mean.cpp, approximate_median.cpp (T-Digest),
  stddev_variance.cpp, count.cpp, count_distinct.cpp, distinct.cpp,
  collect.cpp, sample.cpp, any.cpp, all.cpp)
- sort -> libtenzir/builtins/operators/sort.cpp:30-147 (Arrow SortIndices +
  cross-batch merge; Spark's range-partitioned sort distributes instead)
- top/rare -> libtenzir/builtins/operators/top_rare.cpp:70-74 (expands to
  summarize|sort — we do literally that composition)
- measure -> libtenzir/builtins/operators/measure.cpp
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tenzir aggregation function name -> Spark builder.
#: (summarize.md:40-57 lists the surface.)
AGG_FUNCTIONS: dict[str, callable] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    # exact median; the reference uses an Arrow T-Digest approximation
    # (approximate_median.cpp:42-67) — percentile_approx is the closer
    # analog at extreme scale, median the stricter check.
    "approximate_median": F.median,
    "stddev": F.stddev_pop,
    "variance": F.var_pop,
    "count": F.count,
    "count_distinct": F.count_distinct,
    # sorted unique values (distinct.cpp returns a sorted list)
    "distinct": lambda c: F.sort_array(F.collect_set(c)),
    "collect": F.collect_list,
    # sample = first non-null (sample.cpp). NOT deterministic under
    # unordered multi-partition input (Spark first() is
    # partition-order-dependent); oracle-exact registry entries use
    # min_by/min forms instead (q_collect_sample) — never build an
    # oracle on bare sample()
    "sample": lambda c: F.first(c, ignorenulls=True),
    "any": F.bool_or,
    "all": F.bool_and,
}


def summarize(
    df: DataFrame,
    aggs: Mapping[str, Column],
    by: Sequence[str | Column] = (),
    resolution: str | None = None,
    time_col: str | None = None,
) -> DataFrame:
    """group-by + aggregate; non-key non-agg fields are dropped, exactly the
    reference contract (summarize.md:21-40). ``resolution`` rounds a time
    key into buckets (summarize.md:62-70) via date_trunc — the tumbling-
    window analog. Streaming group lifetimes (timeout/update-timeout) map to
    watermarked windowed aggregation in streaming/ instead."""
    keys = list(by)
    if resolution and time_col:
        keys = [F.date_trunc(resolution, F.col(time_col)).alias(time_col)] + keys
    agg_cols = [v.alias(k) for k, v in aggs.items()]
    if keys:
        return df.groupBy(*keys).agg(*agg_cols)
    return df.agg(*agg_cols)


def sort(df: DataFrame, *specs: Column) -> DataFrame:
    """Multi-key sort with per-key direction/null placement (sort.md:13-45):
    pass e.g. F.col('x').asc_nulls_last(), F.col('y').desc()."""
    return df.orderBy(*specs)


def top(df: DataFrame, field: str, n: int | None = None) -> DataFrame:
    """Most common values: literally summarize count=count(.) by f | sort
    (top_rare.cpp:70-74). Deterministic tie-break on the value itself."""
    out = df.groupBy(field).agg(F.count("*").alias("count"))
    out = out.orderBy(F.col("count").desc(), F.col(field).asc())
    return out.limit(n) if n else out


def rare(df: DataFrame, field: str, n: int | None = None) -> DataFrame:
    out = df.groupBy(field).agg(F.count("*").alias("count"))
    out = out.orderBy(F.col("count").asc(), F.col(field).asc())
    return out.limit(n) if n else out


def measure(df: DataFrame) -> DataFrame:
    """Replace the stream with its event count (measure.md:16-45); per-
    micro-batch measurement lives in the CDC metrics table instead."""
    return df.agg(F.count("*").alias("events"))
