"""Row selection / projection / reshaping operators.

Reference parity (file:line cites are into /root/reference):

- where      -> libtenzir/builtins/operators/where.cpp:72-104
- select     -> libtenzir/builtins/operators/select.cpp (docs select.md:17-24)
- drop       -> libtenzir/builtins/operators/drop.cpp
- put/extend/replace/set -> libtenzir/builtins/operators/put_extend_replace_set.cpp:79-123
- rename     -> libtenzir/builtins/operators/rename.cpp (rename.md:17-22)
- head/tail  -> libtenzir/builtins/operators/head.cpp, tail.cpp
- slice      -> libtenzir/builtins/operators/slice.cpp:62-94 (python-style)
- taste      -> libtenzir/builtins/operators/taste.cpp (first N per schema)
- unique     -> libtenzir/builtins/operators/unique.cpp (ADJACENT dedup)
- deduplicate-> libtenzir/builtins/operators/deduplicate.cpp:268-309
- enumerate  -> libtenzir/builtins/operators/enumerate.cpp
- reverse    -> libtenzir/builtins/operators/reverse.cpp (= slice ::-1)

Tenzir streams are ordered; DataFrames are not. Operators whose semantics
depend on event order take an explicit ``order_by`` column (the stream
position — in our CDC world the LSN, in the test tables the event id).
That is the honest Spark restatement: order is data, not topology
(the reference itself threads an ``event_order`` property through its
optimizer, libtenzir/include/tenzir/pipeline.hpp:150-155).

Scale notes: everything here compiles to Catalyst expressions/window
functions — no Python in the hot path. Window functions over a global
order (slice/enumerate/unique with a single partition) serialize on one
task; at 100 TB you'd enumerate per-partition (monotonically_increasing_id)
or partition the window by a coarse bucket of the order column. Each
function documents the distributed-safe variant it uses.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def where(df: DataFrame, condition: Column | str) -> DataFrame:
    """Keep rows matching the predicate; Catalyst pushes it to the scan
    (the reference implements this pushdown by hand, where.cpp:110-118)."""
    return df.filter(condition)


def select(df: DataFrame, *cols: str) -> DataFrame:
    return df.select(*cols)


def drop(df: DataFrame, *cols: str) -> DataFrame:
    return df.drop(*cols)


def put(df: DataFrame, fields: Mapping[str, Column]) -> DataFrame:
    """Reshape: output EXACTLY the listed fields (put.md:17-33)."""
    return df.select(*[v.alias(k) for k, v in fields.items()])


def extend(df: DataFrame, fields: Mapping[str, Column]) -> DataFrame:
    """Append new fields; it is an error to overwrite (extend.md)."""
    clash = set(fields) & set(df.columns)
    if clash:
        raise ValueError(f"extend would overwrite {sorted(clash)}")
    return df.withColumns(dict(fields))


def set_fields(df: DataFrame, fields: Mapping[str, Column]) -> DataFrame:
    """Upsert fields (set.md)."""
    return df.withColumns(dict(fields))


def replace_fields(df: DataFrame, fields: Mapping[str, Column]) -> DataFrame:
    """Overwrite existing fields only (replace.md:17-22); extractors that
    match no field are ignored — the reference's multi-schema extractor
    semantics, where an unmatched extractor simply doesn't bind."""
    present = {k: v for k, v in fields.items() if k in df.columns}
    return df.withColumns(present) if present else df


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """``mapping`` is new_name -> old_name, as in TQL ``rename new=old``."""
    out = df
    for new, old in mapping.items():
        out = out.withColumnRenamed(old, new)
    return out


def head(df: DataFrame, n: int = 10, order_by: str | None = None) -> DataFrame:
    out = df.orderBy(order_by) if order_by else df
    return out.limit(n)


def tail(df: DataFrame, n: int = 10, order_by: str = "_seq") -> DataFrame:
    """Last N in stream order. Distributed: a descending top-N (limit
    pushes a per-partition TakeOrdered), then restore ascending order."""
    return df.orderBy(F.col(order_by).desc()).limit(n).orderBy(order_by)


def slice_rows(
    df: DataFrame,
    begin: int | None = None,
    end: int | None = None,
    stride: int | None = None,
    order_by: str = "_seq",
) -> DataFrame:
    """Python-style slice over stream order (slice.md:16-30). Non-negative
    begin/end only (negative indices need the total count — at scale,
    compute it first and normalize). Stride via modular filter on the
    row_number, exactly the reference's stride semantics."""
    w = Window.orderBy(order_by)
    pos = F.row_number().over(w) - 1  # 0-based like python slicing
    out = df.withColumn("_pos", pos)
    cond = F.lit(True)
    if begin is not None:
        cond = cond & (F.col("_pos") >= begin)
    if end is not None:
        cond = cond & (F.col("_pos") < end)
    if stride is not None and stride > 1:
        b = begin or 0
        cond = cond & (F.pmod(F.col("_pos") - b, F.lit(stride)) == 0)
    return out.filter(cond).drop("_pos")


def taste(df: DataFrame, n: int = 10, schema_col: str = "event_type",
          order_by: str = "_seq") -> DataFrame:
    """First N events per unique schema (taste.md:16-23). In the multi-
    schema world the partition key is the schema id; here any
    discriminator column plays that role."""
    w = Window.partitionBy(schema_col).orderBy(order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def unique_adjacent(df: DataFrame, cols: list[str] | None = None,
                    order_by: str = "_seq") -> DataFrame:
    """Drop ADJACENT duplicates, not global ones (unique.md:16-23) — the
    semantics of ``uniq(1)``, which dropDuplicates does NOT have."""
    subject = F.struct(*(cols or [c for c in df.columns if c != order_by]))
    w = Window.orderBy(order_by)
    prev = F.lag(subject).over(w)
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (subject != F.col("_prev")))
        .drop("_prev")
    )


def deduplicate(df: DataFrame, keys: list[str], limit: int = 1,
                order_by: str = "_seq") -> DataFrame:
    """Emit at most ``limit`` events per key, in stream order
    (deduplicate.md:20-40; hashmap suppression loop deduplicate.cpp:268-309).
    Window is keyed, so it distributes; skew on a hot key is bounded by
    ``limit`` output rows per key and AQE handles the shuffle skew."""
    w = Window.partitionBy(*keys).orderBy(order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .drop("_rn")
    )


def enumerate_rows(df: DataFrame, field: str = "index",
                   order_by: str | None = None) -> DataFrame:
    """Prepend row numbers (enumerate.md:17-25). With ``order_by`` the
    numbering is the stream position (global window — single-task at the
    window boundary; for unordered scale use monotonically_increasing_id)."""
    if order_by is None:
        return df.select(F.monotonically_increasing_id().alias(field), "*")
    w = Window.orderBy(order_by)
    return df.select((F.row_number().over(w) - 1).alias(field), "*")


def reverse(df: DataFrame, order_by: str = "_seq") -> DataFrame:
    """reverse == slice ::-1 (reverse.md); order is data, so this just
    flips the declared order column for downstream order-sensitive ops."""
    return df.orderBy(F.col(order_by).desc())
