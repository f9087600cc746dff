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
functions — no Python in the hot path. Operators that need a GLOBAL row
position (slice/enumerate/unique-adjacent) do NOT use a single-partition
``Window.orderBy`` (which serializes the whole input onto one task);
they use two-phase distributed numbering (``global_row_number``): an
order-preserving value bucketing of the order column, per-bucket local
ranks, and driver-computed cumulative offsets — the same cross-batch
offset accounting the reference keeps in enumerate.cpp, distributed.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _order_key(df: DataFrame, order_by: str) -> Column | None:
    """A double-valued, weakly monotone image of the order column, used
    only for bucket assignment (monotone fp rounding keeps bucket
    boundaries order-consistent). None for non-numeric orders."""
    from tenzir_spark.plans.expr import dtype_of, field_col

    dt = dtype_of(df.schema, order_by)
    c = field_col(order_by)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(c).cast("double")
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    return None


def _global_positions(
    df: DataFrame, order_by: str, out: str = "_pos", n_buckets: int | None = None
) -> tuple[DataFrame, int, str]:
    """Two-phase distributed global row numbering over ``order_by``.

    Phase 1 (slim, column-pruned passes): min/max of the order column,
    then per-bucket counts, where bucket = order-preserving fixed-width
    bin of the value — value-derived, so every pass agrees on the
    assignment with no reliance on physical partitioning or sampling.
    Phase 2: rank within each bucket (a KEYED window — distributes) plus
    the bucket's cumulative offset from a driver-side map of O(buckets)
    entries. No stage ever sees more than one bucket's rows in one task.

    Returns (df + position column + the internal bucket column, total
    row count, bucket column name, non-empty bucket ids in order).
    Caller drops the bucket column when done (unique_adjacent uses the
    bucket-id list to wire cross-bucket boundaries without any further
    global exchange).

    Requires a totally-ordered (in practice: unique) order column, same
    as any deterministic row numbering. Non-numeric order columns fall
    back to the single-task global window (documented limitation).
    """
    spark = df.sparkSession
    key = _order_key(df, order_by)
    bcol = "_gbucket"
    if key is None:
        w = Window.orderBy(order_by)
        num = df.withColumn(out, F.row_number().over(w) - 1).withColumn(
            bcol, F.lit(0)
        )
        return num, df.count(), bcol, [0]
    if n_buckets is None:
        n_buckets = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 8)
    mm = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if mm["lo"] is None:  # empty input
        return df.withColumn(out, F.lit(0).cast("long")).withColumn(bcol, F.lit(0)), 0, bcol, []
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = max((hi - lo) / n_buckets, 1e-9)
    bucket = F.least(
        F.greatest(F.floor((key - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    cnts = sorted(
        (r["_gb"], r["count"])
        for r in df.groupBy(bucket.alias("_gb")).count().collect()
    )
    total = sum(c for _b, c in cnts)
    offsets, run = {}, 0
    for b, c in cnts:
        offsets[b] = run
        run += c
    pairs = []
    for b, off in offsets.items():
        pairs += [F.lit(b), F.lit(off)]
    off_map = F.create_map(*pairs)
    w = Window.partitionBy(bcol).orderBy(order_by)
    num = df.withColumn(bcol, bucket).withColumn(
        out, (off_map[F.col(bcol)] + F.row_number().over(w) - 1).cast("long")
    )
    return num, total, bcol, [b for b, _c in cnts]


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
    """Python-style slice over stream order, INCLUDING negative indices
    and negative stride (slice.md:16-30; the reference buffers batches to
    resolve `slice -100:` / `::-1`, slice.cpp:62-94 — here the two-phase
    numbering already yields the total count, so negatives normalize with
    CPython's own ``slice.indices`` and no buffering). Distributed: the
    row position comes from ``_global_positions`` (keyed windows +
    offsets), never a single-task global sort."""
    numbered, total, bcol, _ids = _global_positions(df, order_by, out="_pos")
    start, stop, step = slice(begin, end, stride).indices(total)
    pos = F.col("_pos")
    if step > 0:
        cond = (pos >= start) & (pos < stop)
        if step > 1:
            cond = cond & (F.pmod(pos - F.lit(start), F.lit(step)) == 0)
    else:
        # descending walk: start, start+step, ... while > stop
        cond = (pos <= start) & (pos > stop) & (
            F.pmod(F.lit(start) - pos, F.lit(-step)) == 0
        )
    return numbered.filter(cond).drop("_pos", bcol)


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
    semantics of ``uniq(1)``, which dropDuplicates does NOT have.

    Distributed: lag() runs inside each order bucket (keyed window); the
    only cross-bucket dependency — each bucket's FIRST row needs the last
    subject of the previous non-empty bucket — is satisfied by a
    broadcast join of O(buckets) boundary rows. No global exchange."""
    subject_cols = cols or [c for c in df.columns if c != order_by]
    subject = F.struct(*subject_cols)
    numbered, _total, bcol, bucket_ids = _global_positions(df, order_by, out="_upos")
    # per-bucket last subject, re-addressed to the NEXT non-empty bucket
    # via a driver-built successor map over the known bucket-id list — no
    # window at all, so not even a tiny SinglePartition exchange remains
    lasts = (
        numbered.groupBy(F.col(bcol))
        .agg(F.max_by(subject, F.col("_upos")).alias("_prev_last"),
             F.max("_upos").alias("_prev_pos"))
    )
    succ_pairs = []
    for cur, nxt in zip(bucket_ids, bucket_ids[1:]):
        succ_pairs += [F.lit(cur), F.lit(nxt)]
    succ = F.create_map(*succ_pairs) if succ_pairs else F.lit(None)
    boundary = lasts.select(
        succ[F.col(bcol)].alias(bcol) if succ_pairs else F.lit(None).cast("int").alias(bcol),
        "_prev_last", "_prev_pos",
    ).filter(F.col(bcol).isNotNull())
    joined = numbered.join(F.broadcast(boundary), on=bcol, how="left")
    prev_local = F.lag(subject).over(Window.partitionBy(bcol).orderBy(order_by))
    is_first = F.col("_upos") == F.coalesce(F.col("_prev_pos") + 1, F.lit(0))
    prev = F.when(is_first, F.col("_prev_last")).otherwise(prev_local)
    return (
        joined.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (subject != F.col("_prev")))
        .drop("_prev", "_prev_last", "_prev_pos", "_upos", bcol)
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
    numbering is the stream position, computed with the two-phase
    distributed scheme (``_global_positions``) — the reference's
    cross-batch offset accounting (enumerate.cpp), not a single-task
    global window. Without ``order_by``: arbitrary-but-unique ids."""
    if order_by is None:
        return df.select(F.monotonically_increasing_id().alias(field), "*")
    numbered, _total, bcol, _ids = _global_positions(df, order_by, out=field)
    return numbered.drop(bcol).select(field, *df.columns)


def reverse(df: DataFrame, order_by: str = "_seq") -> DataFrame:
    """reverse == slice ::-1 (reverse.md); order is data, so this just
    flips the declared order column for downstream order-sensitive ops."""
    return df.orderBy(F.col(order_by).desc())
