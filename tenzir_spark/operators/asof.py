"""Temporal operators: distributed as-of join, LOCF gap-fill, and
inactivity-gap sessionization — all the same scale shape (one hash
exchange on the key, one in-partition sort, running window functions).

asof_join attaches to each left row the most recent right row
at-or-before its timestamp, per key.

The canonical enrichment for event streams ("what was the config /
price / context when this event happened") that plain equi-joins can't
express. The reference reaches the same shape through context time
travel (`/root/reference/web/docs/contexts.md`, lookup --retro);
here it is a first-class relational operator with pandas.merge_asof
semantics (backward/forward, tolerance), re-expressed Spark-first.

Plan shape — NO join node at all: both sides are union'd on
(key, ts, side-tag) and the match is a per-key running ``last(payload,
ignorenulls=True)`` window. That is ONE hash exchange on the key and
one in-partition sort; candidate work is O(|L|+|R|) rows, never
|L|x|R| pairs, and there is no build-side to broadcast or spill — the
scale-safe shape for 10^9-row event tables (a sort-merge join with an
inequality would degenerate to a range scan per key; a cartesian is
out of the question). A hot key serializes inside its partition — an
inherent property of per-key temporal order (same bound the reference's
ordered per-schema evaluation has).

Determinism: when several right rows share (key, ts), the LARGEST
payload struct wins (lexicographic across payload fields) — the window
orders by the payload struct within equal (ts, side) so the running
last() lands on it; the result never depends on partition layout and
costs no extra exchange or aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, on: str | list[str], ts: str,
               gap_s: float, out: str = "session_no",
               order: list[str] | None = None) -> DataFrame:
    """Assign inactivity-gap session numbers per key (batch twin of the
    streaming session_window rollup in streaming/stateful.py): a row
    starts a new session when it is the key's first event or arrives
    more than ``gap_s`` seconds after the previous one; ``out`` is the
    0-based running session index per key. ``order`` adds tiebreak
    columns after ``ts`` for duplicate timestamps.

    One hash exchange on the key + one in-partition sort; the lag and
    the running sum ride the same Window spec (one WindowExec).
    Timestamps may be timestamp[_ntz] or plain numerics — gaps compare
    on a double cast (seconds for timestamps).
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    ord_cols = [F.col(ts).asc(), *[F.col(c).asc() for c in (order or [])]]
    w = Window.partitionBy(*keys).orderBy(*ord_cols)
    if isinstance(df.schema[ts].dataType,
                  (T.TimestampType, T.TimestampNTZType)):
        # integer epoch-micros: the gap compare is exact (a double-seconds
        # cast is ~0.2 µs sloppy at current epochs — enough to flip a
        # boundary row against an integer-math oracle)
        tnum = F.unix_micros(F.col(ts).cast("timestamp"))
        gap = F.lit(int(round(gap_s * 1_000_000)))
    else:
        tnum = F.col(ts).cast("double")
        gap = F.lit(float(gap_s))
    is_new = F.when(
        F.lag(tnum).over(w).isNull()
        | ((tnum - F.lag(tnum).over(w)) > gap),
        F.lit(1)).otherwise(F.lit(0))
    run = (Window.partitionBy(*keys).orderBy(*ord_cols)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_new", is_new)
            .withColumn(out, (F.sum("_new").over(run) - 1).cast("long"))
            .drop("_new"))


def _orderable(dt) -> bool:
    """Spark sort-orderability: maps are not orderable; arrays/structs
    are orderable iff their element/field types are."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _gap_terms(dt, lcol: Column, rcol: Column, tol_s: float):
    """Numeric (l, r, tolerance) terms for a timestamp-gap compare:
    integer epoch-micros for timestamp columns (exact — a double-seconds
    cast is ~0.2 µs sloppy at current epochs and flips boundary rows),
    double units for numeric ts columns."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return (F.unix_micros(lcol.cast("timestamp")),
                F.unix_micros(rcol.cast("timestamp")),
                F.lit(int(round(tol_s * 1_000_000))))
    return (lcol.cast("double"), rcol.cast("double"),
            F.lit(float(tol_s)))


_ROLL_FNS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
             "count": F.count}


def rolling_agg(df: DataFrame, on: str | list[str], ts: str, col: str,
                window_s: float, fns: tuple[str, ...] = ("avg",),
                ) -> DataFrame:
    """Trailing time-window aggregates per key: for each row, aggregate
    ``col`` over the key's rows with ``ts`` in ``[row.ts - window_s,
    row.ts]`` (RANGE frame — all rows sharing a timestamp get the same
    frame, so duplicate timestamps stay deterministic without a
    tiebreak). Emits one ``{fn}_{col}_roll`` column per fn.

    Timestamp columns order on integer epoch-micros (exact frame
    bounds); numeric ``ts`` columns compare as doubles. Same scale
    shape as the rest of this module: one hash exchange, one sort, one
    WindowExec evaluating every frame in a single pass.
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    bad = [f for f in fns if f not in _ROLL_FNS]
    if bad:
        raise ValueError(f"rolling_agg: unknown fn(s) {bad}; "
                         f"supported: {sorted(_ROLL_FNS)}")
    if isinstance(df.schema[ts].dataType,
                  (T.TimestampType, T.TimestampNTZType)):
        tnum = F.unix_micros(F.col(ts).cast("timestamp"))
        lo = -int(round(window_s * 1_000_000))
    else:
        # pyspark's rangeBetween takes integer offsets only — scale
        # numeric ts to integer micro-units so fractional timestamps
        # keep their frame membership (a bare cast('long') truncates
        # VALUES while the offset rounds — up to a whole unit of skew)
        tnum = F.round(F.col(ts).cast("double") * 1_000_000).cast("long")
        lo = -int(round(window_s * 1_000_000))
    w = (Window.partitionBy(*keys).orderBy(tnum.asc())
         .rangeBetween(lo, Window.currentRow))
    out = df
    for f in fns:
        out = out.withColumn(
            f"{f}_{col}_roll", _ROLL_FNS[f](F.col(col)).over(w))
    return out


def fill_forward(df: DataFrame, on: str | list[str], ts: str,
                 cols: list[str], order: list[str] | None = None) -> DataFrame:
    """Last-observation-carried-forward: per key, replace nulls in
    ``cols`` with the most recent non-null value at-or-before each row's
    ``ts`` (the classic gap-fill for sparse metric/state streams; the
    degenerate self-as-of-join). ``order`` adds tiebreak columns after
    ``ts`` so duplicate timestamps fill deterministically.

    Same scale shape as asof_join: ONE hash exchange on the key, one
    in-partition sort, a running ``last(ignorenulls)`` per column —
    O(n) rows, no join, no driver materialization.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts).asc(), *[F.col(c).asc() for c in (order or [])])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str, right_ts: str | None = None,
              direction: str = "backward",
              tolerance_s: float | None = None,
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction="backward", equal ts
    matches) or the smallest ``right_ts`` >= ``left_ts`` ("forward")
    sharing the key column(s) ``on``. Unmatched left rows keep nulls
    (left-outer semantics, like pandas.merge_asof).

    ``tolerance_s`` (seconds, or plain units for numeric ts columns)
    nulls the match when the timestamp gap exceeds it. Right non-key
    columns that collide with left names get ``suffix`` (repeated until
    unique, so chained joins never emit ambiguous names); the matched
    right timestamp is always emitted as ``{right_ts}{suffix}``.

    NULL timestamps never match: null-ts right rows are dropped, null-ts
    left rows come back with a null match (pandas.merge_asof refuses
    them outright; a scan-order window would otherwise hand backward
    scans a nulls-first phantom match and forward scans the global
    minimum).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward or "
                         f"forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload_cols = [c for c in right.columns
                    if c not in keys and c != right_ts]

    # carry the matched right timestamp inside the payload so one
    # running last() resolves both the row and its ts; (key, ts)
    # duplicates need NO pre-aggregation — the window below orders by
    # the payload struct within equal (ts, side), so the running last()
    # lands on the max struct (same comparator as F.max over structs).
    # Map-typed payloads are UNORDERABLE in Spark: drop the tiebreak
    # term for them (ties then resolve by partition scan order — the
    # analysis error would otherwise reject the whole join).
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    rd = (right.filter(F.col(right_ts).isNotNull())
          .select(*keys, F.col(right_ts).alias("_ts"),
                  F.struct(F.col(right_ts).alias("_mts"),
                           payload_struct.alias("_pv")).alias("_p")))
    tie_ord = ([F.col("_p").asc()]
               if _orderable(rd.schema["_p"].dataType) else [])

    ld = left.select(*left.columns, F.col(left_ts).alias("_ts"),
                     F.lit(None).cast(rd.schema["_p"].dataType).alias("_p"),
                     F.lit(1).alias("_is_left"))
    rd = rd.select(*[F.col(c) if c in keys
                     else F.lit(None).cast(left.schema[c].dataType).alias(c)
                     for c in left.columns],
                   "_ts", "_p", F.lit(0).alias("_is_left"))

    # backward: scan time ascending, right rows sort BEFORE left rows at
    # equal ts (equal matches); forward: scan descending, same tie rule
    ts_ord = F.col("_ts").asc() if direction == "backward" \
        else F.col("_ts").desc()
    w = (Window.partitionBy(*keys)
         .orderBy(ts_ord, F.col("_is_left").asc(), *tie_ord)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.last("_p", ignorenulls=True).over(w)
    matched = (ld.unionByName(rd)
               .withColumn("_m", F.when(F.col("_ts").isNotNull(), run))
               .filter(F.col("_is_left") == 1))

    m_ts = F.col("_m").getField("_mts")
    if tolerance_s is not None:
        lnum, rnum, tol = _gap_terms(
            left.schema[left_ts].dataType, F.col("_ts"), m_ts, tolerance_s)
        gap = (lnum - rnum) if direction == "backward" else (rnum - lnum)
        matched = matched.withColumn(
            "_m", F.when(gap <= tol, F.col("_m")))
        m_ts = F.col("_m").getField("_mts")

    taken = set(left.columns)

    def _fresh(name: str) -> str:
        while name in taken:
            name += suffix
        taken.add(name)
        return name

    out_ts = _fresh(right_ts + suffix
                    if right_ts in taken or right_ts in payload_cols
                    else right_ts)
    cols = [F.col(c) for c in left.columns]
    cols.append(m_ts.alias(out_ts))
    for c in payload_cols:
        cols.append(F.col("_m").getField("_pv").getField(c)
                    .alias(_fresh(c)))
    return matched.select(*cols)
