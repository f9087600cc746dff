"""Nested-data operators: flatten / unflatten / unroll / yield.

Reference parity:
- flatten   -> libtenzir/builtins/operators/flatten.cpp (flatten.md:17-55)
- unflatten -> libtenzir/builtins/operators/unflatten.cpp (unflatten.md:17-32)
- unroll    -> libtenzir/builtins/operators/unroll.cpp (unroll.md:17-26) —
  one output event per list element, empty/null list -> NO output event,
  which is exactly Spark's explode (not explode_outer)
- yield     -> libtenzir/builtins/operators/yield.cpp (yield.md:17-27)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten struct columns into dotted top-level names."""
    cols: list[Column] = []

    def rec(dtype: T.DataType, path: list[str]):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                rec(f.dataType, path + [f.name])
        else:
            cols.append(F.col(".".join(f"`{p}`" for p in path)).alias(sep.join(path)))

    for f in df.schema.fields:
        rec(f.dataType, [f.name])
    return df.select(*cols)


def unflatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Rebuild nested structs from separator-joined names."""
    tree: dict = {}
    for c in df.columns:
        parts = c.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = c

    def build(node) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return df.select(*[build(v).alias(k) for k, v in tree.items()])


def unroll(df: DataFrame, field: str, pos_field: str | None = None) -> DataFrame:
    """One event per list element; null/empty lists produce nothing."""
    others = [c for c in df.columns if c != field]
    if pos_field:
        return df.select(*others, F.posexplode(field).alias(pos_field, field))
    return df.select(*others, F.explode(field).alias(field))


def yield_(df: DataFrame, extractor: str) -> DataFrame:
    """Zoom into a nested record; ``a.b[].c`` unfolds the list at b."""
    parts = extractor.split(".")
    out = df
    cur: list[str] = []
    for p in parts:
        if p.endswith("[]"):
            base = ".".join(cur + [p[:-2]])
            out = out.select(F.explode(base).alias("_y"))
            cur = ["_y"]
        else:
            cur.append(p)
    col = ".".join(cur)
    out = out.select(F.col(col).alias(parts[-1].replace("[]", "")))
    return out
