"""Comparison helpers for engine-vs-oracle state equality."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(int(x) for x in seq)
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if pd.api.types.is_integer(v):
        return int(v)
    return v


def rows_of(df: pd.DataFrame, cols: list[str]) -> list[tuple]:
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_norm_cell(v) for v in row))
    return sorted(out, key=lambda t: str(t[0]))


def assert_state_equal(engine_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    cols = ["doc_id", "tokens", "n_tok", "source"]
    if "meta" in oracle_pdf.columns and "meta" in engine_pdf.columns:
        cols.append("meta")
    e = rows_of(engine_pdf, cols)
    o = rows_of(oracle_pdf, cols)
    assert len(e) == len(o), f"row count {len(e)} != oracle {len(o)}"
    for i, (a, b) in enumerate(zip(e, o)):
        assert a == b, f"row {i} mismatch:\n engine={a}\n oracle={b}"
