"""Naive single-threaded replay oracle (FIXTURES.md §2.3).

Applies every change event in global LSN order, first delivery wins for
duplicate LSNs. Deliberately simple and independent of the Spark engine —
the golden reference for the replay/resume/evolution tests.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq


def naive_replay(changes_dir: str) -> pd.DataFrame:
    files = sorted(
        glob.glob(os.path.join(changes_dir, "batch-*.parquet"))
        + glob.glob(os.path.join(changes_dir, "batch-*", "part-*.parquet"))
    )
    frames = [pq.read_table(f).to_pandas() for f in files]
    all_cols = ["lsn", "op", "doc_id", "tokens", "n_tok", "source", "meta"]
    norm = []
    for df in frames:
        for c in all_cols:
            if c not in df.columns:
                df[c] = None
        norm.append(df[all_cols])
    log = pd.concat(norm, ignore_index=True)
    log = log.sort_values("lsn", kind="stable").drop_duplicates("lsn", keep="first")

    state: dict[str, dict] = {}
    for row in log.itertuples(index=False):
        if row.op == "schema_change" or row.doc_id is None:
            continue
        if row.op == "delete":
            state.pop(row.doc_id, None)
        else:
            state[row.doc_id] = {
                "doc_id": row.doc_id,
                "tokens": None if row.tokens is None else [int(x) for x in row.tokens],
                "n_tok": None if pd.isna(row.n_tok) else int(row.n_tok),
                "source": row.source,
                "meta": row.meta if isinstance(row.meta, str) else None,
            }
    out = pd.DataFrame(
        list(state.values()),
        columns=["doc_id", "tokens", "n_tok", "source", "meta"],
    )
    return out.sort_values("doc_id").reset_index(drop=True)
