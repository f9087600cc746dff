"""Reproducible sampling for training-data mixes.

`df.sample()` is RNG-state sampling: the kept set depends on partition
layout and Spark version, so a re-run (or the DuckDB oracle) cannot
reproduce it. Training pipelines want the opposite — a sample that is a
pure FUNCTION of the key, so re-runs, incremental refreshes, and audits
all agree. These operators keep a row iff an engine-portable hash of
(seed, key) falls under the fraction cutoff:

    keep  <=>  md5_60bit(seed || ':' || key)  <  fraction * 2^60

(same md5-derived 60-bit int the dedup/LSH family uses — DuckDB replays
it exactly, so the oracle is value-exact, and it shuffles nothing: a
narrow projection + filter that pipelines into the scan).

Reference analog: the reference samples via `taste`/`head` per schema
(deterministic prefixes); per-key hash sampling is the scale-out form a
training-mix pipeline needs (stable under repartitioning and re-runs).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

from tenzir_spark.operators.dedup import _md5_60bit

_HASH_SPACE = float(1 << 60)


def _keep_hash(key: Column, seed: int) -> Column:
    return _md5_60bit(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by hash of ``key_col`` — the
    same keys survive on every run, engine, and partitioning. Exact
    selection (not just expected counts) is reproducible by the oracle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cutoff = int(fraction * _HASH_SPACE)
    return df.filter(_keep_hash(F.col(key_col), seed) < F.lit(cutoff))


def stratified_mix(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step of a
    training pipeline ("keep 100% of wiki, 30% of web, 5% of code"):
    each stratum gets its own hash cutoff. Strata not listed keep
    ``default_fraction``. The cutoff lookup is a literal CASE chain
    (bounded by the mix spec, which is human-written and small), so the
    whole operator stays one codegen'd filter — no join, no shuffle."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    cutoff = F.lit(int(default_fraction * _HASH_SPACE))
    for s in sorted(fractions):
        cutoff = F.when(
            F.col(strata_col) == s, F.lit(int(fractions[s] * _HASH_SPACE))
        ).otherwise(cutoff)
    return df.filter(_keep_hash(F.col(key_col), seed) < cutoff)
