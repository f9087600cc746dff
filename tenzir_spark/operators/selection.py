"""DSIR-style data selection — importance resampling for training data.

Implements the hashed n-gram form of "Data Selection for Language
Models via Importance Resampling" (Xie et al. 2023, NeurIPS): documents
are featurized as hashed word n-gram bucket counts, target and raw
corpora induce two bucket distributions, and each document gets a log
importance weight  sum_g [ log p_target(b(g)) - log p_raw(b(g)) ]  over
its n-gram occurrences. Selection is Gumbel top-k over the weights —
sampling without replacement proportional to exp(weight) (Vieira 2014),
made deterministic here by deriving the Gumbel noise from the same
engine-portable md5 hash the sampling operators use.

Scale shape (the 100 TB contract):
- the exploded (id, is_target, bucket) rows repartition on the bucket
  id ONCE; both consumers — the d-row bucket histogram and the per-doc
  score aggregation — deliberately consume the same columns so column
  pruning yields identical subtrees and ReuseExchange fires (one corpus
  scan + one shuffle, the window_dedup/line_dedup pattern);
- the log-ratio table is d rows (8k by default) — broadcast, never a
  shuffled join; totals ride a 1-row scalar agg off the histogram;
- Gumbel top-k ranks via the two-phase distributed numbering
  (_global_positions), never a SinglePartition window.

Reference analog: the reference curates with `taste`/`where` per schema;
distribution-matched selection is the training-pipeline extension
(not a reference operator).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from tenzir_spark.operators.decontaminate import _word_ngrams
from tenzir_spark.operators.dedup import _md5_60bit

_HASH_SPACE = float(1 << 60)


def _bucket_ids(col: Column, d: int, n_max: int = 2) -> Column:
    """Hashed n-gram buckets (unigrams..n_max-grams) of a text column:
    md5-60bit(gram) mod d — engine-portable, so the DuckDB oracle
    replays the exact bucket assignment. Empty grams (the empty-document
    artifact of the shared normalizer) are dropped in both engines."""
    grams = _word_ngrams(col, 1)
    for n in range(2, n_max + 1):
        grams = F.concat(grams, _word_ngrams(col, n))
    grams = F.filter(grams, lambda g: F.length(g) > 0)
    return F.transform(grams, lambda g: F.pmod(_md5_60bit(g), F.lit(d)))


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    d: int = 8192,
    n_max: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``target`` is a boolean Column over ``df`` marking the target
    distribution's rows (e.g. ``F.col("source") == "wiki"``); the raw
    distribution is the whole input. With Laplace smoothing ``s``:

        p_t[h] = (n_tgt[h] + s) / (N_tgt + s*d)
        p_r[h] = (n_raw[h] + s) / (N_raw + s*d)
        weight(doc) = sum over the doc's n-gram occurrences of
                      ln p_t[bucket] - ln p_r[bucket]

    Returns (id_col, dsir_weight, is_target) with the weight rounded to
    4 decimals (both engines sum IEEE doubles in different orders; the
    published method only needs weight ORDER, so fixed rounding is
    semantically free). ``is_target`` is not just convenience: keeping
    it in the output makes the score aggregation consume the same
    columns as the histogram branch, which is what lets ReuseExchange
    collapse the two subtrees (dropping it lets Catalyst prune `_t`
    from this branch and split the exchange). Documents with no n-grams
    are absent — `dsir_resample` treats them as weight 0.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (unsmoothed buckets hit ln 0)")
    base = df.select(
        F.col(id_col),
        target.alias("_t"),
        _bucket_ids(F.col(text_col), d, n_max).alias("_b"),
    )
    # ONE exchange for both consumers: the histogram's count(id)/max-style
    # terms touch the same (id, _t, h) columns the score branch does, so
    # the pruned subtrees canonicalize identically → ReusedExchange.
    occ = base.select(id_col, "_t", F.explode("_b").alias("h")).repartition("h")
    hist = occ.groupBy("h").agg(
        F.count(id_col).alias("n_raw"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("n_tgt"),
    )
    tot = hist.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_tgt").alias("tot_tgt"))
    s = float(smoothing)
    lr = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "h",
            (
                F.log((F.col("n_tgt") + s) / (F.col("tot_tgt") + s * d))
                - F.log((F.col("n_raw") + s) / (F.col("tot_raw") + s * d))
            ).alias("_lr"),
        )
    )
    return (
        occ.join(F.broadcast(lr), "h")
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_lr"), 4).alias("dsir_weight"),
            F.max("_t").alias("is_target"),
        )
    )


def quality_classifier(
    df: DataFrame,
    text_col: str,
    d: int = 4096,
    n_max: int = 2,
) -> DataFrame:
    """Classifier-based quality filtering, fastText inference shape
    (Joulin et al. 2016: bag of hashed word n-grams → linear layer →
    sigmoid), the architecture GPT-3/CCNet used for their quality
    classifiers. Weights here are DERIVED from the feature hash (a fixed
    integer mix) instead of loaded from a trained model — deterministic
    and engine-portable, so the DuckDB oracle verifies the exact scoring
    path end to end; swapping in trained weights is a broadcast join on
    the bucket id with zero plan change.

    Per-feature integer vote  w(h) = (h*2654435761 + 40503) % 1997 - 998
    (h < d, so the product stays far below int64); the doc margin is the
    exact integer sum over its n-gram occurrences — no float in the
    decision path.  prob = sigmoid(margin / (1000 * n_features)) is
    emitted rounded to 4 decimals for inspection only.

    Adds (n_features, qc_margin, qc_prob, qc_keep). Pure projection —
    per-row aggregate over the feature array, no shuffle, linear at
    100 TB. Empty documents (no features) get margin 0 / prob 0.5 /
    keep=true, stated rather than accidental.
    """
    b = _bucket_ids(F.col(text_col), d, n_max)
    n = F.size(b)
    margin = F.aggregate(
        b,
        F.lit(0).cast("long"),
        lambda acc, h: acc + (F.pmod(h * F.lit(2654435761) + F.lit(40503),
                                     F.lit(1997)) - 998),
    )
    prob = F.when(
        n == 0, F.lit(0.5)
    ).otherwise(
        F.round(1.0 / (1.0 + F.exp(-(margin / (1000.0 * n)))), 4))
    return (
        df.withColumn("n_features", n)
        .withColumn("qc_margin", margin)
        .withColumn("qc_prob", prob)
        .withColumn("qc_keep", margin >= 0)
    )


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    fraction: float,
    d: int = 8192,
    n_max: int = 2,
    smoothing: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Gumbel top-k resampling: keep ceil(fraction * N)
    documents with the largest  weight + Gumbel(seed, id)  — sampling
    without replacement proportional to exp(weight), reproducible
    across runs/engines because the Gumbel noise derives from
    md5-60bit(seed:id) instead of an RNG. Keeps the input schema."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from tenzir_spark.operators.core import _global_positions

    # persist the slim (id, weight) table: _global_positions runs two
    # extra slim jobs (min/max, bucket counts) over `scored`, and without
    # this the whole n-gram explode + bucket shuffle would re-execute
    # once per job. Two narrow columns — safe under the no-wide-array
    # cache rule; Spark evicts LRU so no explicit unpersist is needed
    # for a returned-lazy result.
    w = dsir_weights(df, text_col, id_col, target, d, n_max, smoothing)
    w = w.select(id_col, "dsir_weight").persist()
    u = (_md5_60bit(F.concat(F.lit(f"{seed}:"),
                             F.col(id_col).cast("string"))) + 0.5) / _HASH_SPACE
    gumbel = -F.log(-F.log(u))
    scored = (
        df.join(w, id_col, "left")
        .withColumn(
            "_gk",
            -(F.coalesce(F.col("dsir_weight"), F.lit(0.0)) + gumbel))
    )
    # ascending rank of the NEGATED key == descending top-k, through the
    # two-phase distributed numbering (no SinglePartition exchange)
    numbered, total, bcol, _ids = _global_positions(scored, "_gk", out="_pos")
    k = math.ceil(fraction * total)
    return (
        numbered.filter(F.col("_pos") < k).select(*df.columns)
    )
