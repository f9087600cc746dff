"""N-gram language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2020) and most web-corpus pipelines after it score
every document with a language model trained on a trusted corpus
(Wikipedia) and drop the worst-perplexity tail. This module implements
that stage natively on Spark with a count-based bigram model and
"stupid backoff" smoothing (Brants et al. 2007, "Large Language Models
in Machine Translation" — the scheme built for exactly this regime:
distributed counts, no normalization pass):

    S(w | w_prev) = c(w_prev w) / c(w_prev)        if c(w_prev w) > 0
                  = alpha * (c(w) + 1) / (N + V)   otherwise

where the backoff unigram is Laplace-smoothed so out-of-vocabulary
words score finitely. A document's score is the mean ln S over its
bigram positions; ``lm_ppl = exp(-mean)`` is the familiar perplexity
form. Every count and every arithmetic step is engine-portable, so the
DuckDB oracle replays it exactly (mean rounded to 4 decimals — engines
sum IEEE doubles in different orders and the method only needs score
ORDER, the dsir_weights convention).

Scale shape (the 100 TB contract):
- the model is two count tables (unigram, bigram) built with partial-
  agg'd groupBys over the REFERENCE corpus only (the trusted subset —
  normally ≪ the corpus being scored), plus a 1-row totals aggregate
  broadcast as a crossJoin (never a driver-side literal);
- scoring explodes each document to its bigram occurrences and resolves
  counts with three hash joins on token keys (bigram, context word,
  current word). Vocabulary tables are vocab-sized, not corpus-sized —
  AQE turns these into broadcast joins whenever the model fits, and the
  shuffle-join fallback is exactly how Brants et al. sharded their LM;
- the final per-document mean is one partial-agg'd groupBy(id) — no
  windows, no driver materialization.

Reference analog: the reference's quality signals are rule-based
(`where`, `taste`); model-based quality scoring is the training-data
extension (pairs with operators/text.py quality_score and
operators/selection.py dsir_weights).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tenzir_spark.operators.decontaminate import _word_ngrams


def lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref_filter: Column,
    alpha: float = 0.4,
) -> DataFrame:
    """Score every document with a stupid-backoff bigram LM trained on
    the rows matching ``ref_filter`` (the trusted/reference corpus).

    Returns (id_col, n_scored, lm_logprob, lm_ppl):
    - ``n_scored``: number of scored bigram positions (word count − 1);
    - ``lm_logprob``: mean ln S per position, rounded to 4 decimals;
    - ``lm_ppl``: exp(−lm_logprob) rounded to 4 decimals (computed from
      the rounded mean so both engines agree bit-for-bit).
    Documents with fewer than two words carry NULL score columns and
    n_scored = 0.
    """
    ref = df.filter(ref_filter)
    if ref.isEmpty():
        # without this, every score would be NULL (the totals aggregate
        # over an empty model is NULL) and a downstream lm_filter would
        # silently keep everything — fail loud on the misconfiguration
        raise ValueError(
            "lm_score: ref_filter matches no rows — the model has no "
            "training corpus (check the field/value)")
    uni = (
        ref.select(F.explode(
            F.filter(_word_ngrams(F.col(text_col), 1),
                     lambda g: F.length(g) > 0)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        ref.select(F.explode(
            _word_ngrams(F.col(text_col), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c2"))
    )
    tot = uni.agg(
        F.sum("c1").alias("n_tok"), F.count("*").alias("n_vocab"))

    occ = df.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), 2)).alias("g"),
    )
    scored = (
        occ.join(bi, "g", "left")
        .withColumn("_ctx", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
        .withColumn("_w", F.split_part(F.col("g"), F.lit(" "), F.lit(2)))
        .join(uni.select(F.col("w").alias("_ctx"),
                         F.col("c1").alias("c_ctx")), "_ctx", "left")
        .join(uni.select(F.col("w").alias("_w"),
                         F.col("c1").alias("c_w")), "_w", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_lnp",
            F.when(
                F.col("c2").isNotNull() & (F.col("c_ctx") > 0),
                F.log(F.col("c2") / F.col("c_ctx")),
            ).otherwise(
                F.log(
                    F.lit(float(alpha))
                    * (F.coalesce(F.col("c_w"), F.lit(0)) + 1)
                    / (F.col("n_tok") + F.col("n_vocab"))
                )
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.round(F.avg("_lnp"), 4).alias("lm_logprob"),
        )
        .withColumn("lm_ppl", F.round(F.exp(-F.col("lm_logprob")), 4))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("n_scored",
                    F.coalesce(F.col("n_scored"), F.lit(0)).cast("long"))
    )


def lm_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref_filter: Column,
    max_ppl: float,
    alpha: float = 0.4,
) -> DataFrame:
    """Keep rows whose LM perplexity under the reference-corpus model is
    at most ``max_ppl`` (short docs with no bigrams are kept — they have
    no evidence either way; CCNet routes them to a separate bucket).
    Preserves the input schema."""
    scores = lm_score(df, text_col, id_col, ref_filter, alpha).select(
        F.col(id_col).alias("_lm_id"), "lm_ppl")
    # null-safe LEFT join: a NULL id row must pass through like any other
    # unscorable doc, not vanish in an inner equi-join. (Ids are assumed
    # unique — duplicate ids would fan out here, as in any keyed attach.)
    return (
        df.join(scores, df[id_col].eqNullSafe(F.col("_lm_id")), "left")
        .filter(F.col("lm_ppl").isNull() | (F.col("lm_ppl") <= max_ppl))
        .select(*df.columns)
    )
