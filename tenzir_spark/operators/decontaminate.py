"""Train/test decontamination: remove (or mark) training documents that
share a word n-gram with an evaluation set.

This is the standard LLM-pretraining hygiene step (the GPT-3 paper's
appendix-C 13-gram overlap filter; Dolma and RedPajama ship the same
shape) — not a reference operator, but a first-class training-data
pipeline addition per the project brief, alongside dedup/ANN/quality.

Scale shape (the part that must survive 100 TB):

- The EVAL side is small by definition (benchmarks are thousands of
  documents, not billions) — its distinct n-grams are broadcast, so the
  corpus-side match is a broadcast hash join with NO shuffle of corpus
  data.
- The corpus side is one narrow projection (lower/regexp/split/slice)
  exploded into (id, ngram) rows that pipeline straight into the
  broadcast join — Catalyst keeps scan→explode→join in one
  WholeStageCodegen span, nothing materializes.
- Only MATCHED rows (contaminated docs are rare by design) reach the
  aggregation, so the single shuffle is proportional to the
  contamination, not the corpus.
- mark/drop re-join the contaminated-id set back on the id key; the
  id set is bounded by the contamination count, so AQE picks a
  broadcast join in the common case.

Normalization is lowercase → non-alphanumeric runs collapse to single
spaces → trim → whitespace split; n-grams are space-joined word windows.
The DuckDB oracle in queries.py reproduces it token for token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_ngrams(col, n: int):
    """Array of space-joined word n-grams of a text column (empty array
    when the document has fewer than n words)."""
    words = F.split(
        F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " ")
    # sequence(0, k) DESCENDS when k < 0 — guard short docs explicitly.
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def array_windows(col, n: int):
    """Array of length-n rolling windows of an ARRAY column (token ids) —
    the pre-tokenized twin of _word_ngrams. sequence(1, k) DESCENDS when
    k < 1, and the otherwise branch must be an EMPTY array-of-windows
    (a singleton empty window would alias every short doc), hence the
    slice-the-singleton-to-zero construction."""
    return F.when(
        F.size(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(col) - (n - 1)),
            lambda i: F.slice(col, i, n),
        ),
    ).otherwise(F.slice(F.array(F.slice(col, 1, 0)), 1, 0))


def _ngrams_for(df: DataFrame, col_name: str, n: int):
    """Dispatch on the column's dtype: text → word n-grams, array →
    token-id windows (joinable directly — Spark equi-joins on arrays)."""
    from pyspark.sql.types import ArrayType

    if isinstance(df.select(col_name).schema[0].dataType, ArrayType):
        return array_windows(F.col(col_name), n)
    return _word_ngrams(F.col(col_name), n)


def eval_ngrams(eval_df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams of the evaluation set, as one column `ng`."""
    return (
        eval_df.select(F.explode(_ngrams_for(eval_df, text_col, n)).alias("ng"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Contaminated document ids with their distinct matched-n-gram
    counts: (id_col, n_hits). The eval n-gram set is broadcast; corpus
    n-grams stream through the join without a shuffle."""
    ev = eval_ngrams(eval_df, text_col, n)
    corp = corpus.select(
        F.col(id_col),
        F.explode(_ngrams_for(corpus, text_col, n)).alias("ng"),
    )
    return (
        corp.join(F.broadcast(ev), "ng")
        .groupBy(id_col)
        .agg(F.count_distinct("ng").alias("n_hits"))
    )


def ngram_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    mode: str = "drop",
) -> DataFrame:
    """Decontaminate a training corpus against an evaluation set.

    mode="drop" removes contaminated documents (anti join on the id);
    mode="mark" keeps every document and adds a boolean
    `is_contaminated` column.
    """
    if mode not in ("drop", "mark"):
        raise ValueError(f"mode must be 'drop' or 'mark', got {mode!r}")
    hit_ids = contamination_hits(
        corpus, eval_df, text_col, id_col, n).select(id_col)
    if mode == "drop":
        return corpus.join(hit_ids, id_col, "left_anti")
    flag = hit_ids.withColumn("is_contaminated", F.lit(True))
    return corpus.join(flag, id_col, "left").withColumn(
        "is_contaminated", F.coalesce("is_contaminated", F.lit(False)))
