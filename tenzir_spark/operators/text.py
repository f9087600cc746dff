"""Text-analysis operators for training-data curation.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting — each a pure-Catalyst expression pipeline
(no Python in the hot path) with an exact DuckDB-SQL mirror for the
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (deterministic heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]


def _word_regex_count(col: Column, word: str) -> Column:
    # word-boundary occurrences; identical semantics in duckdb's
    # regexp_extract_all length
    return F.size(F.regexp_extract_all(col, F.lit(rf"\b{word}\b"), F.lit(0)))


def token_count(df: DataFrame, text_col: str, out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (the cheap pre-BPE estimator)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.withColumn(out, F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(F.size(toks)))


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Length/stopword/word-length quality features + a composite score,
    all as columns (the usual Gopher/C4-style cheap filters)."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    mean_word_len = (F.length(F.trim(t)) - (n_tok - 1)) / n_tok  # chars sans separators
    stop_hits = None
    for w in EN_STOPWORDS:
        c = _word_regex_count(t, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    stop_ratio = stop_hits / n_tok
    score = (
        F.when(n_tok < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.4
            + F.least(F.lit(1.0), stop_ratio * 5) * 0.4
            + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.2).otherwise(0.0)
        )
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("stop_ratio", F.round(stop_ratio, 4))
        .withColumn("quality", F.round(score, 4))
    )


def lang_id(df: DataFrame, text_col: str, out: str = "lang_pred") -> DataFrame:
    """N-gram/stopword language heuristic: count per-language marker words,
    argmax with deterministic tie-break on language code order."""
    scores = {
        lang: sum([_word_regex_count(F.col(text_col), w) for w in words[1:]],
                  _word_regex_count(F.col(text_col), words[0]))
        for lang, words in LANG_MARKERS.items()
    }
    best = None
    # deterministic argmax: iterate langs sorted, strictly-greater wins
    for lang in sorted(scores):
        this = scores[lang]
        if best is None:
            best = (F.lit(lang), this)
        else:
            name, val = best
            best = (F.when(this > val, F.lit(lang)).otherwise(name),
                    F.greatest(this, val))
    name, val = best
    return df.withColumn(out, F.when(val <= 0, F.lit("und")).otherwise(name))


def doc_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    """Deterministic content fingerprint: md5 of case-folded,
    whitespace-collapsed text (the exact-dedup normalization step)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))
