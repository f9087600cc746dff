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


_C4_TERMINAL = '[.!?"”]\\s*$'  # period/!/?/straight or curly close quote


def c4_stats(df: DataFrame, text_col: str) -> DataFrame:
    """C4-style page/line heuristics (Raffel et al. 2020 §2.2, the
    published cleaning rules), pure Catalyst — no Python, no shuffle:

    - a line is KEPT iff it ends in terminal punctuation, has >= 5
      words, and does not mention "javascript" (case-insensitive);
    - the PAGE is kept iff its kept text has >= 3 sentence-terminal
      marks, and the raw page contains neither "lorem ipsum" nor "{".

    Adds: n_lines, n_kept_lines, n_sentences, c4_keep. The same rules
    re-expressed in DuckDB back the oracle entry.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n", -1)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(_C4_TERMINAL)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    kept_text = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(kept_text, F.lit("[.!?]"), F.lit(0)))
    keep = (
        (n_sent >= 3)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("n_sentences", n_sent)
        .withColumn("c4_keep", keep)
    )


def c4_filter(df: DataFrame, text_col: str) -> DataFrame:
    """Apply the C4 rules: drop rejected pages and rewrite ``text_col``
    to only the kept lines (the paper's behavior — line filtering
    mutates the page, page filters drop it)."""
    t = F.col(text_col)
    kept = F.filter(
        F.split(t, "\n", -1),
        lambda ln: ln.rlike(_C4_TERMINAL)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    stats = c4_stats(df, text_col)
    return (
        stats.filter(F.col("c4_keep"))
        .withColumn(text_col, F.array_join(kept, "\n"))
        .select(*df.columns)
    )


def repetition_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher/MassiveText-style repetition signals, pure Catalyst.

    Adds per-document columns (the published repetition-removal filters,
    Rae et al. 2021 §A1.1; reference analog: the quality operators around
    libtenzir/builtins/operators — re-expressed as whole-stage-codegen
    expressions, no Python and no shuffle):

    - ``n_lines``              non-empty line count
    - ``dup_line_frac``        fraction of non-empty lines that are repeats
    - ``dup_line_char_frac``   fraction of line characters inside lines
                               occurring >= 2 times
    - ``top_bigram_char_frac`` fraction of doc characters covered by the
                               most frequent word bigram (first-occurrence
                               tie-break, deterministic)

    Per-doc O(lines^2 + bigrams^2) lambda scans — documents are KB-scale,
    so this stays cheap and embarrassingly parallel at 100 TB (a pure
    projection: no exchange, scales linearly with input splits).
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n", -1), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(n_lines > 0, (n_lines - n_distinct) / n_lines).otherwise(0.0)
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    dup_chars = F.aggregate(
        F.filter(lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) >= 2),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    dup_line_char_frac = F.when(line_chars > 0, dup_chars / line_chars).otherwise(0.0)

    toks = F.split(F.trim(t), r"\s+")
    n_tok = F.size(toks)
    # sequence() descends on negative spans — guard short docs explicitly.
    # The top-bigram count is a sort + ONE aggregate run-scan (O(n log n));
    # a nested transform/filter count would inline the bigram construction
    # into every element evaluation (CollapseProject, no CSE) and go
    # accidentally cubic — measured 30x slower on KB-scale docs.
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_chars = F.length(t)
    # state: (prev bigram, current run, best run, best bigram); ties on the
    # run count resolve to the lexicographically smallest bigram (strict >)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit("").alias("bb"),
    )
    def _merge(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
            F.when(new_run > acc["best"], x).otherwise(acc["bb"]).alias("bb"),
        )
    top_bigram_char_frac = F.aggregate(
        F.array_sort(bigrams), init, _merge,
        lambda acc: F.when(
            (acc["best"] >= 1) & (n_chars > 0),
            acc["best"] * F.length(acc["bb"]) / n_chars,
        ).otherwise(F.lit(0.0)),
    )

    return (
        df.withColumn("n_lines", n_lines)
        .withColumn("dup_line_frac", F.round(dup_line_frac, 4))
        .withColumn("dup_line_char_frac", F.round(dup_line_char_frac, 4))
        .withColumn("top_bigram_char_frac", F.round(top_bigram_char_frac, 4))
    )


def repetition_filter(
    df: DataFrame,
    text_col: str,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
) -> DataFrame:
    """Drop documents failing the Gopher repetition thresholds (the
    published defaults); keeps the input schema (stat columns removed)."""
    stats = repetition_stats(df, text_col)
    kept = stats.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top_bigram_char_frac") <= max_top_bigram_char_frac)
    )
    return kept.select(*df.columns)


_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_BULLET_PREFIXES = ["- ", "* ", "•", "‣", "●"]


def gopher_quality_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher/MassiveText QUALITY signals (Rae et al. 2021 §A1.1 — the
    rule family next to the repetition filters in
    :func:`repetition_stats`), pure Catalyst, one projection:

    - ``n_words``            whitespace-token count
    - ``mean_word_len``      mean characters per word
    - ``symbol_word_ratio``  (# + ellipsis occurrences) / words
    - ``bullet_line_frac``   fraction of non-empty lines starting with a
                             bullet marker
    - ``ellipsis_line_frac`` fraction of non-empty lines ending in an
                             ellipsis
    - ``alpha_word_frac``    fraction of words containing >= 1 letter
    - ``gopher_stop_hits``   how many of the 8 required stopwords occur
    - ``gopher_keep``        the conjunction of the published thresholds

    Fractions round to 4 decimals (engine-portable; the DuckDB oracle
    replays every rule). Like the repetition stats this is a pure
    projection — no exchange, linear in input splits at 100 TB."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    mean_word_len = F.when(n_words > 0, sum_len / n_words).otherwise(0.0)
    n_sym = (
        F.size(F.regexp_extract_all(t, F.lit("#"), 0))
        + F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
        + F.size(F.regexp_extract_all(t, F.lit("…"), 0))
    )
    symbol_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(0.0)
    lines = F.filter(F.split(t, "\n", -1), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)

    def _is_bullet(x):
        pred = x.startswith(_BULLET_PREFIXES[0])
        for p in _BULLET_PREFIXES[1:]:
            pred = pred | x.startswith(p)
        return pred

    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, _is_bullet)) / n_lines).otherwise(0.0)
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda x: x.endswith("...") | x.endswith("…")))
        / n_lines).otherwise(0.0)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(0.0)
    stop_hits = None
    for w in _GOPHER_STOPS:
        hit = (_word_regex_count(F.lower(t), w) > 0).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    keep = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_word_len >= 3) & (mean_word_len <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("symbol_word_ratio", F.round(symbol_ratio, 4))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 4))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 4))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 4))
        .withColumn("gopher_stop_hits", stop_hits)
        .withColumn("gopher_keep", keep)
    )


def gopher_quality_filter(df: DataFrame, text_col: str) -> DataFrame:
    """Drop documents failing the Gopher §A1.1 quality thresholds;
    keeps the input schema (stat columns removed)."""
    return (
        gopher_quality_stats(df, text_col)
        .filter(F.col("gopher_keep"))
        .select(*df.columns)
    )


def doc_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    """Deterministic content fingerprint: md5 of case-folded,
    whitespace-collapsed text (the exact-dedup normalization step)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


# ---------------------------------------------------------------------------
# PII redaction — the scrubbing stage of a training-data pipeline.
# Patterns are restricted to the Java-regex ∩ RE2 subset (no lookaround,
# no backreferences) so the DuckDB oracle replays them verbatim; order
# matters (card before phone: the 4-4-4-4 grouping must be consumed
# before the looser 3-3-4 phone shape can see its tail).
# ---------------------------------------------------------------------------

PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b(?:\d{4}[ -]){3}\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def _pii_chain(col: Column, kinds: list[str]):
    """Apply the redaction chain. Per-kind counts are taken on the
    ORIGINAL text, one regexp_extract_all each — NOT on the
    progressively redacted text: Catalyst's CollapseProject inlines a
    projected expression into every consumer (no CSE), so progressive
    counts would re-run the whole prior replace chain once per count
    column (~k²/2 regex evals per row instead of 2k). The patterns are
    mutually non-overlapping by construction (alpha TLD on email,
    distinct digit groupings on ssn/card/phone/ipv4), so original-text
    counts equal progressive counts on non-adversarial input; the
    REPLACE chain stays ordered (card before phone) because rewrites do
    change what later rules see."""
    counts: dict[str, Column] = {}
    out = col
    for kind, pat, tag in PII_RULES:
        if kind not in kinds:
            continue
        counts[kind] = F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        out = F.regexp_replace(out, pat, tag)
    return out, counts


def pii_stats(df: DataFrame, text_col: str, kinds: list[str] | None = None) -> DataFrame:
    """Add one ``n_pii_<kind>`` count column per rule (email, ssn, card,
    phone, ipv4) — pure projection, no shuffle, linear at any scale."""
    kinds = kinds or [k for k, _, _ in PII_RULES]
    _, counts = _pii_chain(F.col(text_col), kinds)
    out = df
    for kind, c in counts.items():
        out = out.withColumn(f"n_pii_{kind}", c)
    return out


def pii_redact(df: DataFrame, text_col: str, kinds: list[str] | None = None) -> DataFrame:
    """Rewrite ``text_col`` with every PII match replaced by its
    ``<KIND>`` tag. Pure Catalyst regexp_replace chain (whole-stage
    codegen, no Python, no shuffle)."""
    kinds = kinds or [k for k, _, _ in PII_RULES]
    col, _ = _pii_chain(F.col(text_col), kinds)
    return df.withColumn(text_col, col)
