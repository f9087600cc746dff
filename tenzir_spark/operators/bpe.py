"""BPE tokenization — train on a deterministic sample, apply distributed.

The text→tokens step of a training-data pipeline (Sennrich et al. 2016
byte-pair encoding, the GPT-2-style word-internal variant): merges are
learned greedily from word frequencies, then applied per word.

Scale shape (the 100 TB contract, same pattern as the IVF quantizer):
- TRAIN is driver-side Python over a bounded, deterministic sample
  (hash-mod selection — reproducible across runs/engines). Production
  tokenizers are always trained on a sample; a corpus-wide iterative
  merge loop would be one shuffle per merge, which is the wrong shape.
  The only distributed work is ONE word-frequency aggregation over the
  sampled docs (exploded words → groupBy), so the driver sees
  O(distinct words of the sample), never documents.
- ENCODE is an Arrow-batched pandas UDF over mapInPandas (the allowed
  Python path for genuinely non-expressible ops — BPE's data-dependent
  merge loop has no Catalyst form). Merges broadcast via closure
  capture; per-batch word memoization makes cost ∝ distinct words per
  batch, not tokens. No shuffle: encode is a pure projection and scales
  linearly with input splits.

Reference analog: the reference has no tokenizer; this is a
training-pipeline extension (brief: "token counting (whitespace + a
BPE-ish regex)"— this is the real BPE beside that estimator).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from tenzir_spark.operators.dedup import _md5_60bit

_END = "</w>"  # end-of-word marker (word-internal BPE, GPT-2 style)
_HASH_SPACE = float(1 << 60)


def _words(col):
    # the shared curation normalizer: lowercase, non-alnum → space
    return F.split(
        F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " ")


def _merge_word(sym: tuple[str, ...], ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply merges to one word's symbol tuple, always collapsing the
    lowest-rank (earliest-learned) pair first — the standard BPE encode
    loop."""
    sym = list(sym)
    while len(sym) > 1:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        sym[best:best + 2] = [sym[best] + sym[best + 1]]
    return tuple(sym)


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 256,
    sample_mod: int = 1,
    seed: int = 42,
    id_col: str | None = None,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from word frequencies.

    ``sample_mod`` > 1 trains on the deterministic 1/sample_mod document
    sample selected by md5-60bit(seed:id) % sample_mod == 0 (requires
    ``id_col``) — the bounded-build path for big corpora. Ties on pair
    frequency break to the lexicographically smallest pair, so the
    learned merges are a pure function of the corpus.

    The driver materializes at most ``max_words`` distinct words — the
    most frequent, tie-broken lexicographically (TakeOrderedAndProject,
    scale-safe). A web corpus has 10^7-10^8 distinct normalized words;
    the frequency tail beyond the top million cannot influence early
    merges, so the cap changes nothing in practice while making the
    driver bound unconditional (not dependent on remembering
    ``sample_mod``).
    """
    src = df
    if sample_mod > 1:
        if id_col is None:
            raise ValueError("sample_mod > 1 requires id_col")
        src = df.filter(
            F.pmod(
                _md5_60bit(F.concat(F.lit(f"{seed}:"),
                                    F.col(id_col).cast("string"))),
                F.lit(sample_mod)) == 0)
    freqs = (
        src.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in freqs:
        sym = tuple(r["w"]) + (_END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["count"])
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # deterministic argmax: max count, then smallest pair
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + n
        vocab = nxt
    return merges


_ALPHABET = tuple("abcdefghijklmnopqrstuvwxyz0123456789")


def bpe_vocab(merges: Iterable[tuple[str, str]]) -> dict[str, int]:
    """Token→id table covering EVERY token ``bpe_encode`` can emit: the
    end marker, the full normalizer alphabet ([a-z0-9] — the only
    single-char symbols that survive normalization), and every merged
    symbol, ids assigned in deterministic sorted order."""
    seen = {_END, *_ALPHABET}
    for a, b in merges:
        for t in (a, b, a + b):
            seen.add(t)
    return {t: i for i, t in enumerate(sorted(seen))}


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out``: array<string> of BPE tokens for ``text_col``.

    Arrow-batched (mapInPandas); a per-batch word cache bounds the merge
    loop to distinct words. Unknown characters survive as single-char
    symbols (open vocabulary — nothing is dropped)."""
    if text_col not in df.columns:
        # pandas batches carry top-level columns only — a dotted nested
        # path resolves in Catalyst but KeyErrors inside every task
        raise ValueError(
            f"bpe_encode needs a top-level text column, got {text_col!r} "
            "(flatten/select the nested field first)")
    if out in df.columns:
        raise ValueError(
            f"output column {out!r} already exists (same guard as extend)")
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    fields = df.schema.fields + [T.StructField(out, T.ArrayType(T.StringType()))]
    schema = T.StructType(fields)

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = list(_merge_word(tuple(w) + (_END,), ranks))
                cache[w] = got
            return got

        norm = re.compile(r"[^a-z0-9]+")

        def enc_text(t) -> list[str]:
            if t is None:
                return []
            toks: list[str] = []
            for w in norm.sub(" ", str(t).lower()).strip().split(" "):
                if w:
                    toks.extend(enc_word(w))
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = pdf[text_col].map(enc_text)
            yield pdf

    return df.mapInPandas(_enc, schema)


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Driver-side helper: reassemble text from BPE tokens (words are
    joined with single spaces — the normalizer's canonical form)."""
    text = "".join(tokens)
    return text.replace(_END, " ").strip()
