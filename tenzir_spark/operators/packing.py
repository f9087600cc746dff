"""Sequence packing: concatenate documents (in a stable order) and cut
the token stream into fixed-size training blocks — the GPT-style
"pack then chunk" step that turns a cleaned corpus into equal-length
training sequences.

The output is one row per (document, block) SPAN — pure metadata, the
tokens never move:

    (id, block_id, doc_offset, block_offset, span_len)

meaning: block `block_id` takes `span_len` tokens starting at
`doc_offset` inside the document, landing at `block_offset` inside the
block. A materializer (the trainer's data loader, or a later join) can
gather any block's tokens from exactly the spans with its id.

Scale shape:
- The only global step is a PREFIX SUM of token counts over the doc
  order — computed with the same two-phase value-bucketed scheme as
  core._global_positions (slim min/max + per-bucket sums, O(buckets)
  on the driver, then a KEYED window per bucket). No SinglePartition
  exchange, no sort of the full data.
- Span generation is a per-row explode over sequence(first_block,
  last_block) — arithmetic only, stays in whole-stage codegen, and is
  linear in output spans (a doc spanning k blocks emits k rows).
- Nothing re-shuffles on block_id here; a consumer that wants blocks
  co-located groups by block_id downstream (one shuffle of metadata
  rows, never of token arrays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from tenzir_spark.operators.core import _order_key


def _global_prefix_sum(
    df: DataFrame,
    order_by: str,
    weight: Column,
    out: str = "_presum",
    n_buckets: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of ``weight`` over ``order_by`` order,
    two-phase distributed (see module docstring). Requires a numeric,
    in-practice-unique order column, like every global-order operator
    here (core.py:61 contract)."""
    spark = df.sparkSession
    key = _order_key(df, order_by)
    if key is None:
        raise ValueError(
            f"pack_sequences needs a numeric order column, got {order_by!r}")
    if n_buckets is None:
        n_buckets = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 8)
    mm = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if mm["lo"] is None:  # empty input
        return df.withColumn(out, F.lit(0).cast("long"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = max((hi - lo) / n_buckets, 1e-9)
    bucket = F.least(
        F.greatest(F.floor((key - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    sums = sorted(
        (r["_gb"], r["s"])
        for r in df.groupBy(bucket.alias("_gb"))
        .agg(F.sum(weight).alias("s")).collect()
    )
    offsets, run = {}, 0
    for b, s in sums:
        offsets[b] = run
        run += int(s or 0)
    pairs: list[Column] = []
    for b, off in offsets.items():
        pairs += [F.lit(b), F.lit(off)]
    off_map = F.create_map(*pairs)
    w = (
        Window.partitionBy("_gbucket").orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("_gbucket", bucket)
        .withColumn(
            out,
            (
                off_map[F.col("_gbucket")]
                + F.coalesce(F.sum(weight).over(w), F.lit(0))
            ).cast("long"),
        )
        .drop("_gbucket")
    )


def materialize_blocks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    order_by: str | None = None,
    block: int = 2048,
) -> DataFrame:
    """Gather the actual tokens per training block: (block_id, tokens)
    with len(tokens) == block for every block but the last.

    Same span math as ``pack_sequences`` but computed in ONE pass with
    the token arrays carried along, so no join is needed: each doc
    emits its per-block slice, the slices shuffle once keyed on
    block_id (exactly the tokens move — the unavoidable data motion of
    packing), and reassembly is sort_array over (block_offset, slice)
    structs + flatten. Per-group state is bounded by `block` tokens, so
    the aggregation cannot blow up on skew."""
    if block <= 0:
        raise ValueError(f"block must be positive, got {block}")
    order_by = order_by or id_col
    # leaf-name normalization — see pack_sequences
    docs = df.select(F.col(id_col).alias(id_col.split(".")[-1]),
                     F.col(tokens_col).alias(tokens_col.split(".")[-1]))
    id_col, tokens_col = id_col.split(".")[-1], tokens_col.split(".")[-1]
    if order_by not in (id_col, tokens_col):
        order_by = order_by.split(".")[-1]
    toks = F.col(tokens_col)
    docs = docs.filter(F.size(toks) > 0)
    pre = _global_prefix_sum(docs, order_by, F.size(toks).cast("long"),
                             out="_start")
    start = F.col("_start")
    n = F.size(toks).cast("long")
    first_b = F.floor(start / block).cast("long")
    last_b = F.floor((start + n - 1) / block).cast("long")
    b = F.col("block_id")
    doc_off = F.greatest(F.lit(0), b * block - start)
    span_len = (
        F.least(start + n, (b + 1) * block) - F.greatest(start, b * block)
    )
    spans = pre.select(
        start,
        toks,
        F.explode(F.sequence(first_b, last_b)).alias("block_id"),
    ).select(
        b,
        F.greatest(F.lit(0), start - b * block).alias("_boff"),
        F.slice(toks, (doc_off + 1).cast("int"),
                span_len.cast("int")).alias("_slice"),
    )
    return (
        spans.groupBy("block_id")
        .agg(F.sort_array(F.collect_list(F.struct("_boff", "_slice"))).alias("_parts"))
        .select(
            "block_id",
            F.flatten(F.transform("_parts", lambda p: p["_slice"])).alias("tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tok_col: str,
    order_by: str | None = None,
    block: int = 2048,
) -> DataFrame:
    """Assign every document's tokens to fixed-size training blocks.

    Documents are laid end-to-end in ``order_by`` order (default: the id
    column) and the stream is cut every ``block`` tokens. Rows with a
    NULL or non-positive token count contribute nothing and emit no
    spans. Returns (id_col, block_id, doc_offset, block_offset,
    span_len) — see module docstring.
    """
    if block <= 0:
        raise ValueError(f"block must be positive, got {block}")
    order_by = order_by or id_col
    n = F.col(n_tok_col).cast("long")
    # dotted paths flatten to their leaf names in the select — reference
    # by leaf afterwards (same latent trap chunk_documents fixes)
    docs = (df.filter(n.isNotNull() & (n > 0))
            .select(F.col(id_col).alias(id_col.split(".")[-1]),
                    F.col(n_tok_col).alias(n_tok_col.split(".")[-1])))
    id_col, n_tok_col = id_col.split(".")[-1], n_tok_col.split(".")[-1]
    if order_by not in (id_col, n_tok_col):
        order_by = order_by.split(".")[-1]
    n = F.col(n_tok_col).cast("long")
    pre = _global_prefix_sum(docs, order_by, n, out="_start")
    start = F.col("_start")
    first_b = F.floor(start / block).cast("long")
    last_b = F.floor((start + n - 1) / block).cast("long")
    b = F.col("block_id")
    return (
        pre.select(
            F.col(id_col),
            start,
            n.alias("_n"),
            F.explode(F.sequence(first_b, last_b)).alias("block_id"),
        )
        .select(
            id_col,
            b,
            F.greatest(F.lit(0), b * block - start).alias("doc_offset"),
            F.greatest(F.lit(0), start - b * block).alias("block_offset"),
            (
                F.least(start + F.col("_n"), (b + 1) * block)
                - F.greatest(start, b * block)
            ).alias("span_len"),
        )
    )


def chunk_documents(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    max_len: int = 512,
    overlap: int = 0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split over-long token sequences into <= ``max_len``-token chunks
    with ``overlap`` shared tokens between neighbors — the other standard
    corpus→training-sequence shape beside pack_sequences: packing
    concatenates SHORT docs into fixed blocks; chunking slides a window
    over LONG docs (BERT-style striding, RAG chunkers, long-document
    pretraining), keeping provenance instead of crossing documents.

    Output: one row per chunk — (id_col, chunk_idx, chunk_tokens,
    chunk_len, n_chunks [, keep_cols…]), chunk_idx 0-based in document
    order, stride = max_len - overlap, the last chunk short rather than
    padded (the trainer pads). A doc with <= max_len tokens yields itself
    as chunk 0 unchanged. NULL/empty token arrays yield no rows (same
    contract as explode).

    Scale shape: pure Catalyst, ZERO shuffle — scan → generate(posexplode
    of the stride arithmetic) → project(F.slice) fuse into one
    whole-stage-codegen pipeline; the parent token array is read in
    place per input row, never joined or re-shuffled, and output volume
    is exactly the chunk tokens (each input token lands in at most
    ceil(max_len/stride) chunks). Degenerate tails are suppressed the
    standard way: a last window that would contain only overlap tokens
    (fully contained in its predecessor) is not emitted.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    if not 0 <= overlap < max_len:
        raise ValueError(
            f"overlap must be in [0, max_len), got {overlap} vs {max_len}")
    stride = max_len - overlap
    toks = F.col(tokens_col)
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, … while start + overlap < n
    # (a window starting past n-overlap adds only already-seen tokens)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * F.lit(stride),
                        F.lit(stride))
    keep = keep_cols or []
    # a dotted id path (nested struct field) flattens to its LEAF name in
    # the first select — reference it by that name afterwards, and emit
    # it under the leaf name (the same flattening `select a.b` performs)
    id_leaf = id_col.split(".")[-1]
    out = df.filter(n > 0).select(
        F.col(id_col).alias(id_leaf), *[F.col(c).alias(c.split(".")[-1])
                                        for c in keep],
        n_chunks.alias("n_chunks"), toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"))
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, max_len)
    return out.select(
        id_leaf, *[c.split(".")[-1] for c in keep], "chunk_idx",
        chunk.alias("chunk_tokens"),
        F.size(chunk).alias("chunk_len"),
        "n_chunks")


def fim_transform(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    rate_pct: int = 50,
    mode: str = "psm",
    prefix_tok: int = -1,
    middle_tok: int = -2,
    suffix_tok: int = -3,
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): for a
    deterministic ``rate_pct``% subset of documents, cut the token
    sequence at two uniform points and emit the sentinel-delimited
    reorder — PSM ``<PRE> prefix <SUF> suffix <MID> middle`` or SPM
    ``<PRE> <SUF> suffix <MID> prefix middle`` — so a plain
    left-to-right LM objective learns infilling. The remaining docs pass
    through unchanged (the paper's joint objective).

    Determinism/portability: document selection and both cut points
    derive from md5(seed:kind:id) reduced by INTEGER modulo — no float
    fractions anywhere, so any engine (the DuckDB oracle included)
    reproduces the exact same splits. Cut points are h % (n+1) in
    [0, n]; the pair is sorted so prefix/middle/suffix are well formed
    (empty segments allowed, matching the paper's uniform splitting).

    Scale shape: one narrow projection — md5/conv/slice/concat all in
    whole-stage codegen, zero shuffle, zero Python.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    toks = F.col(tokens_col)
    n = F.size(toks)

    def _h(kind: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:{kind}:"),
                               F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("long")

    applied = (F.pmod(_h("sel"), F.lit(100)) < F.lit(rate_pct)) & (n > 0)
    c1, c2 = F.pmod(_h("c1"), n + 1), F.pmod(_h("c2"), n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    prefix = F.slice(toks, 1, lo)
    middle = F.slice(toks, lo + 1, hi - lo)
    suffix = F.slice(toks, hi + 1, n - hi)
    pre = F.array(F.lit(prefix_tok))
    mid = F.array(F.lit(middle_tok))
    suf = F.array(F.lit(suffix_tok))
    if mode == "psm":
        fim = F.concat(pre, prefix, suf, suffix, mid, middle)
    else:
        fim = F.concat(pre, suf, suffix, mid, prefix, middle)
    return df.select(
        *df.columns,
        applied.alias("fim_applied"),
        F.when(applied, fim).otherwise(toks).alias("fim_tokens"))
