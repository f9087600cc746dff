"""Large-scale training-data deduplication operators.

Beyond the reference's ``deduplicate`` (which is keyed stream suppression,
libtenzir/builtins/operators/deduplicate.cpp) these are the content-level
dedup stages a 100 TB training-data pipeline needs: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Design notes for scale:
- All hashing is engine-portable (md5-derived, every derived value in
  int64 arithmetic both engines share) so the DuckDB oracle replays the
  exact pipeline — and md5 is a JVM codegen'd builtin.
- ONE md5 per (doc, shingle): the base-hash array feeds an exchange so
  every consumer branch reuses the shuffle files; the 16 minhash
  permutations are affine maps h_i(x) = (a_i·x + b_i) mod 2^61−1 over
  the materialized ints (Broder's universal-hash construction).
- Only the LSH band self-join shuffles payload-free (id, band) int64
  pairs; shingle arrays re-attach via broadcast semi-join for CANDIDATE
  ids only — the quadratic step never moves payloads, and verification
  recomputes shingles for the handful of candidates instead of the corpus.
- The candidate self-join is the classic LSH trick: at 10^9 docs a naive
  all-pairs join is impossible; banding makes expected pair count linear
  in the number of true near-dups. Band-key skew (a degenerate band that
  half the corpus shares — e.g. empty documents) is the real-world failure
  mode: filter degenerate shingle sets first, prune oversized buckets
  (max_bucket), and AQE skew-join splits the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of a string (classic MinHash input)."""
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(k)))
    )


def _md5_60bit(col: Column) -> Column:
    """First 15 hex chars of md5 as a positive int64 (60 bits) — engine-
    portable (DuckDB: ``('0x' || substring(md5(x),1,15))::BIGINT``) and an
    8-byte value instead of a 32-char string, which is what keeps LSH
    shuffle rows small at scale."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# universal-hash parameters for the minhash permutation family:
# h_i(x) = (a_i * x + b_i) mod P over the 32-bit base hash. a_i is 31-bit
# odd and x 32-bit, so a_i*x + b_i < 2^63 — no signed-int64 overflow, and
# the identical arithmetic runs in any engine (DuckDB oracle replays it).
_MINHASH_P = (1 << 61) - 1  # Mersenne prime
def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.md5(f"perm:{i}".encode()).digest()
        a = (int.from_bytes(d[:4], "big") | 1) & 0x7FFFFFFF
        b = int.from_bytes(d[4:8], "big")
        out.append((a, b))
    return out


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of int64: ONE md5 per shingle (its
    first 8 hex chars as a uint32 base hash), then ``num_hashes``
    universal-hash permutations h_i(x) = (a_i·x + b_i) mod 2^61-1 with
    md5-derived constants — 16× less hashing than an md5 per (i, shingle)
    while keeping every operation bit-replayable in the DuckDB oracle.
    Min over a universal hash family is the standard minhash
    construction (Broder; a_i odd, pairwise-independent family)."""
    # One F.aggregate pass (state = array of num_hashes running minima):
    # the base-hash array is referenced by exactly ONE consumer, so
    # CollapseProject inlining cannot duplicate the md5 work — unlike a
    # num_hashes-branch array_min(transform(...)) formulation, which
    # needs an exchange as a CSE barrier to avoid recomputing the md5
    # transform per branch. NOTE: constants are baked via a list
    # comprehension, not lambda defaults — `lambda x, a=a:` would be
    # parsed by pyspark as the (element, index) higher-order signature
    # and silently shadow `a` with the array index.
    params = _minhash_params(num_hashes)
    base = F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        base,
        F.array_repeat(F.lit(_MINHASH_P).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[(x * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_P) for a, b in params]),
            lambda m, v: F.least(m, v),
        ),
    )


def minhash_signature_sliced(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature whose permutations draw from FOUR independent
    32-bit base hashes (the four 8-hex-char slices of one md5) —
    permutation ``i`` maps slice ``i % 4`` through its affine map.

    Why a second family exists: :func:`minhash_signature` feeds every
    permutation the SAME 32-bit base hash. An affine map over so small a
    domain barely wraps mod 2^61−1, so the per-permutation minima land on
    the same few small-hash shingles — across documents, ONE shared
    shingle can win the min for many permutations in both, which inflates
    cross-document signature AGREEMENT far beyond Jaccard (measured: 9/16
    positions agreeing at true Jaccard 0.04). Harmless for
    ``minhash_near_dup_pairs`` (banding only proposes candidates; exact
    shingle Jaccard verifies), fatal for any consumer that USES agreement
    as the similarity estimate — the incremental
    :class:`~tenzir_spark.operators.dedup_index.NearDupIndex`, which
    cannot store shingle sets. With four independent slices the
    correlation drops to within-group-of-4 only (measured on a 40-doc
    random corpus: max cross-doc agreement 7/16 at Jaccard ≈ 0.05 vs
    13/16 for the shared-base family; near-dup recall at the 8/16 bar is
    1.0 for Jaccard ≥ 0.8). Still ONE md5 per (doc, shingle), still
    engine-portable (DuckDB replays the slices with substring offsets).
    """
    params = _minhash_params(num_hashes)
    base = F.transform(shingles, F.md5)
    return F.aggregate(
        base,
        F.array_repeat(F.lit(_MINHASH_P).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[
                (
                    F.conv(F.substring(x, 8 * (i % 4) + 1, 8), 16, 10)
                    .cast("long") * F.lit(a) + F.lit(b)
                ) % F.lit(_MINHASH_P)
                for i, (a, b) in enumerate(params)
            ]),
            lambda m, v: F.least(m, v),
        ),
    )


def lsh_bands(signature: Column, num_hashes: int, bands: int) -> Column:
    """Hash contiguous signature rows into int64 band keys (banding LSH).
    The band self-join shuffles (id, band) pairs — 16 bytes per row."""
    rows = num_hashes // bands
    return F.array(
        *[
            _md5_60bit(
                F.concat_ws(
                    ",",
                    *[signature[j].cast("string") for j in range(b * rows, (b + 1) * rows)],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_band_keys(signature: Column, num_hashes: int, bands: int) -> Column:
    """Band keys as ONE transform over the stringified signature —
    value-identical to :func:`lsh_bands` (same per-band
    ``md5(v0,v1,…)`` → first-15-hex-chars int64), but every intermediate
    has exactly ONE consumer expression, so CollapseProject inlining
    cannot duplicate the signature work (the ``lsh_bands`` formulation
    indexes ``signature`` ``num_hashes`` times — fine when the signature
    is a materialized column, quadratic when it is an inlined aggregate
    chain). This is the single owner of the band-key construction used
    by :func:`minhash_near_dup_pairs` and the incremental
    :class:`~tenzir_spark.operators.dedup_index.NearDupIndex`."""
    rows = num_hashes // bands
    sig_str = F.transform(signature, lambda v: v.cast("string"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(sig_str, b * rows + 1, rows), ",")),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate collapse by content hash: keep the smallest id per
    distinct text, count the collapsed group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def cross_dedup(df: DataFrame, prior: DataFrame, text_col: str,
                prior_text_col: str | None = None) -> DataFrame:
    """Cross-corpus exact dedup: keep only rows whose content does NOT
    appear in ``prior`` — the RefinedWeb/Dolma "dedup each dump against
    all previous dumps" stage (Penedo et al. 2023 §3.3), distinct from
    within-corpus :func:`exact_dedup` (an aggregation) in plan shape: a
    LEFT ANTI join on the content hash.

    Scale shape: both sides project to (hash) before the join — 16
    bytes/row through any shuffle, never the text; the prior side is
    additionally made distinct (its duplicates are irrelevant to the
    anti-join and would bloat the exchange). AQE broadcasts the hash set
    when the prior corpus is small; co-partitioned shuffle anti-join is
    the correct at-scale fallback when both sides are 100 TB-class.
    Keeps the input schema.
    """
    pcol = prior_text_col or text_col
    # collision-safe scratch name: a user column literally named "_ch"
    # (case-insensitive resolution!) must survive untouched
    lower = {c.lower() for c in df.columns}
    ch = "_ch"
    while ch in lower:
        ch += "_"
    seen = prior.select(F.md5(F.col(pcol)).alias(ch)).distinct()
    return (
        df.withColumn(ch, F.md5(F.col(text_col)))
        .join(seen, ch, "left_anti")
        .drop(ch)
    )


def window_dedup_stats(
    df: DataFrame, text_col: str, id_col: str, w: int = 8
) -> DataFrame:
    """Exact token-window duplicate detection — the scalable form of
    Lee et al. 2021's "Deduplicating Training Data Makes Language Models
    Better" substring dedup: a document is flagged per rolling w-word
    window it shares (verbatim, after the decontamination normalizer)
    with ANY other window occurrence in the corpus, itself included.

    Returns (id_col, n_dup_windows): per document, how many of its
    window OCCURRENCES are corpus-duplicated (occur >= 2 times in
    total). Docs with no duplicated window are absent.

    Scale shape (the 100 TB contract):
    - One narrow projection builds the window array per doc and explodes
      to (id, xxhash64(window)) rows — 16 bytes/row through the shuffle,
      never the window text (w * avg-word bytes saved per row).
    - ONE exchange: the occurrence rows repartition on the hash, and
      both consumers — the corpus-wide occurrence count and the per-doc
      re-aggregation join — read the same shuffle files
      (ReusedExchange; the CollapseProject barrier pattern).
    - The duplicated-hash set and the final output are proportional to
      the DUPLICATED windows, not the corpus; nothing is all-pairs.
    - The suffix-array construction in the paper is a single-machine
      algorithm; hashed fixed-w windows are the distributed equivalent
      (what fixed-granularity production dedup pipelines ship) and find
      exactly the >= w-token shared substrings.
    """
    from tenzir_spark.operators.decontaminate import _ngrams_for

    occ = df.select(
        F.col(id_col),
        F.explode(_ngrams_for(df, text_col, w)).alias("win"),
    ).select(id_col, F.xxhash64("win").alias("h")).repartition("h")
    # count(id) not count(*): ids are non-null by contract and the column
    # reference keeps this branch's pruned projection IDENTICAL to the
    # join branch's, so ReuseExchange dedupes the two subtrees — one
    # corpus scan + one shuffle instead of two of each (count(*) lets
    # column pruning drop id here, splitting the exchange in two).
    dup_h = occ.groupBy("h").agg(F.count(id_col).alias("cnt")).filter("cnt >= 2")
    return (
        occ.join(dup_h.select("h"), "h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
    )


def window_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int | None = None,
    max_dup_frac: float = 0.0,
    mode: str = "drop",
) -> DataFrame:
    """Drop (or mark) documents whose duplicated-window fraction exceeds
    ``max_dup_frac`` (0.0 = any shared w-token span disqualifies).
    mode="mark" keeps all rows and adds n_dup_windows / dup_window_frac.
    Array-typed columns (pre-tokenized sequences) window the token ids
    directly; ``w`` defaults to 8 words for text, 50 tokens (the Lee et
    al. granularity) for arrays.
    """
    if mode not in ("drop", "mark"):
        raise ValueError(f"mode must be 'mark' or 'drop', got {mode!r}")
    from pyspark.sql.types import ArrayType

    from tenzir_spark.operators.decontaminate import _ngrams_for

    is_tokens = isinstance(df.select(text_col).schema[0].dataType, ArrayType)
    if w is None:
        w = 50 if is_tokens else 8
    stats = window_dedup_stats(df, text_col, id_col, w)
    # token arrays know their window count arithmetically — no need to
    # materialize the windows just to size them
    n_windows = (F.greatest(F.size(F.col(text_col)) - (w - 1), F.lit(0))
                 if is_tokens else F.size(_ngrams_for(df, text_col, w)))
    if mode == "drop":
        if max_dup_frac == 0.0:
            # anti join on the (small) flagged-id set — no n_windows needed
            return df.join(stats.select(id_col), id_col, "left_anti")
        marked = df.withColumn("_nw", n_windows).join(stats, id_col, "left")
        return (
            marked.filter(
                F.coalesce(F.col("n_dup_windows"), F.lit(0))
                <= F.lit(max_dup_frac) * F.col("_nw"))
            .select(*df.columns)
        )
    marked = df.withColumn("_nw", n_windows).join(stats, id_col, "left")
    return (
        marked.withColumn(
            "n_dup_windows", F.coalesce("n_dup_windows", F.lit(0)))
        .withColumn(
            "dup_window_frac",
            F.when(F.col("_nw") > 0,
                   F.col("n_dup_windows") / F.col("_nw")).otherwise(0.0))
        .drop("_nw")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs via banded MinHash LSH, verified with exact shingle
    Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape (the version that survives 100 TB):
    - the band self-join carries ONLY (id, band) — shingle arrays are
      re-attached per candidate id afterwards, so the quadratic step never
      shuffles payloads;
    - buckets larger than ``max_bucket`` are pruned before the join: a band
      key shared by B docs yields O(B²) candidates, and giant buckets are
      LSH noise (low-entropy shingle sets), not near-duplicates. This is
      the standard skew guard; measured at sf0.1 it turns a 101 s blowup
      into ~4 s with identical verified output here."""
    sh_tbl = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), k).alias("sh"),
    ).filter(F.size("sh") >= k)  # drop degenerate docs
    # ONE md5 per (doc, shingle) AND one codegen span for the whole
    # shingle→signature→band chain: every intermediate is referenced by
    # exactly ONE consumer expression, so CollapseProject inlining cannot
    # duplicate work —
    #   · the signature is a single F.aggregate over the base-hash array
    #     (state = array of 16 running minima, one zip_with/least per
    #     shingle) instead of 16 array_min(transform(...)) branches that
    #     would each re-inline the md5 transform;
    #   · band keys slice the stringified signature inside one transform
    #     over sequence(0, bands-1), referencing the signature once.
    # This removed the repartition-by-id exchange the old 16-branch
    # formulation needed as a CSE barrier — A/B at sf0.1/local[32]:
    # 11.5 s → 5.4 s warm, identical 249 verified pairs.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    band_keys = minhash_band_keys(
        minhash_signature(F.col("sh"), num_hashes), num_hashes, bands
    )
    # the band self-join carries ONLY (id, band) — shingles re-attach
    # post-candidate, so the quadratic step never shuffles payloads.
    # The band rows are materialized into a band-keyed exchange: they have
    # FOUR consumers (bucket counts + the pruning join + both self-join
    # sides), and without the exchange each would recompute the whole
    # shingle/signature chain (CollapseProject inlines projections — no
    # CSE across consumers). All of them need hashpartitioning(band)
    # anyway, so the exchange is free.
    banded = sh_tbl.select(
        "id", F.explode(band_keys).alias("band")
    ).repartition(n_parts, "band")
    small = banded.join(
        banded.groupBy("band").count().filter(F.col("count") <= max_bucket).select("band"),
        on="band",
    )
    a, b = small.alias("a"), small.alias("b")
    cand = (
        a.join(b, on="band")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # re-attach shingles for verification ONLY for candidate ids: the
    # broadcast semi-join reaches the scan BEFORE the shingle expression,
    # so the (dominant) array construction runs over the handful of
    # candidates instead of the whole corpus a second and third time
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    ).distinct()
    sh_cand = sh_tbl.join(F.broadcast(cand_ids), on="id", how="left_semi")
    sh_a = sh_cand.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_cand.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    # candidate set is small by construction (bucket-pruned) — broadcast
    # it so the verification is two broadcast joins, not a shuffle chain
    pairs = F.broadcast(cand).join(sh_a, "id_a").join(sh_b, "id_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _word_ngrams(text_col: str, n: int) -> Column:
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                        threshold: float = 0.3) -> DataFrame:
    """EXACT word-n-gram Jaccard pairs at ``jaccard >= threshold`` —
    prefix-filtered similarity join (the AllPairs/PPJoin family, Bayardo
    et al. WWW'07 / Xiao et al. WWW'08), not a cartesian product.

    Prefix-filtering principle: order every document's gram set by one
    global total order (document-frequency ascending, gram as the tie
    break — rarest first minimizes candidates). If ``J(A,B) >= t`` then
    ``|A∩B| >= ceil(t·|A|)``, so the intersection cannot hide entirely in
    A's ``ceil(t·|A|)-1`` last-ordered grams: A's first
    ``|A| - ceil(t·|A|) + 1`` grams (its *prefix*) must contain a common
    gram, and symmetrically for B. Candidate pairs are therefore exactly
    the pairs whose PREFIXES share a gram — an equi-join on the gram, no
    all-pairs step anywhere. Exact verification (array_intersect /
    array_union) then recomputes true Jaccard for candidates only, so the
    result set is identical to the brute-force definition. Frequent grams
    (the skew risk of a plain inverted index) almost never land in a
    prefix, which is what bounds posting-list fan-out at corpus scale.

    Scale shape: one gram-frequency agg, one per-doc prefix window, one
    payload-free (id, sz) candidate join, one bounded verification join —
    all linear-ish in corpus size for realistic thresholds. The quadratic
    step of the old baseline is gone; `_ngram_jaccard_pairs_brute` remains
    for property-testing equivalence on bounded inputs.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"ngram_jaccard_pairs needs 0 < threshold <= 1 (got "
            f"{threshold}); at threshold <= 0 every pair qualifies and "
            "only the brute-force cartesian can enumerate that")
    from pyspark.sql import Window

    docs = (
        df.select(F.col(id_col).alias("id"), _word_ngrams(text_col, n).alias("g"))
        .filter(F.size("g") > 0)
        .withColumn("sz", F.size("g"))
    )
    # the output filter is on round(j, 4) >= t, so a pair at true
    # j = t - 4e-5 can still round UP into the result set: generate
    # candidates at a threshold one half-ulp-of-round(…,4) lower so the
    # prefix net provably catches every pair the final filter keeps
    t = threshold - 0.5e-4
    occ = docs.select("id", "sz", F.explode("g").alias("w"))
    freq = occ.groupBy("w").agg(F.count("id").alias("df_"))
    rn = F.row_number().over(Window.partitionBy("id").orderBy("df_", "w"))
    pref = (
        occ.join(freq, "w")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
        .select("id", "sz", "w")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, "w")
        .filter(F.col("a.id") < F.col("b.id"))
        # length filter: J >= t forces min(|A|,|B|) >= t·max(|A|,|B|)
        .filter(F.least("a.sz", "b.sz") >= F.lit(t) * F.greatest("a.sz", "b.sz"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ga = docs.select(F.col("id").alias("id_a"), F.col("g").alias("g_a"))
    gb = docs.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    jac = F.size(F.array_intersect("g_a", "g_b")) / F.size(F.array_union("g_a", "g_b"))
    return (
        cand.join(ga, "id_a").join(gb, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _ngram_jaccard_pairs_brute(df: DataFrame, id_col: str, text_col: str,
                               n: int = 3, threshold: float = 0.3) -> DataFrame:
    """Brute-force all-pairs twin of :func:`ngram_jaccard_pairs` —
    quadratic by definition, kept ONLY as the property-test oracle for the
    prefix-filtered join on bounded inputs. Never on a production path."""
    p = (df.select(F.col(id_col).alias("id"), _word_ngrams(text_col, n).alias("g"))
         .filter(F.size("g") > 0))
    a, b = p.alias("a"), p.alias("b")
    jac = F.size(F.array_intersect("a.g", "b.g")) / F.size(F.array_union("a.g", "b.g"))
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """32-bit SimHash fingerprint: per-shingle md5-derived bits, bit-voted
    per document. Pure JVM expressions: explode shingles, conv() the md5
    prefix to an int, aggregate the votes, reassemble.

    The 32 per-bit vote counters are PACKED into 16 int64 lanes of two
    32-bit fields each, so the hash aggregate runs 16 plain sums instead
    of 32 conditional ones — half the aggregation work for the identical
    result. Capacity: the addend per field is ≤1, the top field sits at
    shift 32, so a per-doc sum stays inside signed int64 (ANSI-safe, no
    inter-field carry) up to 2^30 shingles per doc — ≥1 GiB of text at
    k=5, far past any real document. (Four 16-bit fields would overflow
    signed int64 from ~2^15 shingles: the shift-48 field contributes 2^48
    per row.) bit set-count c over n shingles gives the signed vote 2c−n;
    bit i of the fingerprint is (2c_i > n)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), k)).alias("s"),
    ).withColumn("h", F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long"))
    h = F.col("h")
    lanes = [
        F.sum(
            sum(
                (
                    F.shiftright(h, 2 * lane + f).bitwiseAND(F.lit(1))
                    * F.lit(1 << (32 * f))
                    for f in range(2)
                ),
                F.lit(0),
            )
        ).alias(f"l{lane}")
        for lane in range(16)
    ]
    voted = sh.groupBy("id").agg(F.count("*").alias("n"), *lanes)
    fp = None
    for i in range(32):
        lane, f = i // 2, i % 2  # bit 2*lane+f lives in lane's field f
        c = F.shiftright(F.col(f"l{lane}"), 32 * f).bitwiseAND(F.lit(0xFFFFFFFF))
        bit = F.when(2 * c > F.col("n"), F.lit(2 ** i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return voted.select("id", fp.cast("long").alias("simhash"))


def line_dedup_stats(
    df: DataFrame, text_col: str, id_col: str, min_count: int = 2
) -> DataFrame:
    """Corpus-level exact line/paragraph duplicate detection — the
    CCNet / RefinedWeb "line-wise deduplication" stage (Wenzek et al.
    2020 §4.1 dedup paragraphs by hash across shards; Penedo et al. 2023
    line dedup): a line is DUPLICATED when its trimmed text occurs
    ``min_count`` or more times across the whole corpus.

    Returns (id_col, pos, is_winner) for every occurrence of a
    duplicated line: ``pos`` is the 0-based line index inside the doc
    and ``is_winner`` marks the single corpus-wide first occurrence
    (smallest (id, pos)) that "keep_first" mode retains.

    Scale shape (the 100 TB contract):
    - the exploded rows carry (id, pos, h) only — 24 bytes/row through
      the shuffle, never the line text;
    - ONE exchange: occurrences repartition on the line hash, and both
      consumers — the corpus-wide count+winner aggregate and the
      per-occurrence join — read the same shuffle files. The aggregate
      deliberately consumes the SAME columns as the join branch (its
      winner term touches id AND pos) so column pruning produces
      identical subtrees and ReuseExchange fires (the window_dedup
      count(id)-not-count(*) pattern, one scan + one shuffle);
    - output is proportional to the DUPLICATED occurrences, not the
      corpus; whitespace-only lines are exempt (never "duplicates").

    Production keys the shuffle on xxhash64(trim(line)); the oracle
    groups on the line text itself — identical absent a 64-bit
    collision (same caveat as window_dedup).
    """
    lines = F.split(F.col(text_col), "\n", -1)
    occ = (
        df.select(F.col(id_col), F.posexplode(lines).alias("pos", "ln"))
        .filter(F.length(F.trim(F.col("ln"))) > 0)
        .select(id_col, "pos", F.xxhash64(F.trim(F.col("ln"))).alias("h"))
        .repartition("h")
    )
    winners = (
        occ.groupBy("h")
        .agg(
            F.count(id_col).alias("cnt"),
            F.min(F.struct(id_col, "pos")).alias("w"),
        )
        .filter(F.col("cnt") >= min_count)
    )
    return (
        occ.join(winners, "h")
        .select(
            id_col,
            "pos",
            ((F.col("w")[id_col] == F.col(id_col))
             & (F.col("w")["pos"] == F.col("pos"))).alias("is_winner"),
        )
    )


def line_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 2,
    mode: str = "keep_first",
    drop_empty_docs: bool = False,
) -> DataFrame:
    """Remove corpus-duplicated lines from every document, rewriting
    ``text_col`` to the surviving lines in original order.

    mode="keep_first": the corpus-wide first occurrence (smallest
    (id, pos)) survives, every other copy is dropped — CCNet paragraph
    dedup semantics. mode="drop_all": every occurrence of a duplicated
    line is dropped (MassiveWeb-style boilerplate removal).

    ``drop_empty_docs`` removes docs whose every line was dropped.
    """
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"mode must be 'keep_first' or 'drop_all', got {mode!r}")
    stats = line_dedup_stats(df, text_col, id_col, min_count)
    dropped = stats if mode == "drop_all" else stats.filter(~F.col("is_winner"))
    drop_pos = dropped.groupBy(id_col).agg(
        F.collect_set("pos").alias("_drop_pos"))
    lines = F.split(F.col(text_col), "\n", -1)
    joined = df.join(drop_pos, id_col, "left")
    kept = F.filter(
        lines,
        lambda ln, i: F.col("_drop_pos").isNull()
        | ~F.array_contains(F.col("_drop_pos"), i),
    )
    out = joined.withColumn(text_col, F.array_join(kept, "\n")).drop("_drop_pos")
    if drop_empty_docs:
        out = out.filter(F.length(F.trim(F.col(text_col))) > 0)
    return out.select(*df.columns)


def token_window_dedup_stats(
    df: DataFrame, tokens_col: str, id_col: str, w: int = 50
) -> DataFrame:
    """Lee et al. 2021 window dedup on PRE-TOKENIZED sequences — the
    lake table's native payload shape (doc_id, tokens:array<int>), the
    paper's 50-token granularity. Alias of window_dedup_stats, which
    dispatches on the column dtype (array -> token-id windows sliced in
    codegen'd slice/sequence expressions; same one-exchange contract)."""
    return window_dedup_stats(df, tokens_col, id_col, w)


def token_window_dedup(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    w: int = 50,
    max_dup_frac: float = 0.0,
    mode: str = "drop",
) -> DataFrame:
    """Drop (or mark) pre-tokenized documents whose duplicated-window
    fraction exceeds ``max_dup_frac`` — window_dedup with the Lee et al.
    50-token default (the operator itself dispatches on dtype)."""
    return window_dedup(df, tokens_col, id_col, w, max_dup_frac, mode)


def dup_span_intervals(
    df: DataFrame, col: str, id_col: str, w: int = 50
) -> DataFrame:
    """Per-document removal intervals for Lee et al. 2021 EXACTSUBSTR
    span dedup (§4.1): every length-``w`` token window whose content
    occurs >= 2 times corpus-wide keeps exactly ONE occurrence — the
    globally first by (id, position) — and every OTHER occurrence marks
    its positions for removal. window_dedup flags/drops whole documents;
    this is the published semantics that keeps the unique remainder of a
    partially-duplicated document (the paper removes the duplicated
    span "from all but one of the examples").

    Returns (id_col, dup_spans:array<struct<lo:int,hi:int>>) — merged,
    disjoint, ascending 1-based inclusive position intervals; documents
    with no losing occurrence are absent.

    Scale shape (the 100 TB contract):
    - Windows shuffle as (id, p, xxhash64(window)) — 20 bytes/row, never
      the token payload (64-bit collision caveat as window_dedup).
    - ONE exchange: occurrences repartition on the hash; the
      count+keeper aggregation and the loser join-back both read the
      same shuffle files (ReusedExchange — identical pruned projections
      on both branches, the window_dedup_stats contract).
    - count(id)/min(struct(id,p)) fold into ONE aggregation pass; the
      keeper struct is 12 bytes/group, never a payload.
    - Output rows ∝ documents WITH duplicated spans, intervals merged
      per doc (adjacent/overlapping windows collapse), so the join back
      to the corpus is a small-side broadcast in the common case.
    """
    from tenzir_spark.operators.decontaminate import array_windows

    occ = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(array_windows(F.col(col), w)).alias("_p0", "_win"),
        )
        .select(
            "_id", (F.col("_p0") + 1).alias("_p"),
            F.xxhash64("_win").alias("_h"),
        )
        .repartition("_h")
    )
    # one pass computes both the occurrence count and the keeper;
    # count(_id) not count(*) keeps this branch's projection identical
    # to the join branch's so ReuseExchange dedupes the subtrees
    grp = (
        occ.groupBy("_h")
        .agg(
            F.count("_id").alias("_cnt"),
            F.min(F.struct("_id", "_p")).alias("_keep"),
        )
        .filter(F.col("_cnt") >= 2)
    )
    losers = occ.join(grp, "_h").filter(
        ~((F.col("_id") == F.col("_keep._id"))
          & (F.col("_p") == F.col("_keep._p"))))
    starts = losers.groupBy("_id").agg(
        F.array_sort(F.collect_set("_p")).alias("_ss"))
    # merge ascending fixed-width starts into disjoint inclusive
    # intervals: a start s extends the last interval iff s <= hi + 1
    # (overlap or adjacency); starts ascend, so hi = s + w - 1 is
    # monotone and the merge is a single left-fold
    spans = F.aggregate(
        F.col("_ss"),
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.element_at(acc, -1)["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["lo"].alias("lo"),
                    (s + F.lit(w - 1)).alias("hi")))),
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                s.alias("lo"), (s + F.lit(w - 1)).alias("hi"))))),
    )
    return starts.select(
        F.col("_id").alias(id_col), spans.alias("dup_spans"))


def dedup_spans(
    df: DataFrame,
    col: str,
    id_col: str,
    w: int = 50,
    drop_empty: bool = False,
    spans_df: DataFrame | None = None,
) -> DataFrame:
    """Remove duplicated spans from pre-tokenized sequences — Lee et al.
    2021 ExactSubstr semantics over fixed-``w`` windows: positions
    covered by any non-keeper occurrence of a corpus-duplicated window
    are deleted from ``col``; each duplicated window content survives in
    exactly its globally-first occurrence. Ids are non-null by contract
    (the lake key invariant, as window_dedup).

    ``col`` must be an ARRAY column (token ids). For raw text use
    window_dedup (flag/drop) — span removal on prose would have to
    reconstruct the document through a lossy normalizer.

    ``spans_df`` injects precomputed intervals (id_col, dup_spans) so a
    caller can compute spans on one representation (token ids) and strip
    a parallel array column of the same document (e.g. the words the
    ids were injectively derived from — the registry witness does this).

    ``drop_empty`` removes documents whose every position was covered.
    """
    from pyspark.sql.types import ArrayType

    if not isinstance(df.select(col).schema[0].dataType, ArrayType):
        raise TypeError(
            f"dedup_spans needs an array column, got {col!r}; "
            "use window_dedup for raw text")
    if "dup_spans" in df.columns:
        raise ValueError(
            "dedup_spans: input already has a 'dup_spans' column — "
            "rename it first (the operator joins its intervals under "
            "that name)")
    ivs = spans_df if spans_df is not None else dup_span_intervals(
        df, col, id_col, w)
    kept = F.when(F.col("dup_spans").isNull(), F.col(col)).otherwise(
        F.filter(
            col,
            lambda x, i: ~F.exists(
                F.col("dup_spans"),
                lambda iv: (iv["lo"] <= i + 1) & (i + 1 <= iv["hi"]))))
    out = df.join(ivs, id_col, "left").withColumn(col, kept)
    if drop_empty:
        # drop only documents whose every position was COVERED by a
        # duplicated span: rows with no spans at all (dup_spans NULL —
        # including NULL/empty token arrays) pass through unchanged
        out = out.filter(
            F.col("dup_spans").isNull() | (F.size(F.col(col)) > 0))
    return out.select(*df.columns)
