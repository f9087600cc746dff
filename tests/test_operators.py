"""Operator library vs DuckDB oracle on a representative subset.

The full 37-query sweep lives in scripts/check_oracles.py (the driver runs
the equivalent at sf0.01); this keeps a fast guard inside `pytest -x -q`.
"""

import duckdb
import pytest

from tenzir_spark.queries import REGISTRY
from scripts.check_oracles import TABLES, norm_rows

SUBSET = [
    "where_filter", "summarize_q1", "summarize_aggs", "taste_per_schema",
    "unique_adjacent", "deduplicate_limit", "unroll_list", "enrich_lookup",
    "dedup_exact", "lang_id", "minhash_lsh_pairs", "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    fn, sql = REGISTRY[name]
    spdf = fn(spark, sf_dir).toPandas()
    opdf = ddb.execute(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    cols = sorted(spdf.columns)
    assert norm_rows(spdf, cols) == norm_rows(opdf, cols)


def test_rows_only_queries_run(spark, sf_dir):
    for name in ["pseudonymize_ip", "token_fingerprint_udf", "approx_median"]:
        fn, sql = REGISTRY[name]
        assert sql is None
        assert fn(spark, sf_dir).count() > 0


@pytest.mark.parametrize("spec", [
    (None, None, None), (10, 500, 7), (-400, None, -7), (None, None, -1),
    (-100, -5, 3), (50, -50, None), (-10**6, 10**6, 2), (300, 20, -4),
])
def test_slice_matches_python_semantics(spark, sf_dir, spec):
    """slice_rows == python list slicing for every sign combination
    (slice.cpp:62-94 parity), on top of the DISTRIBUTED two-phase
    numbering (no single-task global window)."""
    from tenzir_spark.operators.core import slice_rows

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_id < 3000").select("event_id")
    )
    ids = sorted(r[0] for r in ev.collect())
    b, e, s = spec
    expect = ids[b:e:s]
    got = sorted(r[0] for r in slice_rows(ev, b, e, s, order_by="event_id").collect())
    assert got == sorted(expect)


def test_global_numbering_is_distributed_and_exact(spark, sf_dir):
    """enumerate over a many-partition input must match the sequential
    numbering exactly — and the plan must not contain a global
    single-partition window sort."""
    from tenzir_spark.operators.core import enumerate_rows

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").repartition(16)
    )
    out = enumerate_rows(ev, "idx", order_by="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "global-order op must not serialize"
    rows = {r["event_id"]: r["idx"] for r in out.collect()}
    for i, eid in enumerate(sorted(rows)):
        assert rows[eid] == i


def test_ann_lsh_multiprobe_improves_recall(spark, sf_dir):
    """Multi-probe (hamming-1 neighbor buckets, smallest-margin first)
    must be a superset-or-equal candidate pool: recall vs the exact top-k
    is monotone in n_probe and reaches 1.0 when probing all buckets."""
    from tenzir_spark.operators.similarity import (
        cosine_topk, cosine_topk_lsh, rademacher_planes)

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = em.filter("vec_id = 0").select("embedding").head()[0]
    exact = {r["vec_id"] for r in cosine_topk(em, "embedding", "vec_id", qvec, k=10).collect()}
    planes = rademacher_planes(len(qvec), n_bits=3)

    recalls = []
    for n_probe in (1, 2, 4):  # 4 = self + all hamming-1 neighbors of 3 bits
        got = {r["vec_id"] for r in cosine_topk_lsh(
            em, "embedding", "vec_id", qvec, k=10, n_bits=3,
            planes=planes, n_probe=n_probe).collect()}
        recalls.append(len(got & exact) / len(exact))
        assert 0 in got, "query's own bucket always contains the query"
    assert recalls == sorted(recalls), f"recall must be monotone: {recalls}"
    assert recalls[-1] > recalls[0] or recalls[0] == 1.0, (
        "widening the probe set must help unless recall is already 1")


def test_ivf_topk_recall_and_exhaustive_equivalence(spark, sf_dir):
    """IVF ANN: recall is monotone in n_probe and probing every cell
    equals the exact top-k; the k-means build is deterministic."""
    from tenzir_spark.operators.similarity import (
        cosine_topk, ivf_assign, ivf_build, ivf_topk)

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = em.filter("vec_id = 0").select("embedding").head()[0]
    cents = ivf_build(em, "embedding", "vec_id", n_centroids=8, iters=3)
    cents2 = ivf_build(em, "embedding", "vec_id", n_centroids=8, iters=3)
    assert (cents == cents2).all(), "k-means build must be deterministic"

    indexed = ivf_assign(em, "embedding", cents)
    sizes = indexed.groupBy("_ivf").count().collect()
    assert len(sizes) >= 2, "corpus must spread over cells"

    exact = [r["vec_id"] for r in cosine_topk(em, "embedding", "vec_id", qvec, k=10).collect()]
    recalls = []
    for n_probe in (1, 4, 8):
        got = {r["vec_id"] for r in ivf_topk(
            indexed, "embedding", "vec_id", qvec, cents, k=10,
            n_probe=n_probe, cell_col="_ivf").collect()}
        recalls.append(len(got & set(exact)) / len(exact))
    assert recalls == sorted(recalls), f"recall must be monotone: {recalls}"
    assert recalls[-1] == 1.0, "probing all cells must equal exact top-k"


def test_ivf_large_k_flat_argmin(spark, sf_dir):
    """k=256 centroids: the flat-array broadcast argmin (constant-size
    generated code; 256 inlined distance expressions would blow past
    Janino/JIT limits) must agree with the inlined small-k shape and keep
    the exhaustive-probe == exact invariant."""
    import numpy as np

    from tenzir_spark.operators.similarity import (
        _ARGMIN_INLINE_MAX, cosine_topk, ivf_assign, ivf_topk)

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = em.filter("vec_id = 0").select("embedding").head()[0]
    dim = len(qvec)
    # deterministic synthetic centroids (no need to train 256 cells on a
    # 500-vector corpus to exercise the assignment path)
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((256, dim))
    assert 256 > _ARGMIN_INLINE_MAX
    indexed = ivf_assign(em, "embedding", cents)
    cells = indexed.select("vec_id", "_ivf").collect()
    assert len(cells) == em.count()
    assert all(0 <= r["_ivf"] < 256 for r in cells)

    # flat argmin == inlined argmin on a 16-centroid prefix
    small = cents[:16]
    inl = {r["vec_id"]: r["_ivf"]
           for r in ivf_assign(em, "embedding", small).select("vec_id", "_ivf").collect()}
    import tenzir_spark.operators.similarity as simmod
    old = simmod._ARGMIN_INLINE_MAX
    simmod._ARGMIN_INLINE_MAX = 0  # force the flat shape for the same 16
    try:
        flat = {r["vec_id"]: r["_ivf"]
                for r in ivf_assign(em, "embedding", small).select("vec_id", "_ivf").collect()}
    finally:
        simmod._ARGMIN_INLINE_MAX = old
    assert inl == flat

    exact = [r["vec_id"] for r in cosine_topk(em, "embedding", "vec_id", qvec, k=10).collect()]
    got = {r["vec_id"] for r in ivf_topk(
        indexed, "embedding", "vec_id", qvec, cents, k=10,
        n_probe=256, cell_col="_ivf").collect()}
    assert got == set(exact), "probing all 256 cells must equal exact top-k"


def test_pq_train_encode_topk(spark):
    import numpy as np

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from tenzir_spark.operators.similarity import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 8)) * 4
    vecs = np.concatenate([c + rng.normal(size=(10, 8)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])

    books = pq_train(df, "embedding", "vec_id", m=2, nbits=2, iters=3)
    assert books.shape == (2, 4, 4)

    enc = pq_encode(df, "embedding", books)
    got = {r["vec_id"]: list(r["_pq"]) for r in enc.collect()}
    # independent numpy encode with the identical codebooks
    m, k, dsub = books.shape
    for i, v in enumerate(vecs):
        want = [int(np.argmin(((books[j] - v[j * dsub:(j + 1) * dsub]) ** 2)
                              .sum(axis=1))) for j in range(m)]
        assert got[i] == want, f"vec {i}: {got[i]} != {want}"

    # ADC ranking == numpy ADC ranking (same lookup-table math)
    q = centers[2] + 0.1
    lut = ((books - q.reshape(m, 1, dsub)) ** 2).sum(axis=2)
    adc = np.array([sum(lut[j, got[i][j]] for j in range(m))
                    for i in range(len(vecs))])
    want_ids = [int(i) for i in np.lexsort((np.arange(len(vecs)), adc))[:5]]
    got_rows = pq_topk(df, "embedding", "vec_id", q, books, k=5).collect()
    assert [r["vec_id"] for r in got_rows] == want_ids

    # refine: exact cosine re-rank of the ADC shortlist returns the true
    # nearest vector first (clusters are far apart, ADC recall is easy)
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    true_top = int(np.argmax(sims))
    refined = pq_topk(df, "embedding", "vec_id", q, books, k=3,
                      refine=10).collect()
    assert refined[0]["vec_id"] == true_top

    # encoded corpus reuses the stored code column (no re-encode)
    pre = pq_topk(enc, "embedding", "vec_id", q, books, k=5, code_col="_pq")
    assert [r["vec_id"] for r in pre.collect()] == want_ids

    # a NULL embedding yields NULL codes → NULL ADC distance; the guard
    # must EXCLUDE that row, not rank it first (ASC NULLS FIRST trap)
    from pyspark.sql.types import StructField, StructType
    nullable_schema = StructType([
        StructField(f.name, f.dataType, True) for f in enc.schema.fields])
    with_null = enc.unionByName(spark.createDataFrame(
        [(999, None, None)], nullable_schema))
    ids = [r["vec_id"] for r in pq_topk(
        with_null, "embedding", "vec_id", q, books, k=5,
        code_col="_pq").collect()]
    assert ids == want_ids and 999 not in ids
    # stored codes of the wrong arity (different m) are dropped, not
    # silently scored against the mismatched codebooks
    wrong_m = enc.withColumn("_pq", F.slice("_pq", 1, 1))
    assert pq_topk(wrong_m, "embedding", "vec_id", q, books, k=5,
                   code_col="_pq").count() == 0

    # IVFADC: probing ALL coarse cells must equal the cell-less ADC path;
    # probing one cell still finds the true nearest (query sits in it)
    from tenzir_spark.operators.similarity import ivf_assign, ivf_build, ivfpq_topk
    cents = ivf_build(df, "embedding", "vec_id", n_centroids=4, iters=3)
    stored = ivf_assign(pq_encode(df, "embedding", books), "embedding", cents)
    allcells = ivfpq_topk(stored, "embedding", "vec_id", q, cents, books,
                          k=5, n_probe=4, cell_col="_ivf", code_col="_pq")
    assert [r["vec_id"] for r in allcells.collect()] == want_ids
    one = ivfpq_topk(stored, "embedding", "vec_id", q, cents, books,
                     k=3, n_probe=1, cell_col="_ivf", code_col="_pq",
                     refine=10).collect()
    assert one[0]["vec_id"] == true_top

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "embedding", "vec_id", m=3)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(df, "embedding", "vec_id", q[:4], books, k=3)
    with pytest.raises(ValueError, match="empty"):
        pq_train(df.limit(0), "embedding", "vec_id", m=2)


def test_window_dedup_modes(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.dedup import window_dedup, window_dedup_stats

    span = "alpha beta gamma delta"  # one shared 4-word window
    df = spark.createDataFrame([
        Row(doc_id=1, text=f"{span} unique one"),
        Row(doc_id=2, text=f"prefix {span} two"),
        Row(doc_id=3, text="totally different words here now"),
        Row(doc_id=4, text=f"{span} {span}"),  # within-doc repeat
    ])
    stats = {r["doc_id"]: r["n_dup_windows"]
             for r in window_dedup_stats(df, "text", "doc_id", w=4).collect()}
    # doc 4 has windows at every offset of "span span"; the shared 4-gram
    # occurs at offsets 1 and 5, plus docs 1 and 2 once each
    assert stats[1] >= 1 and stats[2] >= 1 and stats[4] >= 2
    assert 3 not in stats

    kept = window_dedup(df, "text", "doc_id", w=4, mode="drop")
    assert [r["doc_id"] for r in kept.collect()] == [3]
    assert kept.columns == df.columns

    marked = window_dedup(df, "text", "doc_id", w=4, mode="mark")
    rows = {r["doc_id"]: r for r in marked.collect()}
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["dup_window_frac"] == 0.0
    assert rows[1]["dup_window_frac"] > 0

    # the occurrence rows feed BOTH the count agg and the per-doc join
    # through one repartition — the FINAL (post-AQE) plan must reuse the
    # exchange rather than scan + shuffle the corpus twice
    out = window_dedup_stats(df, "text", "doc_id", w=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_ngram_jaccard_prefix_filter_exact(spark):
    import random

    from pyspark.sql import Row

    from tenzir_spark.operators.dedup import (
        _ngram_jaccard_pairs_brute,
        ngram_jaccard_pairs,
    )

    # seeded corpus engineered for hard cases: shared bases with word
    # swaps (pairs straddling every similarity level), exact duplicates,
    # a stopword ("the") in almost every doc (the inverted-index skew
    # case prefix filtering exists to defuse), singletons, and a pair at
    # the round(j,4) boundary
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        base = rng.sample(vocab, 8) + ["the"]
        rows.append(Row(doc_id=2 * i, text=" ".join(base)))
        mutated = list(base)
        for _ in range(rng.randrange(0, 5)):
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
        rows.append(Row(doc_id=2 * i + 1, text=" ".join(mutated)))
    rows += [Row(doc_id=100, text="solo doc nothing shared"),
             Row(doc_id=101, text="   ")]
    df = spark.createDataFrame(rows)

    for n, t in [(1, 0.8), (1, 0.5), (2, 0.3), (1, 1.0)]:
        got = sorted(map(tuple, ngram_jaccard_pairs(
            df, "doc_id", "text", n=n, threshold=t).collect()))
        want = sorted(map(tuple, _ngram_jaccard_pairs_brute(
            df, "doc_id", "text", n=n, threshold=t).collect()))
        assert got == want, f"n={n} t={t}: {got} != {want}"
    assert len(want) >= 1  # t=1.0 still finds the exact-duplicate pairs

    # rounds-up boundary: j = 3/10 = 0.3 exactly and j just under a
    # round boundary must agree with brute under the round(…,4) filter
    edge = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g"),
        Row(doc_id=2, text="a b c x y z"),      # |∩|=3, |∪|=10, j=0.3
    ])
    got = ngram_jaccard_pairs(edge, "doc_id", "text", n=1,
                              threshold=0.3).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 0.3)]

    # scale shape: the plan must not contain a cartesian product
    q = ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.8)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    with pytest.raises(ValueError, match="threshold"):
        ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.0)


def test_c4_filter_rules(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.text import c4_filter, c4_stats

    good = ("This is a perfectly reasonable first sentence.\n"
            "Here is another well formed line of text!\n"
            "And a third one asking a question, maybe?")
    df = spark.createDataFrame([
        Row(doc_id=1, text=good),
        Row(doc_id=2, text=good + "\nshort line\nenable javascript to view."),
        Row(doc_id=3, text="Lorem Ipsum dolor sit amet says this line."),
        Row(doc_id=4, text=good.replace("question", "brace { question")),
        Row(doc_id=5, text="no terminal punctuation here\nat all"),
    ])
    stats = {r["doc_id"]: r for r in c4_stats(df, "text").collect()}
    assert stats[1]["c4_keep"] and stats[1]["n_kept_lines"] == 3
    # line filters strip the short + javascript lines but the page survives
    assert stats[2]["c4_keep"] and stats[2]["n_kept_lines"] == 3
    assert not stats[3]["c4_keep"]  # lorem ipsum page filter
    assert not stats[4]["c4_keep"]  # curly-brace page filter
    assert not stats[5]["c4_keep"]  # < 3 sentences after line filtering

    kept = c4_filter(df, "text")
    rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(rows) == {1, 2}
    assert rows[2] == good  # rejected lines rewritten out of the page
    assert kept.columns == df.columns


def test_deterministic_sampling_and_mix(spark, sf_dir):
    from tenzir_spark.operators.sampling import deterministic_sample, stratified_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    # pure function of the key: repartitioning must not change the set
    b = {r["doc_id"] for r in deterministic_sample(
        docs.repartition(13), "doc_id", 0.3).collect()}
    assert a == b and 0 < len(a) < docs.count()
    # monotone in fraction: smaller cutoff selects a subset
    c = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a
    # different seed, different set
    d = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, seed=7).collect()}
    assert d != a

    mix = stratified_mix(docs, "source", {"src0": 1.0, "src1": 0.0},
                         key_col="doc_id", default_fraction=0.0)
    rows = mix.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in rows} == {
        "src0": docs.filter("source = 'src0'").count()}


def test_pack_sequences_invariants(spark, sf_dir):
    from tenzir_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    B = 1000
    spans = pack_sequences(docs, "doc_id", "n_chars", block=B)
    rows = spans.collect()
    total = docs.selectExpr("sum(n_chars)").first()[0]

    # spans partition every document's tokens exactly
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    n_by_doc = {r["doc_id"]: r["n_chars"]
                for r in docs.select("doc_id", "n_chars").collect()}
    for did, ss in per_doc.items():
        ss.sort(key=lambda r: r["block_id"])
        assert sum(s["span_len"] for s in ss) == n_by_doc[did]
        assert ss[0]["doc_offset"] == 0
        for prev, nxt in zip(ss, ss[1:]):
            assert nxt["doc_offset"] == prev["doc_offset"] + prev["span_len"]
            assert nxt["block_id"] == prev["block_id"] + 1
            assert nxt["block_offset"] == 0  # continuation starts a new block

    # every block except the last is exactly full
    by_block = {}
    for r in rows:
        by_block[r["block_id"]] = by_block.get(r["block_id"], 0) + r["span_len"]
    last = max(by_block)
    assert all(v == B for b, v in by_block.items() if b != last)
    assert sum(by_block.values()) == total
    assert set(by_block) == set(range(last + 1))

    # distributed: no single-partition exchange in the plan
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_materialize_blocks_roundtrip(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.packing import materialize_blocks

    docs = [Row(doc_id=i, w=[f"t{i}_{j}" for j in range(n)])
            for i, n in enumerate([5, 12, 1, 0, 9, 30])]
    df = spark.createDataFrame(docs)
    B = 8
    out = {r["block_id"]: r["tokens"]
           for r in materialize_blocks(df, "doc_id", "w", block=B).collect()}
    stream = [t for d in docs for t in d.w]
    assert set(out) == set(range((len(stream) + B - 1) // B))
    rebuilt = [t for b in sorted(out) for t in out[b]]
    assert rebuilt == stream  # exact concatenation order preserved
    for b in sorted(out)[:-1]:
        assert len(out[b]) == B


def test_line_dedup_modes(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.dedup import line_dedup, line_dedup_stats

    df = spark.createDataFrame([
        Row(doc_id=1, text="unique a\nshared line\nunique b"),
        Row(doc_id=2, text="shared line\nunique c\n\nshared line"),
        Row(doc_id=3, text="only here\n   \nalso only here"),
    ])
    stats = {(r["doc_id"], r["pos"]): r["is_winner"]
             for r in line_dedup_stats(df, "text", "doc_id").collect()}
    # "shared line" occurs at (1,1), (2,0), (2,3); winner is (1,1)
    assert stats == {(1, 1): True, (2, 0): False, (2, 3): False}

    kept = {r["doc_id"]: r["text"]
            for r in line_dedup(df, "text", "doc_id").collect()}
    assert kept[1] == "unique a\nshared line\nunique b"  # winner survives
    assert kept[2] == "unique c\n"  # both copies dropped, empty line kept
    assert kept[3] == "only here\n   \nalso only here"  # untouched

    dropped = {r["doc_id"]: r["text"]
               for r in line_dedup(df, "text", "doc_id",
                                   mode="drop_all").collect()}
    assert dropped[1] == "unique a\nunique b"  # winner dropped too

    # min_count above the multiplicity leaves everything untouched
    same = {r["doc_id"]: r["text"]
            for r in line_dedup(df, "text", "doc_id", min_count=4).collect()}
    assert same == {r["doc_id"]: r["text"] for r in df.collect()}

    # whitespace-only lines are exempt even though corpus-duplicated;
    # drop_empty_docs removes docs reduced to whitespace
    df2 = spark.createDataFrame([
        Row(doc_id=1, text="boiler\nboiler"),
        Row(doc_id=2, text="boiler"),
        Row(doc_id=3, text="keep me"),
    ])
    left = line_dedup(df2, "text", "doc_id", mode="drop_all",
                      drop_empty_docs=True)
    assert sorted(r["doc_id"] for r in left.collect()) == [3]

    # one exchange feeds both the winner agg and the occurrence join
    out = line_dedup_stats(df, "text", "doc_id")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_pii_redact_rules(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.text import pii_redact, pii_stats

    df = spark.createDataFrame([
        Row(doc_id=1, text="mail a.b+c@example.co.uk call 555-123-4567 "
                           "ssn 123-45-6789 card 4111-1111-1111-1111 "
                           "host 192.168.0.1 done"),
        Row(doc_id=2, text="no pii at all, just text with numbers 12345"),
    ])
    out = {r["doc_id"]: r["text"]
           for r in pii_redact(df, "text").collect()}
    assert out[1] == ("mail <EMAIL> call <PHONE> ssn <SSN> card <CARD> "
                      "host <IP> done")
    assert out[2] == "no pii at all, just text with numbers 12345"

    st = pii_stats(df, "text").filter("doc_id = 1").first()
    assert (st["n_pii_email"], st["n_pii_ssn"], st["n_pii_card"],
            st["n_pii_phone"], st["n_pii_ipv4"]) == (1, 1, 1, 1, 1)

    # kinds subset: only the requested rules fire
    sub = {r["doc_id"]: r["text"]
           for r in pii_redact(df, "text", kinds=["email"]).collect()}
    assert "<EMAIL>" in sub[1] and "555-123-4567" in sub[1]

    # card is consumed before phone can see its 3-3-4 tail
    df3 = spark.createDataFrame(
        [Row(doc_id=1, text="pay 4111 1111 1111 1111 now")])
    assert pii_redact(df3, "text").first()["text"] == "pay <CARD> now"


def test_line_dedup_pii_text_stages(spark):
    from pyspark.sql import Row

    from tenzir_spark.plans.pipeline import TqlError, run_tql

    df = spark.createDataFrame([
        Row(doc_id=1, text="dup\nmine"),
        Row(doc_id=2, text="dup\nyours ip 10.0.0.1"),
    ])
    out = {r["doc_id"]: r["text"]
           for r in run_tql(df, "line-dedup text by doc_id").collect()}
    assert out == {1: "dup\nmine", 2: "yours ip 10.0.0.1"}

    red = {r["doc_id"]: r["text"]
           for r in run_tql(df, "redact-pii text kinds ipv4").collect()}
    assert red[2] == "dup\nyours ip <IP>"

    import pytest as _pytest
    with _pytest.raises(TqlError, match="usage"):
        run_tql(df, "line-dedup text")
    with _pytest.raises(TqlError, match="unknown kinds"):
        run_tql(df, "redact-pii text kinds bogus")


def test_dsir_weights_and_resample(spark):
    from pyspark.sql import Row, functions as F

    from tenzir_spark.operators.selection import dsir_resample, dsir_weights

    # target vocabulary {alpha beta gamma}; raw-only vocabulary {noise...}
    rows = [Row(doc_id=i, source="tgt",
                text="alpha beta gamma alpha beta") for i in range(4)]
    rows += [Row(doc_id=10 + i, source="raw",
                 text="noise words entirely different here") for i in range(4)]
    rows += [Row(doc_id=20, source="raw", text="alpha beta gamma alpha")]
    rows += [Row(doc_id=21, source="raw", text="")]
    df = spark.createDataFrame(rows)

    w = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_weights(df, "text", "doc_id",
                               F.col("source") == "tgt", d=256).collect()}
    # target-vocabulary docs (wherever they live) score above raw-only docs
    assert w[20] > w[10] and w[0] > w[10]
    assert 21 not in w  # no n-grams -> absent, by contract
    # weights are a pure function of the corpus: re-run identical
    w2 = {r["doc_id"]: r["dsir_weight"]
          for r in dsir_weights(df, "text", "doc_id",
                                F.col("source") == "tgt", d=256).collect()}
    assert w == w2

    kept = dsir_resample(df, "text", "doc_id",
                         F.col("source") == "tgt", fraction=0.5, d=256)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert len(ids) == 5 and kept.columns == df.columns  # ceil(0.5 * 10)
    # deterministic: same selection on re-run
    ids2 = sorted(r["doc_id"] for r in dsir_resample(
        df, "text", "doc_id", F.col("source") == "tgt",
        fraction=0.5, d=256).collect())
    assert ids == ids2
    # the high-weight target-vocab docs dominate the kept half
    assert {0, 1, 2, 3} & set(ids) and 20 in ids or len(set(ids) & {0,1,2,3,20}) >= 4

    # one exchange feeds both the histogram and the score aggregation
    out = dsir_weights(df, "text", "doc_id", F.col("source") == "tgt", d=64)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_dsir_sample_text_stage(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.selection import dsir_resample
    from tenzir_spark.plans.pipeline import run_tql

    rows = [Row(doc_id=i, source="tgt", text="alpha beta gamma")
            for i in range(4)]
    rows += [Row(doc_id=10 + i, source="raw", text="noise words here")
             for i in range(4)]
    df = spark.createDataFrame(rows)
    got = sorted(r["doc_id"] for r in run_tql(
        df, 'dsir-sample 0.5 text by doc_id d 256 '
            'target source == "tgt"').collect())
    from pyspark.sql import functions as F

    want = sorted(r["doc_id"] for r in dsir_resample(
        df, "text", "doc_id", F.col("source") == "tgt",
        fraction=0.5, d=256).collect())
    assert got == want and len(got) == 4


def test_semdedup_flags_match_bruteforce(spark):
    import itertools

    import numpy as np
    from pyspark.sql import Row

    from tenzir_spark.operators.similarity import semdedup, semdedup_centroids

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 8))
    vecs = []
    for i in range(6):
        vecs.append(base[i])
        # a near-duplicate of each: same direction + tiny noise
        vecs.append(base[i] + rng.standard_normal(8) * 0.01)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])
    cents = semdedup_centroids(df, "embedding", "vec_id", n_clusters=3)
    out = semdedup(df, "embedding", "vec_id", centroids=cents,
                   threshold=0.9)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 12 and out.columns == [
        "vec_id", "cluster", "cos_c", "emb_norm", "is_dup"]

    # brute-force replay of the declared semantics in numpy
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    V = [np.array(v) for v in vecs]
    C = [np.array(c) for c in cents]
    assign = {}
    for i, v in enumerate(V):
        scored = sorted(((round(cos(v, c), 6), -j) for j, c in enumerate(C)),
                        reverse=True)
        assign[i] = -scored[0][1]
    for i, r in rows.items():
        assert r["cluster"] == assign[i], i
    rank = {i: (-round(cos(V[i], C[assign[i]]), 6), i) for i in range(12)}
    for i in range(12):
        expect = any(
            assign[j] == assign[i] and rank[j] < rank[i]
            and round(cos(V[i], V[j]), 4) >= 0.9
            for j in range(12))
        assert rows[i]["is_dup"] == expect, i

    # every near-dup partner pair that landed in one cluster: exactly one
    # of the two is flagged (the higher-ranked survivor is kept)
    for i in range(0, 12, 2):
        if assign[i] == assign[i + 1]:
            assert rows[i]["is_dup"] != rows[i + 1]["is_dup"]

    # the shared argmax exchange must be REUSED between the self-join
    # build side and the flag re-attach (never recomputed) post-AQE
    out2 = semdedup(df, "embedding", "vec_id", centroids=cents)
    out2.collect()
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_semdedup_pipeline_stage(spark, sf_dir):
    from tenzir_spark.operators.similarity import semdedup
    from tenzir_spark.plans.pipeline import run_tql

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = run_tql(em, "semdedup embedding by vec_id k 4 threshold 0.35")
    direct = semdedup(em, "embedding", "vec_id", n_clusters=4,
                      threshold=0.35)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect()))


def test_token_window_dedup_stats(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.dedup import token_window_dedup_stats

    shared = [1, 2, 3, 4]
    df = spark.createDataFrame([
        Row(doc_id=1, tokens=shared + [9]),
        Row(doc_id=2, tokens=[8] + shared),
        Row(doc_id=3, tokens=[5, 6, 7, 8, 9]),
        Row(doc_id=4, tokens=shared + shared),   # within-doc repeat
        Row(doc_id=5, tokens=[1, 2]),            # shorter than w: no windows
        Row(doc_id=6, tokens=[]),                # empty: no windows
    ])
    out = token_window_dedup_stats(df, "tokens", "doc_id", w=4)
    stats = {r["doc_id"]: r["n_dup_windows"] for r in out.collect()}
    assert stats[1] >= 1 and stats[2] >= 1 and stats[4] >= 2
    # short/empty docs must NOT appear (a bogus shared empty window
    # would flag 5 and 6 as mutual duplicates)
    assert 3 not in stats and 5 not in stats and 6 not in stats

    # one exchange, both consumers reuse it post-AQE
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_token_window_dedup_matches_text_twin(spark, sf_dir):
    from pyspark.sql import functions as F

    from tenzir_spark.operators.dedup import (
        token_window_dedup_stats, window_dedup_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
        " ")
    tokens = F.transform(
        words, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10)
        .cast("int"))
    toked = docs.select("doc_id", tokens.alias("tokens"))
    via_tokens = sorted(map(tuple, token_window_dedup_stats(
        toked, "tokens", "doc_id", w=8).collect()))
    via_text = sorted(map(tuple, window_dedup_stats(
        docs, "text", "doc_id", w=8).collect()))
    assert via_tokens == via_text


def test_token_window_dedup_modes_and_pipeline(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.dedup import token_window_dedup
    from tenzir_spark.plans.pipeline import run_tql

    shared = [1, 2, 3, 4]
    df = spark.createDataFrame([
        Row(doc_id=1, tokens=shared + [9]),
        Row(doc_id=2, tokens=[8] + shared),
        Row(doc_id=3, tokens=[5, 6, 7, 8, 9]),
    ])
    kept = token_window_dedup(df, "tokens", "doc_id", w=4)
    assert [r["doc_id"] for r in kept.collect()] == [3]

    marked = {r["doc_id"]: r for r in token_window_dedup(
        df, "tokens", "doc_id", w=4, mode="mark").collect()}
    assert marked[1]["dup_window_frac"] == 0.5  # 1 of 2 windows
    assert marked[3]["n_dup_windows"] == 0

    # pipeline text dispatches to the token twin on array-typed fields
    via_text = run_tql(df, "window-dedup tokens by doc_id w 4")
    assert [r["doc_id"] for r in via_text.collect()] == [3]


def test_dedup_spans_exactsubstr(spark):
    """Lee et al. ExactSubstr span removal: duplicated w-token spans are
    deleted from all but the globally-first occurrence; unique
    remainders survive; short docs untouched; fully-covered docs empty
    (droppable via drop_empty)."""
    from pyspark.sql import Row, functions as F

    from tenzir_spark.operators.dedup import dedup_spans, dup_span_intervals
    from tenzir_spark.plans.pipeline import run_tql

    shared = [1, 2, 3, 4]
    df = spark.createDataFrame([
        Row(doc_id=1, tokens=[9] + shared + [10]),  # first occurrence: keeper
        Row(doc_id=2, tokens=[8] + shared + [11]),  # loser at p=2..5
        Row(doc_id=3, tokens=[5, 6, 7, 8, 9]),      # no shared window
        Row(doc_id=4, tokens=[1, 2, 3]),            # shorter than w
        Row(doc_id=5, tokens=list(shared)),         # fully covered
    ])
    out = {r["doc_id"]: r["tokens"]
           for r in dedup_spans(df, "tokens", "doc_id", w=4).collect()}
    assert out[1] == [9, 1, 2, 3, 4, 10]
    assert out[2] == [8, 11]
    assert out[3] == [5, 6, 7, 8, 9]
    assert out[4] == [1, 2, 3]
    assert out[5] == []

    kept_ids = sorted(
        r["doc_id"] for r in dedup_spans(
            df, "tokens", "doc_id", w=4, drop_empty=True).collect())
    assert kept_ids == [1, 2, 3, 4]

    # NULL / originally-empty token arrays had no position covered, so
    # drop_empty passes them through unchanged (only covered-to-empty
    # documents are removed)
    extra = spark.createDataFrame(
        [Row(doc_id=8, tokens=None), Row(doc_id=9, tokens=[])],
        schema=df.schema)
    kept2 = {r["doc_id"]: r["tokens"] for r in dedup_spans(
        df.unionByName(extra), "tokens", "doc_id", w=4,
        drop_empty=True).collect()}
    assert sorted(kept2) == [1, 2, 3, 4, 8, 9]
    assert kept2[8] is None and kept2[9] == []

    # intra-document repetition: the second occurrence inside ONE doc
    # is the loser (the paper dedups within documents too)
    rep = spark.createDataFrame(
        [Row(doc_id=7, tokens=shared + [0] + shared)])
    (only,) = dedup_spans(rep, "tokens", "doc_id", w=4).collect()
    assert only["tokens"] == [1, 2, 3, 4, 0]

    # overlapping losing windows merge into ONE disjoint interval
    pair = spark.createDataFrame([
        Row(doc_id=1, tokens=[1, 2, 3, 4, 5]),
        Row(doc_id=2, tokens=[9, 1, 2, 3, 4, 5]),
    ])
    ivs = {r["doc_id"]: [(iv["lo"], iv["hi"]) for iv in r["dup_spans"]]
           for r in dup_span_intervals(pair, "tokens", "doc_id", w=4)
           .collect()}
    assert ivs == {2: [(2, 6)]}
    out2 = {r["doc_id"]: r["tokens"]
            for r in dedup_spans(pair, "tokens", "doc_id", w=4).collect()}
    assert out2 == {1: [1, 2, 3, 4, 5], 2: [9]}

    # pipeline text stage (+ --drop-empty)
    via_text = {r["doc_id"]: r["tokens"] for r in run_tql(
        df, "dedup-spans tokens by doc_id w 4").collect()}
    assert via_text == out
    assert sorted(r["doc_id"] for r in run_tql(
        df, "dedup-spans tokens by doc_id w 4 --drop-empty").collect()
    ) == [1, 2, 3, 4]

    # span removal needs the token-array shape, not prose
    with pytest.raises(TypeError):
        dedup_spans(df.withColumn("t", F.lit("x")), "t", "doc_id")

    # a pre-existing dup_spans column would be silently clobbered by the
    # interval join — refuse instead
    with pytest.raises(ValueError, match="dup_spans"):
        dedup_spans(
            df.withColumn("dup_spans", F.lit(None).cast("string")),
            "tokens", "doc_id", w=4)


def test_asof_join_matches_pandas(spark):
    """asof_join vs pandas.merge_asof (independent oracle): backward,
    forward, tolerance, unmatched rows, name collisions."""
    import pandas as pd

    from tenzir_spark.operators.asof import asof_join

    lpd = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "ts": [5.0, 10.0, 20.0, 3.0, 30.0, 1.0],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    rpd = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "ts": [5.0, 15.0, 10.0, 25.0],
        "value": [100.0, 150.0, 110.0, 125.0],
    })
    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd)

    for direction in ("backward", "forward"):
        got = (asof_join(ldf, rdf, on="k", left_ts="ts",
                         direction=direction)
               .toPandas().sort_values(["k", "ts"]).reset_index(drop=True))
        exp = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", by="k",
            direction=direction, suffixes=("", "_r"))
        exp = exp.rename(columns={"ts": "ts"})
        exp["ts_r"] = exp["ts"].where(exp["value_r"].notna())  # placeholder
        # pandas doesn't emit the matched right ts; recompute it:
        def _mts(row):
            cand = rpd[(rpd.k == row.k)]
            cand = cand[cand.ts <= row.ts] if direction == "backward" \
                else cand[cand.ts >= row.ts]
            if cand.empty:
                return None
            return cand.ts.max() if direction == "backward" else cand.ts.min()
        exp["ts_r"] = exp.apply(_mts, axis=1)
        exp = exp.sort_values(["k", "ts"]).reset_index(drop=True)
        def _nl(s):
            return [None if pd.isna(x) else x for x in s]
        assert _nl(got["value_r"]) == _nl(exp["value_r"]), direction
        assert _nl(got["ts_r"]) == _nl(exp["ts_r"]), direction

    # tolerance: gap > 4 s nulls the match
    tol = (asof_join(ldf, rdf, on="k", left_ts="ts", tolerance_s=4.0)
           .toPandas().sort_values(["k", "ts"]).reset_index(drop=True))
    expt = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", by="k",
        direction="backward", tolerance=4.0, suffixes=("", "_r"))
    expt = expt.sort_values(["k", "ts"]).reset_index(drop=True)
    assert [None if pd.isna(x) else x for x in tol["value_r"]] \
        == [None if pd.isna(x) else x for x in expt["value_r"]]


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Several right rows on the same (key, ts): the documented rule is
    max payload struct — result independent of partition layout."""
    from tenzir_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([("a", 10.0)], "k string, ts double")
    rdf = spark.createDataFrame(
        [("a", 5.0, "x", 1.0), ("a", 5.0, "z", 0.5), ("a", 5.0, "y", 9.0)],
        "k string, ts double, tag string, w double").repartition(8)
    out = asof_join(ldf, rdf, on="k", left_ts="ts").collect()
    assert len(out) == 1
    # max struct = lexicographic over (tag, w) -> ("z", 0.5)
    assert out[0]["tag"] == "z" and out[0]["w"] == 0.5
    assert out[0]["ts_r"] == 5.0


def test_asof_join_plan_single_exchange(spark):
    """Scale shape: ONE hash exchange on the key, no join node."""
    from tenzir_spark.operators.asof import asof_join

    ldf = spark.range(100).selectExpr("id % 7 AS k", "CAST(id AS DOUBLE) ts",
                                      "id AS v")
    rdf = spark.range(20).selectExpr("id % 7 AS k",
                                     "CAST(id * 5 AS DOUBLE) ts",
                                     "id AS snap")
    plan = asof_join(ldf, rdf, on="k", left_ts="ts")._jdf \
        .queryExecution().executedPlan().toString()
    import re as _re
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan


def test_fill_forward_locf(spark):
    from tenzir_spark.operators.asof import fill_forward

    df = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, 10.0), ("a", 3.0, None),
         ("a", 4.0, None), ("b", 1.0, None), ("b", 2.0, 5.0)],
        "k string, ts double, v double")
    out = {(r["k"], r["ts"]): r["v"]
           for r in fill_forward(df, on="k", ts="ts", cols=["v"]).collect()}
    assert out[("a", 1.0)] is None          # leading null stays null
    assert out[("a", 3.0)] == 10.0 and out[("a", 4.0)] == 10.0
    assert out[("b", 1.0)] is None and out[("b", 2.0)] == 5.0


def test_sessionize_gap(spark):
    from tenzir_spark.operators.asof import sessionize

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 100.0), ("a", 101.0), ("b", 0.0)],
        "k string, ts double")
    out = {(r["k"], r["ts"]): r["session_no"]
           for r in sessionize(df, on="k", ts="ts", gap_s=30).collect()}
    assert out == {("a", 0.0): 0, ("a", 10.0): 0,
                   ("a", 100.0): 1, ("a", 101.0): 1, ("b", 0.0): 0}
    # boundary: gap EXACTLY 30 continues the session (strict >)
    df2 = spark.createDataFrame([("a", 0.0), ("a", 30.0), ("a", 60.001)],
                                "k string, ts double")
    out2 = [r["session_no"] for r in
            sessionize(df2, on="k", ts="ts", gap_s=30)
            .orderBy("ts").collect()]
    assert out2 == [0, 0, 1]


def test_rolling_agg_trailing_window(spark):
    from tenzir_spark.operators.asof import rolling_agg

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 5, 2.0), ("a", 11, 4.0), ("a", 11, 8.0),
         ("b", 0, 100.0)],
        "k string, ts long, v double")
    out = rolling_agg(df, on="k", ts="ts", col="v", window_s=10,
                      fns=("sum", "count")).collect()
    got = {(r["k"], r["ts"], r["v"]): (r["sum_v_roll"], r["count_v_roll"])
           for r in out}
    assert got[("a", 0, 1.0)] == (1.0, 1)
    assert got[("a", 5, 2.0)] == (3.0, 2)       # [ts-10, ts] includes 0
    # duplicate ts: RANGE frame -> both rows see the SAME frame [1,11]
    # = {2.0, 4.0, 8.0} (ts=0 is outside 11-10=1)
    assert got[("a", 11, 4.0)] == (14.0, 3)
    assert got[("a", 11, 8.0)] == (14.0, 3)
    assert got[("b", 0, 100.0)] == (100.0, 1)


def test_asof_join_review_fixes(spark):
    """Round-4 review findings: null timestamps never match (both
    directions), tolerance works on TIMESTAMP_NTZ via exact epoch-micros,
    map payloads join without the unorderable-struct analysis error,
    chained joins never emit duplicate suffixed names."""
    from tenzir_spark.operators.asof import asof_join

    # null ts: right null-ts rows dropped, left null-ts rows unmatched
    ldf = spark.createDataFrame([("a", 7.0), ("a", None)],
                                "k string, ts double")
    rdf = spark.createDataFrame([("a", None, 9.9), ("a", 5.0, 1.5)],
                                "k string, ts double, px double")
    back = {r["ts"]: (r["px"], r["ts_r"])
            for r in asof_join(ldf, rdf, on="k", left_ts="ts").collect()}
    assert back[7.0] == (1.5, 5.0)
    assert back[None] == (None, None)
    fwd = {r["ts"]: r["px"] for r in asof_join(
        ldf, rdf, on="k", left_ts="ts", direction="forward").collect()}
    assert fwd[None] is None

    # NTZ timestamps + tolerance (used to raise DATATYPE_MISMATCH)
    lt = spark.sql("SELECT 'a' k, TIMESTAMP_NTZ'2024-01-01 00:01:00' ts")
    rt = spark.sql(
        "SELECT 'a' k, TIMESTAMP_NTZ'2024-01-01 00:00:00' ts, 1.5 px")
    got = asof_join(lt, rt, on="k", left_ts="ts",
                    tolerance_s=60.0).collect()[0]
    assert got["px"] == 1.5  # gap EXACTLY 60 s is within tolerance
    got = asof_join(lt, rt, on="k", left_ts="ts",
                    tolerance_s=59.999999).collect()[0]
    assert got["px"] is None

    # map payload: unorderable tiebreak term must be dropped, not fatal
    rm = spark.createDataFrame([("a", 5.0, {"x": "1"})],
                               "k string, ts double, m map<string,string>")
    got = asof_join(ldf, rm, on="k", left_ts="ts").collect()
    assert {r["ts"]: r["m"] for r in got}[7.0] == {"x": "1"}

    # chained join: second px suffixes to px_r_r, never a duplicate px_r
    once = asof_join(ldf.filter("ts IS NOT NULL"), rdf.filter("ts IS NOT NULL"),
                     on="k", left_ts="ts")
    twice = asof_join(once, rdf.filter("ts IS NOT NULL"),
                      on="k", left_ts="ts")
    assert sorted(c for c in twice.columns if c.startswith("px")) \
        == ["px", "px_r", "px_r_r"] or len(set(twice.columns)) == len(twice.columns)
    twice.collect()


def test_rolling_agg_fractional_numeric_ts(spark):
    """Numeric ts values keep micro-precision frame membership (a bare
    long cast truncated values and shifted frames by up to a unit)."""
    from tenzir_spark.operators.asof import rolling_agg

    df = spark.createDataFrame([("a", 0.2, 1.0), ("a", 10.9, 2.0)],
                               "k string, ts double, v double")
    out = {r["ts"]: r["count_v_roll"] for r in rolling_agg(
        df, on="k", ts="ts", col="v", window_s=10, fns=("count",)
    ).collect()}
    assert out[10.9] == 1  # true gap 10.7 > 10 — must NOT include ts=0.2


def test_chunk_documents(spark):
    from tenzir_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, list(range(30)), "a"),   # 3 chunks at max 16 / overlap 4
         (2, list(range(16)), "b"),   # exactly one chunk
         (3, list(range(4)), "c"),    # shorter than overlap: one chunk
         (4, [], "d"),                # empty: no rows
         (5, None, "e")],             # null: no rows
        "doc_id: long, tokens: array<int>, src: string")
    out = chunk_documents(df, "tokens", "doc_id", max_len=16, overlap=4,
                          keep_cols=["src"]).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3}
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 12: starts 0,12,24 — 30 tokens, last chunk short not padded
    assert [r["chunk_len"] for r in c1] == [16, 16, 6]
    assert all(r["n_chunks"] == 3 and r["src"] == "a" for r in c1)
    # reconstruction: dropping each non-first chunk's overlap re-yields
    # the original token sequence
    rebuilt = list(c1[0]["chunk_tokens"])
    for r in c1[1:]:
        rebuilt += list(r["chunk_tokens"])[4:]
    assert rebuilt == list(range(30))
    # neighbor overlap is literal: last 4 of chunk i == first 4 of i+1
    for a, b in zip(c1, c1[1:]):
        assert list(a["chunk_tokens"])[-16:][12:] == list(b["chunk_tokens"])[:4]
    assert by_doc[2][0]["chunk_len"] == 16 and by_doc[2][0]["n_chunks"] == 1
    assert by_doc[3][0]["chunk_len"] == 4 and by_doc[3][0]["n_chunks"] == 1

    import pytest as _pt
    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, "tokens", "doc_id", max_len=8, overlap=8)
    with _pt.raises(ValueError, match="max_len"):
        chunk_documents(df, "tokens", "doc_id", max_len=0)


def test_fim_transform(spark):
    from tenzir_spark.operators.packing import fim_transform

    df = spark.createDataFrame(
        [(i, list(range(100, 120))) for i in range(40)],
        "doc_id: long, tokens: array<int>")
    out = fim_transform(df, "tokens", "doc_id", rate_pct=50).collect()
    assert len(out) == 40
    applied = [r for r in out if r["fim_applied"]]
    passed = [r for r in out if not r["fim_applied"]]
    assert applied and passed  # deterministic 50% split hits both sides
    for r in passed:
        assert list(r["fim_tokens"]) == list(range(100, 120))
    for r in applied:
        t = list(r["fim_tokens"])
        # sentinel layout: <PRE> prefix <SUF> suffix <MID> middle
        assert t[0] == -1 and t.count(-1) == 1
        assert t.count(-3) == 1 and t.count(-2) == 1
        i_suf, i_mid = t.index(-3), t.index(-2)
        assert 0 < i_suf < i_mid
        prefix, suffix, middle = t[1:i_suf], t[i_suf+1:i_mid], t[i_mid+1:]
        assert prefix + middle + suffix == list(range(100, 120))
    # spm reorders the same segments
    spm = {r["doc_id"]: r for r in
           fim_transform(df, "tokens", "doc_id", rate_pct=50,
                         mode="spm").collect()}
    for r in applied:
        t = list(spm[r["doc_id"]]["fim_tokens"])
        assert t[0] == -1 and t[1] == -3  # <PRE><SUF>suffix<MID>prefix middle
    # rate 100 applies everywhere (empty arrays excepted), rate 0 nowhere
    assert all(r["fim_applied"] for r in
               fim_transform(df, "tokens", "doc_id", rate_pct=100).collect())
    assert not any(r["fim_applied"] for r in
                   fim_transform(df, "tokens", "doc_id", rate_pct=0).collect())

    import pytest as _pt
    with _pt.raises(ValueError, match="mode"):
        fim_transform(df, "tokens", "doc_id", mode="pms")
    with _pt.raises(ValueError, match="rate_pct"):
        fim_transform(df, "tokens", "doc_id", rate_pct=101)


def test_cosine_brute_baseline_input_guard(spark):
    """The brute-force cosine baseline refuses production-sized inputs
    (it is O(n²) by construction — the LSH/index twins are the scale
    path); explicit opt-out still works."""
    import pytest as _pytest

    from tenzir_spark.operators.similarity import cosine_near_dup_pairs

    df = spark.range(200).selectExpr(
        "cast(id AS string) AS vec_id",
        "array(cast(id AS double), 1.0d) AS emb")
    with _pytest.raises(ValueError, match="max_input_rows"):
        cosine_near_dup_pairs(df, "emb", "vec_id", max_input_rows=100)
    out = cosine_near_dup_pairs(df, "emb", "vec_id", threshold=0.999,
                                max_input_rows=None)
    assert out.count() > 0
