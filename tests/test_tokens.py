"""Vectorized token UDFs + multimodal plumbing."""

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_tokens_fingerprint_equality_invariant(spark):
    from tenzir_spark.functions.tokens import tokens_fingerprint

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ])
    rows = [
        (1, [1, 2, 3]),
        (2, [1, 2, 3]),     # identical -> same fp
        (3, [3, 2, 1]),     # permuted -> different fp (order-sensitive)
        (4, [1, 2]),        # prefix -> different fp
        (5, []),            # empty
        (6, None),          # null
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["id"]: r["fp"] for r in df.select("id", tokens_fingerprint("tokens").alias("fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert got[1] != got[4]
    assert got[5] is not None
    assert got[6] is None


def test_tokens_truncate(spark):
    from tenzir_spark.functions.tokens import tokens_truncate_512

    df = spark.createDataFrame(
        [(list(range(1000)),), (list(range(5)),)],
        T.StructType([T.StructField("tokens", T.ArrayType(T.IntegerType()))]),
    )
    out = df.select(F.size(tokens_truncate_512("tokens")).alias("n")).collect()
    assert sorted(r["n"] for r in out) == [5, 512]


def test_token_minhash_similarity(spark):
    from tenzir_spark.functions.tokens import token_minhash_8

    base = list(range(100))
    near = base[:95] + [999, 998, 997, 996, 995]
    far = list(range(1000, 1100))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)],
        "id long, tokens array<int>",
    )
    sigs = {r["id"]: r["s"] for r in df.select("id", token_minhash_8("tokens").alias("s")).collect()}
    match_near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    match_far = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert match_near > match_far
    assert match_far == 0


def test_multimodal_feature_plumbing(spark):
    from tenzir_spark.functions.multimodal import MEDIA_SCHEMA, extract_features, sample_frames

    rows = [
        ("m1", "image", b"\x01\x02\x03\x04" * 10, "image/png", 8, 8, None),
        ("m2", "video", b"\xff" * 64, "video/mp4", 64, 48, 3500),
        ("m3", "audio", None, "audio/wav", None, None, 2000),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(df).collect()
    assert len(feats) == 3
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m1"]["n_bytes"] == 40
    assert len(by_id["m2"]["feat"]) == 8
    assert all(abs(x) < 1e-9 for x in by_id["m3"]["feat"])  # null payload -> zeros

    frames = sample_frames(df, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]

    import pytest

    with pytest.raises(Exception):
        extract_features(df, real_decoder=True).collect()


def test_token_stats_jvm(spark):
    from tenzir_spark.functions.tokens import token_stats

    df = spark.createDataFrame([([5, 1, 9],)], "tokens array<int>")
    r = token_stats(df).collect()[0]
    assert (r["tok_len"], r["tok_min"], r["tok_max"]) == (3, 1, 9)
    assert r["tok_sum_weighted"] == 5 * 1 + 1 * 2 + 9 * 3


def test_bpe_train_encode_roundtrip(spark):
    from pyspark.sql import Row

    from tenzir_spark.operators.bpe import (
        bpe_decode_tokens, bpe_encode, bpe_train, bpe_vocab,
    )

    df = spark.createDataFrame([
        Row(doc_id=1, text="low lower lowest"),
        Row(doc_id=2, text="low low newer newest"),
        Row(doc_id=3, text="wider wide widest"),
    ])
    merges = bpe_train(df, "text", num_merges=40)
    assert merges and merges == bpe_train(df, "text", num_merges=40)
    # the most frequent word collapses to few symbols
    enc = bpe_encode(df, "text", merges)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    assert rows[2][:1] == ["low</w>"] or "low</w>" in rows[2]
    # open vocabulary: decode reproduces the normalized text exactly
    for r in df.collect():
        norm = " ".join(r["text"].lower().split())
        assert bpe_decode_tokens(rows[r["doc_id"]]) == norm
    # vocab table is deterministic and covers EVERY emitted token (the
    # alphabet chars are always present even when they never merged)
    vocab = bpe_vocab(merges)
    for toks in rows.values():
        for t in toks:
            assert t in vocab, t

    # deterministic sampled build: same spec -> same merges
    m1 = bpe_train(df, "text", num_merges=10, sample_mod=2, id_col="doc_id")
    m2 = bpe_train(df, "text", num_merges=10, sample_mod=2, id_col="doc_id")
    assert m1 == m2

    # nulls and empty docs encode to []
    df2 = spark.createDataFrame([Row(doc_id=1, text=None),
                                 Row(doc_id=2, text="  ")])
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df2, "text", merges).collect()}
    assert got == {1: [], 2: []}

    # clear errors instead of executor-side failures: nested paths and
    # pre-existing output columns are rejected at plan time
    import pytest as _pytest
    with _pytest.raises(ValueError, match="top-level"):
        bpe_encode(df, "payload.text", merges)
    with _pytest.raises(ValueError, match="already exists"):
        bpe_encode(enc, "text", merges)


def test_bpe_text_stage(spark):
    from pyspark.sql import Row

    from tenzir_spark.plans.pipeline import run_tql

    df = spark.createDataFrame([
        Row(doc_id=1, text="low lower low"),
        Row(doc_id=2, text="low lowest"),
    ])
    out = run_tql(df, "bpe text by doc_id merges 20")
    rows = {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}
    assert set(rows) == {1, 2} and all(len(v) > 0 for v in rows.values())
    from tenzir_spark.operators.bpe import bpe_decode_tokens
    assert bpe_decode_tokens(rows[1]) == "low lower low"
