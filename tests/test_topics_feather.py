"""publish/subscribe topics, feather IPC round-trip, compress codecs."""

import pytest
from pyspark.sql import Row, functions as F


def test_publish_subscribe_batch_and_incremental(spark, tmp_path):
    from tenzir_spark.operators.topics import publish, subscribe, topic_segments

    wh = str(tmp_path)
    publish(spark.range(10).withColumn("src", F.lit("a")), "alerts", wh)
    pos = topic_segments(wh, "alerts")[-1]
    publish(spark.range(5).withColumn("src", F.lit("b")), "alerts", wh)

    full = subscribe(spark, "alerts", wh)
    assert full.count() == 15
    # incremental poll: only the second publish
    inc = subscribe(spark, "alerts", wh, from_segment=pos)
    assert inc.count() == 5
    assert {r["src"] for r in inc.select("src").distinct().collect()} == {"b"}
    with pytest.raises(ValueError):
        subscribe(spark, "alerts", wh, from_segment=topic_segments(wh, "alerts")[-1])
    with pytest.raises(ValueError):
        subscribe(spark, "empty_topic", wh)


def test_subscribe_stream_tails_topic(spark, tmp_path):
    from tenzir_spark.operators.topics import publish, subscribe_stream

    wh = str(tmp_path)
    src = spark.range(7).withColumn("v", F.col("id") * 2)
    publish(src, "t2", wh)
    stream = subscribe_stream(spark, "t2", wh, schema="id long, v long")
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 7


def test_feather_roundtrip(spark, tmp_path):
    from tenzir_spark.sources.feather import read_feather, write_feather

    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", n=i, score=i / 7.0) for i in range(500)]
    ).repartition(4)
    files = write_feather(df, str(tmp_path / "fth"))
    assert len(files) >= 1 and all(f.endswith(".feather") for f in files)

    back = read_feather(spark, str(tmp_path / "fth"))
    assert back.count() == 500
    a = sorted((r["doc_id"], r["n"], round(r["score"], 6)) for r in back.collect())
    b = sorted((r["doc_id"], r["n"], round(r["score"], 6)) for r in df.collect())
    assert a == b


@pytest.mark.parametrize("codec", ["gzip", "zlib", "bz2", "lzma"])
def test_compress_decompress_roundtrip(spark, codec):
    from tenzir_spark.operators.transform import compress_field, decompress_field

    df = spark.createDataFrame(
        [Row(doc_id=i, text=("payload %d " % i) * 50) for i in range(50)]
        + [Row(doc_id=99, text=None)]
    )
    comp = compress_field(df, "text", codec=codec, out="blob")
    rows = comp.select("doc_id", "text", "blob").collect()
    assert all(r["blob"] is None or len(r["blob"]) < len(r["text"]) for r in rows
               if r["text"] is not None)
    back = decompress_field(comp, "blob", codec=codec, out="text2")
    for r in back.select("text", "text2").collect():
        if r["text"] is None:
            assert r["text2"] is None
        else:
            assert bytes(r["text2"]).decode() == r["text"]
