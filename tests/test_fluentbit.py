"""msgpack codec + Fluent Forward protocol source tests."""

import datetime
import threading

import pytest
from pyspark.sql import Row, functions as F

from tenzir_spark.sources.msgpack import (
    Ext,
    MsgpackError,
    pack,
    read_msgpack,
    unpack_all,
    unpack_from,
)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

BOUNDARY_VALUES = [
    None, True, False,
    0, 1, 127, 128, 255, 256, 65535, 65536,
    2**32 - 1, 2**32, 2**63 - 1, 2**64 - 1,
    -1, -32, -33, -128, -129, -32768, -32769,
    -2**31, -2**31 - 1, -2**63,
    0.0, 1.5, -3.25, 1e300,
    "", "a", "x" * 31, "y" * 32, "z" * 255, "w" * 256, "é-ünïcødé",
    b"", b"\x00\xff", b"b" * 255, b"c" * 256,
    [], [1, "two", None], list(range(20)),
    {}, {"k": 1, "nested": {"a": [1, 2]}}, {str(i): i for i in range(20)},
    Ext(0, b"\x00\x00\x00\x01\x00\x00\x00\x02"),
    Ext(5, b"x"), Ext(-7, b"ab"), Ext(42, b"q" * 17),
]


@pytest.mark.parametrize("value", BOUNDARY_VALUES,
                         ids=[repr(v)[:40] for v in BOUNDARY_VALUES])
def test_msgpack_roundtrip(value):
    got, end = unpack_from(pack(value))
    assert got == value
    assert end == len(pack(value))


def test_msgpack_smallest_encoding():
    # fixint / fixstr / fixarray / fixmap single-byte headers
    assert pack(5) == b"\x05"
    assert pack(-1) == b"\xff"
    assert pack("hi") == b"\xa2hi"
    assert pack([1]) == b"\x91\x01"
    assert pack({}) == b"\x80"
    assert pack(200)[0] == 0xCC  # uint8, not uint16
    assert pack(2**63 - 1)[0] == 0xD3 or pack(2**63 - 1)[0] == 0xCF


def test_msgpack_errors():
    with pytest.raises(MsgpackError):
        unpack_from(b"\xc1")  # reserved byte
    with pytest.raises(MsgpackError):
        unpack_from(b"\xcd\x01")  # truncated uint16
    with pytest.raises(MsgpackError):
        unpack_from(b"\xa5ab")  # truncated fixstr
    with pytest.raises(MsgpackError):
        pack(2**64)  # out of range
    with pytest.raises(MsgpackError):
        pack(object())


def test_msgpack_property_roundtrip():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-2**63, max_value=2**64 - 1),
        st.floats(allow_nan=False), st.text(max_size=40),
        st.binary(max_size=40))
    values = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=6),
            st.dictionaries(st.text(max_size=8), inner, max_size=6)),
        max_leaves=25)

    @settings(max_examples=200, deadline=None)
    @given(values)
    def check(v):
        assert unpack_all(pack(v)) == [v]

    check()


def test_read_msgpack_source(spark, tmp_path):
    rows = [{"name": f"n{i}", "v": i, "f": i / 2.0, "ok": i % 2 == 0}
            for i in range(50)]
    p = tmp_path / "mp"
    p.mkdir()
    for part in range(2):
        with open(p / f"part{part}.msgpack", "wb") as fh:
            for r in rows[part::2]:
                fh.write(pack(r))
    df = read_msgpack(spark, str(p))  # inferred schema
    assert df.count() == 50
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.agg(F.sum("v")).first()[0] == sum(range(50))


# ---------------------------------------------------------------------------
# forward protocol
# ---------------------------------------------------------------------------


def _mk_df(spark, n=300):
    base = datetime.datetime(2024, 5, 1, 12, 0, 0)
    return spark.createDataFrame([
        Row(ts=base + datetime.timedelta(seconds=i, microseconds=i * 7),
            host=f"h{i % 5}", msg=f"event {i}", n=i)
        for i in range(n)
    ]).repartition(3)


@pytest.mark.parametrize("mode,compress", [
    ("forward", False), ("packed", False), ("packed", True), ("message", False),
])
def test_forward_file_roundtrip(spark, tmp_path, mode, compress):
    from tenzir_spark.sources.fluentbit import read_forward, write_forward

    df = _mk_df(spark)
    path = str(tmp_path / f"fwd_{mode}_{compress}")
    files = write_forward(df, path, tag="app.log", time_col="ts",
                          mode=mode, compress=compress)
    assert files
    back = read_forward(spark, path)  # inferred record schema
    assert back.count() == 300
    assert back.select("tag").distinct().collect() == [Row(tag="app.log")]
    # EventTime carries sub-second precision: timestamps round-trip exactly
    a = sorted((r["time"], r["host"], r["msg"], r["n"])
               for r in back.collect())
    b = sorted((r["ts"], r["host"], r["msg"], r["n"]) for r in df.collect())
    assert a == b


def test_forward_mixed_modes_one_stream(spark, tmp_path):
    """in_forward detects the mode per frame from the second element."""
    from tenzir_spark.sources.fluentbit import (
        decode_forward,
        encode_forward_frame,
    )

    ns = 1_700_000_000 * 1_000_000_000 + 123
    blob = (
        encode_forward_frame("t1", [(ns, {"a": 1})], mode="forward")
        + encode_forward_frame("t2", [(ns + 1, {"a": 2})], mode="packed")
        + encode_forward_frame("t3", [(ns + 2, {"a": 3})], mode="packed",
                               compress=True)
        + encode_forward_frame("t4", [(ns + 3, {"a": 4})], mode="message")
    )
    evs = decode_forward(blob)
    assert [(t, r["a"]) for t, _, r in evs] == [
        ("t1", 1), ("t2", 2), ("t3", 3), ("t4", 4)]
    assert [x[1] for x in evs] == [ns, ns + 1, ns + 2, ns + 3]


def test_forward_plain_int_time():
    from tenzir_spark.sources.fluentbit import decode_forward

    frame = pack(["tag", [[1700000000, {"x": 1}]]])
    [(tag, t_ns, rec)] = decode_forward(frame)
    assert tag == "tag" and t_ns == 1700000000 * 10**9 and rec == {"x": 1}


def test_pipeline_text_msgpack_and_forward(spark, tmp_path):
    """`to <path> write msgpack|fluentbit` and `from <path> read …`
    compose with operator stages through the TQL front door."""
    from tenzir_spark.plans.pipeline import run_tql_source

    df = _mk_df(spark, 100).drop("ts")
    mp = str(tmp_path / "out_mp")
    run_tql_source(spark, f"to {mp} write msgpack", source_df=df)
    back = run_tql_source(
        spark, f"from {mp} read msgpack | where n >= 50 | select host, n")
    assert back.count() == 50

    fw = str(tmp_path / "out_fwd")
    run_tql_source(spark, f"to {fw} write fluentbit", source_df=df)
    back2 = run_tql_source(spark, f"from {fw} read fluentbit")
    assert back2.count() == 100 and "tag" in back2.columns


def test_forward_listen_with_chunk_ack(spark):
    import socket

    from tenzir_spark.sources.fluentbit import (
        encode_forward_frame,
        forward_listen,
    )

    got_port = []
    evt = threading.Event()

    def ready(p):
        got_port.append(p)
        evt.set()

    acks = []

    def client():
        evt.wait(10)
        s = socket.create_connection(("127.0.0.1", got_port[0]), timeout=10)
        ns = 1_650_000_000_000_000_000
        # chunked Forward frame: listener must respond {"ack": chunk}
        ents = [[Ext(0, (ns // 10**9).to_bytes(4, "big")
                     + (ns % 10**9).to_bytes(4, "big")), {"k": i}]
                for i in range(10)]
        s.sendall(pack(["svc", ents, {"size": 10, "chunk": "c-1"}]))
        acks.append(s.recv(4096))
        s.sendall(encode_forward_frame("svc", [(ns, {"k": 99})]))
        s.shutdown(socket.SHUT_WR)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    df = forward_listen(spark, max_events=11, timeout_sec=20, ready=ready)
    t.join(15)
    assert df.count() == 11
    assert df.agg(F.sum("k")).first()[0] == sum(range(10)) + 99
    [(ack,)] = [unpack_all(a) for a in acks if a] or [(None,)]
    assert ack == {"ack": "c-1"}
