"""MaxMind DB reader (sources/mmdb.py): the test WRITES a minimal valid
.mmdb per the public spec (search tree + data section + metadata), then
checks point lookups, tree→interval enumeration, and the geoip
enrichment join built on enrich_range."""

import ipaddress
import struct

import pytest

from tenzir_spark.sources.mmdb import (
    MmdbError,
    MmdbReader,
    geoip_table,
    ip_to_int_col,
)

# ----------------------------------------------------------------- writer


def enc_str(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 29
    return bytes([(2 << 5) | len(b)]) + b


def enc_uint(n: int, dtype: int = 6) -> bytes:
    b = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    if dtype <= 7:
        return bytes([(dtype << 5) | len(b)]) + b
    return bytes([len(b), dtype - 7]) + b  # extended (uint64=9)


def enc_map(items: dict[str, bytes]) -> bytes:
    assert len(items) < 29
    out = bytes([(7 << 5) | len(items)])
    for k, v in items.items():
        out += enc_str(k) + v
    return out


def enc_arr(items: list[bytes]) -> bytes:
    out = bytes([len(items) & 0x1F, 11 - 7])
    for v in items:
        out += v
    return out


class _N:
    __slots__ = ("left", "right")

    def __init__(self):
        self.left = None
        self.right = None


def enc_ptr(offset: int) -> bytes:
    """Data-section pointer (type 1). Sizes per spec: <2048 → 1-byte
    form, else the 2-byte form (+2048 bias)."""
    if offset < 2048:
        return bytes([(1 << 5) | (offset >> 8), offset & 0xFF])
    v = offset - 2048
    return bytes([(1 << 5) | (1 << 3) | (v >> 16),
                  (v >> 8) & 0xFF, v & 0xFF])


def write_mmdb(path, networks, record_size=24, ip_version=4):
    """networks: [(cidr, payload_bytes_key)]; payloads: {key: bytes}."""
    root = _N()
    data_blobs: dict[str, bytes] = {}
    for cidr, key, blob in networks:
        data_blobs[key] = blob
        net = ipaddress.ip_network(cidr)
        bits_total = 32 if ip_version == 4 else 128
        val = int(net.network_address)
        node = root
        for i in range(bits_total - 1, bits_total - net.prefixlen, -1):
            side = (val >> i) & 1
            nxt = node.right if side else node.left
            if not isinstance(nxt, _N):
                nxt = _N()
                if side:
                    node.right = nxt
                else:
                    node.left = nxt
            node = nxt
        side = (val >> (bits_total - net.prefixlen)) & 1
        if side:
            node.right = ("data", key)
        else:
            node.left = ("data", key)

    # number nodes (preorder), then lay out the data section
    order: list[_N] = []

    def collect(n):
        order.append(n)
        for c in (n.left, n.right):
            if isinstance(c, _N):
                collect(c)

    collect(root)
    node_count = len(order)
    ids = {id(n): i for i, n in enumerate(order)}
    offsets, data_section = {}, b""
    for key, blob in data_blobs.items():
        offsets[key] = len(data_section)
        data_section += blob

    def record(c) -> int:
        if c is None:
            return node_count
        if isinstance(c, _N):
            return ids[id(c)]
        return node_count + 16 + offsets[c[1]]

    tree = b""
    for n in order:
        left, right = record(n.left), record(n.right)
        if record_size == 24:
            tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
        elif record_size == 32:
            tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")
        elif record_size == 28:
            mid = ((left >> 24) << 4) | (right >> 24)
            tree += ((left & 0xFFFFFF).to_bytes(3, "big") + bytes([mid])
                     + (right & 0xFFFFFF).to_bytes(3, "big"))
        else:
            raise AssertionError(record_size)

    meta = enc_map({
        "binary_format_major_version": enc_uint(2, 5),
        "binary_format_minor_version": enc_uint(0, 5),
        "build_epoch": enc_uint(1700000000, 9),
        "database_type": enc_str("Test-City"),
        "description": enc_map({"en": enc_str("unit test db")}),
        "ip_version": enc_uint(ip_version, 5),
        "languages": enc_arr([enc_str("en")]),
        "node_count": enc_uint(node_count, 6),
        "record_size": enc_uint(record_size, 5),
    })
    blob = (tree + b"\x00" * 16 + data_section
            + b"\xab\xcd\xefMaxMind.com" + meta)
    with open(path, "wb") as f:
        f.write(blob)
    return node_count


PAYLOAD_A = enc_map({
    "country": enc_map({"iso_code": enc_str("AA")}),
    "asn": enc_uint(100, 6),
})
PAYLOAD_B = enc_map({
    "country": enc_map({"iso_code": enc_str("BB")}),
    "asn": enc_uint(0, 6),  # zero-length uint encoding
})


@pytest.fixture()
def db(tmp_path):
    p = tmp_path / "test.mmdb"
    write_mmdb(p, [
        ("10.0.0.0/8", "a", PAYLOAD_A),
        ("192.168.1.0/24", "b", PAYLOAD_B),
    ])
    return str(p)


def test_metadata_and_point_lookup(db):
    r = MmdbReader(db)
    assert r.metadata["database_type"] == "Test-City"
    assert r.metadata["description"]["en"] == "unit test db"
    assert r.ip_version == 4 and r.record_size == 24

    assert r.lookup("10.1.2.3") == {"country": {"iso_code": "AA"}, "asn": 100}
    assert r.lookup("192.168.1.77")["country"]["iso_code"] == "BB"
    assert r.lookup("192.168.1.77")["asn"] == 0
    assert r.lookup("8.8.8.8") is None
    assert r.lookup("192.168.2.1") is None


def test_network_enumeration(db):
    r = MmdbReader(db)
    nets = r.networks()
    assert len(nets) == 2
    lo_a, hi_a, d_a = nets[0]
    assert (lo_a, hi_a) == (int(ipaddress.ip_address("10.0.0.0")),
                            int(ipaddress.ip_address("10.255.255.255")))
    assert d_a == {"country.iso_code": "AA", "asn": 100}
    lo_b, hi_b, d_b = nets[1]
    assert hi_b - lo_b == 255 and d_b["country.iso_code"] == "BB"


def test_geoip_enrich_join(spark, db):
    """The scale path: mmdb → interval table → enrich_range broadcast
    equi-join; per-row results match point lookups."""
    from pyspark.sql import functions as F

    from tenzir_spark.operators.enrich import enrich_range

    iv = geoip_table(spark, db)
    assert set(iv.columns) == {"lo", "hi", "asn", "country_iso_code"}

    events = spark.createDataFrame(
        [("e1", "10.9.8.7"), ("e2", "192.168.1.1"), ("e3", "1.1.1.1")],
        "id string, ip string",
    ).withColumn("ip_int", ip_to_int_col(F.col("ip")))
    out = {r["id"]: r for r in enrich_range(
        events, iv, "ip_int").collect()}
    assert out["e1"]["country_iso_code"] == "AA"
    assert out["e1"]["asn"] == "100"
    assert out["e2"]["country_iso_code"] == "BB"
    assert out["e3"]["country_iso_code"] is None


@pytest.mark.parametrize("rs", [24, 28, 32])
def test_record_sizes(tmp_path, rs):
    p = tmp_path / f"rs{rs}.mmdb"
    write_mmdb(p, [
        ("10.0.0.0/8", "a", PAYLOAD_A),
        ("192.168.1.0/24", "b", PAYLOAD_B),
    ], record_size=rs)
    r = MmdbReader(str(p))
    assert r.record_size == rs
    assert r.lookup("10.1.2.3")["country"]["iso_code"] == "AA"
    assert r.lookup("192.168.1.9")["country"]["iso_code"] == "BB"
    assert r.lookup("4.4.4.4") is None
    assert len(r.networks()) == 2


def test_pointer_decoding(tmp_path):
    """Real DBs deduplicate via data-section pointers: a payload whose
    'country' value is a POINTER into another payload must resolve."""
    # PAYLOAD_A layout: map ctrl(1) + "country"(8) => country map at +9
    country_off_in_a = 1 + 8
    payload_c = enc_map({"country": enc_ptr(country_off_in_a)})
    p = tmp_path / "ptr.mmdb"
    write_mmdb(p, [
        ("10.0.0.0/8", "a", PAYLOAD_A),       # offset 0 in data section
        ("172.16.0.0/12", "c", payload_c),
    ])
    r = MmdbReader(str(p))
    assert r.lookup("172.16.5.5") == {"country": {"iso_code": "AA"}}


def test_bad_file_rejected(tmp_path):
    p = tmp_path / "junk.mmdb"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(MmdbError, match="metadata marker"):
        MmdbReader(str(p))
