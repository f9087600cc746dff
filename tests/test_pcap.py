"""PCAP reading + decapsulation (sources/pcap.py): classic-pcap record
cutting (both endians, usec/nsec magic, truncation tolerance, pcapng
rejection) and vectorized Ethernet/VLAN/IPv4/TCP-UDP header extraction —
parity with formats/pcap.cpp + operators/decapsulate.cpp."""

import struct

import pytest

from tenzir_spark.sources.pcap import decapsulate, read_pcap


def _eth(dst, src, etype, payload):
    return bytes(dst) + bytes(src) + struct.pack(">H", etype) + payload


def _ipv4(src, dst, proto, payload, ihl=5):
    ver_ihl = (4 << 4) | ihl
    hdr = struct.pack(">BBHHHBBH4s4s", ver_ihl, 0, 20 + len(payload), 1, 0,
                      64, proto, 0, bytes(src), bytes(dst))
    return hdr + payload


def _udp(sport, dport, data=b"x"):
    return struct.pack(">HHHH", sport, dport, 8 + len(data), 0) + data


def _tcp(sport, dport):
    return struct.pack(">HHIIBBHHH", sport, dport, 0, 0, 5 << 4, 2, 0, 0, 0)


def _pcap(packets, magic=0xA1B2C3D4, endian="<", linktype=1):
    out = struct.pack(endian + "IHHiIII", magic, 2, 4, 0, 0, 65535, linktype)
    for i, p in enumerate(packets):
        out += struct.pack(endian + "IIII", 1700000000 + i, 250000, len(p), len(p))
        out += p
    return out


MAC_A = [0xAA, 0xBB, 0xCC, 0x00, 0x00, 0x01]
MAC_B = [0xDE, 0xAD, 0xBE, 0xEF, 0x00, 0x02]


def _mk_packets():
    udp_pkt = _eth(MAC_B, MAC_A, 0x0800,
                   _ipv4([10, 0, 0, 1], [10, 0, 0, 2], 17, _udp(5353, 53)))
    # 802.1Q tagged TCP packet (vlan id 42)
    vlan_inner = struct.pack(">HH", 42, 0x0800) + _ipv4(
        [192, 168, 1, 5], [8, 8, 8, 8], 6, _tcp(44123, 443))
    tcp_pkt = _eth(MAC_A, MAC_B, 0x8100, vlan_inner)
    arp_pkt = _eth(MAC_B, MAC_A, 0x0806, b"\x00" * 28)
    return [udp_pkt, tcp_pkt, arp_pkt]


@pytest.mark.parametrize("endian,magic", [("<", 0xA1B2C3D4), (">", 0xA1B2C3D4),
                                          ("<", 0xA1B23C4D)])
def test_read_and_decapsulate(spark, tmp_path, endian, magic):
    p = tmp_path / "cap.pcap"
    p.write_bytes(_pcap(_mk_packets(), magic=magic, endian=endian))
    df = read_pcap(spark, str(p))
    rows = {r["packet_id"]: r for r in decapsulate(df).collect()}
    assert len(rows) == 3

    udp = rows[0]
    frac = 0.25 if magic == 0xA1B2C3D4 else 250000 / 1e9
    assert udp["timestamp"] == pytest.approx(1700000000 + frac)
    assert udp["eth_src"] == "aa:bb:cc:00:00:01"
    assert udp["eth_dst"] == "de:ad:be:ef:00:02"
    assert udp["ether_type"] == 0x0800 and udp["vlan_id"] is None
    assert (udp["ip_src"], udp["ip_dst"]) == ("10.0.0.1", "10.0.0.2")
    assert (udp["ip_proto"], udp["src_port"], udp["dst_port"]) == (17, 5353, 53)

    tcp = rows[1]
    assert tcp["vlan_id"] == 42 and tcp["ether_type"] == 0x0800
    assert (tcp["ip_src"], tcp["ip_dst"]) == ("192.168.1.5", "8.8.8.8")
    assert (tcp["ip_proto"], tcp["src_port"], tcp["dst_port"]) == (6, 44123, 443)

    arp = rows[2]
    assert arp["ether_type"] == 0x0806
    assert arp["ip_src"] is None and arp["src_port"] is None
    assert arp["eth_src"] == "aa:bb:cc:00:00:01"  # L2 still extracted


def test_pcap_in_pipeline_text(spark, tmp_path):
    """`from <file.pcap> | decapsulate | where … | select` as one textual
    pipeline (extension-inferred pcap format)."""
    from tenzir_spark.plans.pipeline import run_tql_source

    p = tmp_path / "cap.pcap"
    p.write_bytes(_pcap(_mk_packets()))
    out = run_tql_source(
        spark,
        f"from {p} | decapsulate"
        ' | where dst_port == 53'
        " | select packet_id, ip_src, ip_dst, src_port, dst_port",
    ).collect()
    assert len(out) == 1
    assert out[0]["ip_src"] == "10.0.0.1" and out[0]["src_port"] == 5353


def test_truncated_tail_and_bad_magic(spark, tmp_path):
    blob = _pcap(_mk_packets())
    p = tmp_path / "trunc.pcap"
    p.write_bytes(blob[:-5])  # cut into the last record's payload
    assert read_pcap(spark, str(p)).count() == 2  # clean stop, no crash

    bad = tmp_path / "bad.pcap"
    bad.write_bytes(b"\x00" * 48)
    with pytest.raises(Exception, match="invalid PCAP magic"):
        read_pcap(spark, str(bad)).count()

    ng = tmp_path / "ng.pcapng"
    ng.write_bytes(struct.pack(">I", 0x0A0D0D0A) + b"\x00" * 44)
    with pytest.raises(Exception, match="pcapng"):
        read_pcap(spark, str(ng)).count()
