"""MaxMind DB (.mmdb) reader — pure Python over the PUBLIC MaxMind DB
file format spec v2.0 (https://maxmind.github.io/MaxMind-DB/), no
libmaxminddb dependency.

Reference parity: the geoip context plugin
(/root/reference/plugins/geoip) resolves IPs against MaxMind range
databases via libmaxminddb. The Spark-first restatement avoids a
per-row library call entirely:

1. the DB's binary search tree is ENUMERATED once driver-side into a
   (network_lo, network_hi, payload...) interval table — an .mmdb is a
   prefix tree over the address space, so the enumeration is exact and
   linear in the number of networks;
2. lookups then ride :func:`tenzir_spark.operators.enrich.enrich_range`
   — the bucket-expanded broadcast EQUI-join that is already
   plan-audited (no BroadcastNestedLoopJoin) — instead of a per-row
   UDF tree walk. At 10^9 events this is the only shape that scales.

Supports record sizes 24/28/32, IPv4 and IPv6 trees (IPv4 addresses are
resolved through the v4-in-v6 subtree per spec), and the full data-type
encoding (pointers, utf8, double/float, bytes, uint16/32/64/128, int32,
map, array, boolean). Data cells are flattened with dotted keys
("country.iso_code") like the engine's record-flattening convention.
"""

from __future__ import annotations

import struct

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
DATA_SECTION_SEPARATOR = 16


class MmdbError(ValueError):
    pass


class _Decoder:
    """MaxMind data-section decoder (spec §'Data Section')."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # start of the data section in buf

    def decode(self, offset: int):
        """Decode the value at data-section offset; returns (value, next)."""
        pos = self.base + offset
        ctrl = self.buf[pos]
        pos += 1
        dtype = ctrl >> 5
        if dtype == 0:  # extended type
            dtype = self.buf[pos] + 7
            pos += 1
        size = ctrl & 0x1F
        if dtype == 1:  # pointer: size bits encode pointer width
            psize = ((ctrl >> 3) & 0x3) + 1
            raw = bytes([ctrl & 0x7]) + self.buf[pos:pos + psize] \
                if psize < 4 else self.buf[pos:pos + psize]
            pos += psize
            val = int.from_bytes(raw, "big")
            val += (0, 2048, 526336, 0)[psize - 1]
            target, _ = self.decode(val)
            return target, pos - self.base
        if size == 29:
            size = 29 + self.buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.buf[pos:pos + 2], "big")
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.buf[pos:pos + 3], "big")
            pos += 3

        if dtype == 2:  # utf8
            return (self.buf[pos:pos + size].decode("utf-8"),
                    pos + size - self.base)
        if dtype == 3:  # double
            return (struct.unpack(">d", self.buf[pos:pos + 8])[0],
                    pos + 8 - self.base)
        if dtype == 4:  # bytes
            return self.buf[pos:pos + size], pos + size - self.base
        if dtype in (5, 6, 9, 10):  # uint16/32/64/128
            return (int.from_bytes(self.buf[pos:pos + size], "big"),
                    pos + size - self.base)
        if dtype == 7:  # map
            out = {}
            off = pos - self.base
            for _ in range(size):
                k, off = self.decode(off)
                v, off = self.decode(off)
                out[k] = v
            return out, off
        if dtype == 8:  # int32
            return (int.from_bytes(self.buf[pos:pos + size], "big",
                                   signed=True), pos + size - self.base)
        if dtype == 11:  # array
            out = []
            off = pos - self.base
            for _ in range(size):
                v, off = self.decode(off)
                out.append(v)
            return out, off
        if dtype == 14:  # boolean: size IS the value
            return bool(size), pos - self.base
        if dtype == 15:  # float
            return (struct.unpack(">f", self.buf[pos:pos + 4])[0],
                    pos + 4 - self.base)
        raise MmdbError(f"unsupported mmdb data type {dtype}")


class MmdbReader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        idx = self.buf.rfind(METADATA_MARKER)
        if idx < 0:
            raise MmdbError(f"{path}: no MaxMind metadata marker")
        meta_dec = _Decoder(self.buf, idx + len(METADATA_MARKER))
        self.metadata, _ = meta_dec.decode(0)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata.get("ip_version", 6))
        if self.record_size not in (24, 28, 32):
            raise MmdbError(f"bad record size {self.record_size}")
        self.tree_size = (self.record_size * 2 // 8) * self.node_count
        self.data = _Decoder(
            self.buf, self.tree_size + DATA_SECTION_SEPARATOR)

    # ------------------------------------------------------------ tree
    def _record(self, node: int, side: int) -> int:
        rs = self.record_size
        base = node * (rs * 2 // 8)
        if rs == 24:
            o = base + side * 3
            return int.from_bytes(self.buf[o:o + 3], "big")
        if rs == 32:
            o = base + side * 4
            return int.from_bytes(self.buf[o:o + 4], "big")
        # 28: 7 bytes per node, middle byte holds the high nibbles
        mid = self.buf[base + 3]
        if side == 0:
            return ((mid >> 4) << 24) | int.from_bytes(
                self.buf[base:base + 3], "big")
        return ((mid & 0x0F) << 24) | int.from_bytes(
            self.buf[base + 4:base + 7], "big")

    def _data_at(self, record: int):
        off = record - self.node_count - DATA_SECTION_SEPARATOR
        val, _ = self.data.decode(off)
        return val

    def lookup(self, ip: str):
        """Point lookup (tests / small probes; bulk joins should use
        :func:`networks` + enrich_range)."""
        import ipaddress

        addr = ipaddress.ip_address(ip)
        bits = 128 if self.ip_version == 6 else 32
        val = int(addr)
        if addr.version == 4 and self.ip_version == 6:
            val = int(addr)  # v4 maps into ::/96 per spec
        node = 0
        for i in range(bits - 1, -1, -1):
            node = self._record(node, (val >> i) & 1)
            if node == self.node_count:
                return None  # spec: node_count value means "no data"
            if node > self.node_count:
                return self._data_at(node)
        return None

    def networks(self, flatten: bool = True) -> list[tuple[int, int, dict]]:
        """Enumerate every network in the tree as (lo, hi, payload) over
        the integer address space — the interval table enrich_range
        consumes. IPv4-in-IPv6 trees yield IPv4 integer ranges for the
        ::/96-mapped subtree."""
        bits = 128 if self.ip_version == 6 else 32
        out: list[tuple[int, int, dict]] = []
        seen_data: dict[int, dict] = {}

        stack = [(0, 0, 0)]  # node, prefix value, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (0, 1):
                rec = self._record(node, side)
                child_prefix = (prefix << 1) | side
                if rec == self.node_count:
                    continue  # no data
                if rec < self.node_count:
                    if depth + 1 < bits:
                        stack.append((rec, child_prefix, depth + 1))
                    continue
                if rec not in seen_data:
                    val = self._data_at(rec)
                    seen_data[rec] = _flatten(val) if flatten else val
                span = bits - depth - 1
                lo = child_prefix << span
                hi = lo + (1 << span) - 1
                out.append((lo, hi, seen_data[rec]))
        if self.ip_version == 6:
            # keep only the v4-mapped subtree as 32-bit ranges when it
            # exists; full-v6 rows keep their 128-bit integers
            v4 = []
            for lo, hi, d in out:
                if 0 <= lo and hi < (1 << 32):
                    v4.append((lo, hi, d))
                elif lo >= (1 << 32):
                    v4.append((lo, hi, d))
            out = v4
        return sorted(out)


def _flatten(val, prefix: str = "") -> dict:
    if not isinstance(val, dict):
        return {prefix or "value": val}
    out = {}
    for k, v in val.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def geoip_table(spark, path: str, fields: list[str] | None = None):
    """Load an .mmdb as a Spark interval DataFrame (lo, hi, <fields>) for
    :func:`tenzir_spark.operators.enrich.enrich_range` — driver parses
    the tree once, the lookup join is the audited broadcast equi-join."""
    r = MmdbReader(path)
    nets = r.networks()
    if fields is None:
        keys: set[str] = set()
        for _lo, _hi, d in nets:
            keys.update(d)
        fields = sorted(keys)
    rows = [
        (lo, hi, *[None if d.get(f) is None else str(d.get(f)) for f in fields])
        for lo, hi, d in nets
    ]
    # dotted payload keys become underscored COLUMN names (a literal dot
    # in a column name fights every downstream `col("a.b")` reference)
    ddl = "lo long, hi long, " + ", ".join(
        f"{f.replace('.', '_')} string" for f in fields)
    return spark.createDataFrame(rows, ddl)


def ip_to_int_col(col):
    """Dotted-quad string column → integer address (for the probe side of
    the enrich_range join). Pure Catalyst arithmetic."""
    from pyspark.sql import functions as F

    p = F.split(col, r"\.")
    return (p[0].cast("long") * 16777216 + p[1].cast("long") * 65536
            + p[2].cast("long") * 256 + p[3].cast("long"))
