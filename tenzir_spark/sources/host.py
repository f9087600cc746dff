"""Host-introspection sources: ``files`` / ``processes`` / ``sockets``
(reference: libtenzir/builtins/operators/{files,processes,sockets}.cpp —
node-local inventory sources; files.md/processes.md/sockets.md).

These are DRIVER-LOCAL by nature in the reference too (they describe the
node the pipeline runs on); here they collect the inventory driver-side
with stdlib/procfs and hand Spark a DataFrame, so the downstream
pipeline (``processes | top name | head 5`` — processes.md's own
example) distributes normally. Stdlib-only: ``os.scandir``/``stat`` for
files, ``/proc/<pid>`` for processes, ``/proc/net/tcp{,6}``/``udp`` for
sockets (Linux procfs; non-Linux hosts raise a clear error rather than
fake data)."""

from __future__ import annotations

import os
import stat as stat_mod

from pyspark.sql import DataFrame, SparkSession

FILES_SCHEMA = (
    "path string, name string, type string, size long, mode string, "
    "uid long, gid long, mtime double, depth int"
)


def _ftype(mode: int) -> str:
    if stat_mod.S_ISREG(mode):
        return "regular"
    if stat_mod.S_ISDIR(mode):
        return "directory"
    if stat_mod.S_ISLNK(mode):
        return "symlink"
    if stat_mod.S_ISFIFO(mode):
        return "fifo"
    if stat_mod.S_ISSOCK(mode):
        return "socket"
    if stat_mod.S_ISBLK(mode) or stat_mod.S_ISCHR(mode):
        return "device"
    return "unknown"


def files(spark: SparkSession, root: str, recurse: bool = True,
          follow_symlinks: bool = False, max_depth: int = 32) -> DataFrame:
    """``files <dir> [--recurse-directories]`` (files.md): one event per
    file with type/size/permissions/owner metadata."""
    rows = []

    def walk(d: str, depth: int):
        try:
            it = os.scandir(d)
        except OSError:
            return
        with it:
            for e in it:
                try:
                    st = e.stat(follow_symlinks=follow_symlinks)
                except OSError:
                    continue
                rows.append((
                    e.path, e.name, _ftype(st.st_mode), int(st.st_size),
                    stat_mod.filemode(st.st_mode), int(st.st_uid),
                    int(st.st_gid), float(st.st_mtime), depth,
                ))
                if recurse and depth < max_depth and e.is_dir(
                        follow_symlinks=follow_symlinks):
                    walk(e.path, depth + 1)

    walk(root, 0)
    return spark.createDataFrame(rows, FILES_SCHEMA)


PROCESSES_SCHEMA = (
    "pid long, ppid long, name string, state string, uid long, "
    "vsize long, rss_pages long, utime_ticks long, stime_ticks long, "
    "startup_ticks long, command string"
)


def processes(spark: SparkSession) -> DataFrame:
    """``processes`` (processes.md): one event per running process."""
    if not os.path.isdir("/proc"):
        raise OSError("processes source needs Linux procfs")
    rows = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            # comm may contain spaces/parens: split around the LAST ')'
            lpar, rpar = raw.index("("), raw.rindex(")")
            name = raw[lpar + 1:rpar]
            fields = raw[rpar + 2:].split()
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(
                    "utf-8", "replace").strip()
            st = os.stat(f"/proc/{pid}")
            rows.append((
                int(pid), int(fields[1]), name, fields[0], int(st.st_uid),
                int(fields[20]), int(fields[21]), int(fields[11]),
                int(fields[12]), int(fields[19]), cmd,
            ))
        except (OSError, ValueError, IndexError):
            continue  # process vanished mid-read: normal
    return spark.createDataFrame(rows, PROCESSES_SCHEMA)


SOCKETS_SCHEMA = (
    "protocol string, local_addr string, local_port int, "
    "remote_addr string, remote_port int, state string, uid long, inode long"
)

_TCP_STATES = {
    1: "ESTABLISHED", 2: "SYN_SENT", 3: "SYN_RECV", 4: "FIN_WAIT1",
    5: "FIN_WAIT2", 6: "TIME_WAIT", 7: "CLOSE", 8: "CLOSE_WAIT",
    9: "LAST_ACK", 10: "LISTEN", 11: "CLOSING",
}


def _v4(hexaddr: str) -> str:
    b = bytes.fromhex(hexaddr)[::-1]  # little-endian in procfs
    return ".".join(str(x) for x in b)


def _v6(hexaddr: str) -> str:
    raw = bytes.fromhex(hexaddr)
    # procfs emits 4 little-endian 32-bit groups
    b = b"".join(raw[i:i + 4][::-1] for i in range(0, 16, 4))
    import ipaddress

    return str(ipaddress.IPv6Address(b))


def sockets(spark: SparkSession) -> DataFrame:
    """``sockets`` (sockets.md): one event per open socket."""
    if not os.path.isdir("/proc/net"):
        raise OSError("sockets source needs Linux procfs")
    rows = []
    for proto, path, v6 in (
        ("tcp", "/proc/net/tcp", False), ("tcp6", "/proc/net/tcp6", True),
        ("udp", "/proc/net/udp", False), ("udp6", "/proc/net/udp6", True),
    ):
        try:
            with open(path) as f:
                lines = f.read().splitlines()[1:]
        except OSError:
            continue
        for ln in lines:
            p = ln.split()
            if len(p) < 10:
                continue
            try:
                laddr, lport = p[1].rsplit(":", 1)
                raddr, rport = p[2].rsplit(":", 1)
                conv = _v6 if v6 else _v4
                rows.append((
                    proto, conv(laddr), int(lport, 16), conv(raddr),
                    int(rport, 16),
                    _TCP_STATES.get(int(p[3], 16), f"0x{p[3]}"),
                    int(p[7]), int(p[9]),
                ))
            except (ValueError, IndexError):
                continue
    return spark.createDataFrame(rows, SOCKETS_SCHEMA)


NICS_SCHEMA = "name string, mac string, state string, mtu int, is_up boolean"


def nics(spark: SparkSession) -> DataFrame:
    """``nics`` (nics.md): one event per network interface, from
    /sys/class/net (no capture lib needed for the inventory listing; LIVE
    capture on an interface remains out of scope without libpcap)."""
    root = "/sys/class/net"
    if not os.path.isdir(root):
        raise OSError("nics source needs Linux sysfs")

    def rd(dev: str, attr: str) -> str:
        try:
            with open(os.path.join(root, dev, attr)) as f:
                return f.read().strip()
        except OSError:
            return ""

    rows = []
    for dev in sorted(os.listdir(root)):
        state = rd(dev, "operstate")
        rows.append((
            dev, rd(dev, "address"), state,
            int(rd(dev, "mtu") or 0), state == "up" or dev == "lo",
        ))
    return spark.createDataFrame(rows, NICS_SCHEMA)


def tcp_listen(spark: SparkSession, host: str = "127.0.0.1", port: int = 0,
               max_events: int | None = None, timeout_sec: float = 30.0,
               ready=None) -> DataFrame:
    """``from tcp://host:port`` listener (reference: tcp connector,
    tcp.md — bind a socket, read line-framed bytes from connecting
    clients). Batch flavor: accept connections until ``max_events`` lines
    arrive or ``timeout_sec`` lapses, then hand the lines to Spark (one
    string column, parse downstream with read/parse operators).
    ``ready(port)`` is called once bound — lets a caller/test connect
    without racing the bind. For a continuous tail use Structured
    Streaming's socket source instead::

        spark.readStream.format("socket")
             .option("host", h).option("port", p).load()

    which yields the same one-string-column shape for foreachBatch."""
    import socket

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(8)
    srv.settimeout(timeout_sec)
    if ready is not None:
        ready(srv.getsockname()[1])
    lines: list[str] = []
    import time as _time

    deadline = _time.monotonic() + timeout_sec
    try:
        while (max_events is None or len(lines) < max_events) \
                and _time.monotonic() < deadline:
            try:
                conn, _addr = srv.accept()
            except socket.timeout:
                break
            with conn, conn.makefile("rb") as f:
                for raw in f:
                    lines.append(raw.decode("utf-8", "replace").rstrip("\r\n"))
                    if max_events is not None and len(lines) >= max_events:
                        break
    finally:
        srv.close()
    return spark.createDataFrame([(ln,) for ln in lines], "line string")


def udp_listen(spark: SparkSession, host: str = "127.0.0.1", port: int = 0,
               max_events: int | None = None, timeout_sec: float = 30.0,
               ready=None, insert_newlines: bool = False) -> DataFrame:
    """``from udp://host:port`` listener (reference: udp connector,
    libtenzir/builtins/connectors/udp.cpp + udp.md — bind a datagram
    socket in listening mode, read blocks of bytes; ``-n`` treats each
    datagram as newline-framed). Batch flavor mirroring ``tcp_listen``:
    receive datagrams until ``max_events`` rows arrive or ``timeout_sec``
    lapses. One row per datagram, or per line within each datagram when
    ``insert_newlines`` (the reference's ``--insert-newlines``); parse
    downstream with read/parse operators. ``ready(port)`` fires once
    bound so callers/tests can send without racing the bind."""
    import socket
    import time as _time

    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.settimeout(min(timeout_sec, 0.5))
    if ready is not None:
        ready(srv.getsockname()[1])
    rows: list[str] = []
    deadline = _time.monotonic() + timeout_sec
    try:
        while (max_events is None or len(rows) < max_events) \
                and _time.monotonic() < deadline:
            try:
                blob, _addr = srv.recvfrom(65535)
            except socket.timeout:
                continue
            text = blob.decode("utf-8", "replace")
            if insert_newlines:
                rows.extend(ln.rstrip("\r")
                            for ln in text.split("\n") if ln != "")
            else:
                rows.append(text.rstrip("\r\n"))
    finally:
        srv.close()
    if max_events is not None:
        rows = rows[:max_events]
    return spark.createDataFrame([(ln,) for ln in rows], "line string")
