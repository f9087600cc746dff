"""Host inventory sources (sources/host.py): files/processes/sockets —
parity with files.md/processes.md/sockets.md, stdlib/procfs only."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from tenzir_spark.sources.host import files, processes, sockets

linux_only = pytest.mark.skipif(not os.path.isdir("/proc"),
                                reason="needs Linux procfs")


def test_files_source(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"\x00" * 128)
    os.mkfifo(tmp_path / "pipe")

    got = {r["name"]: r for r in files(spark, str(tmp_path)).collect()}
    assert got["a.txt"]["type"] == "regular" and got["a.txt"]["size"] == 5
    assert got["sub"]["type"] == "directory" and got["sub"]["depth"] == 0
    assert got["b.bin"]["size"] == 128 and got["b.bin"]["depth"] == 1
    assert got["pipe"]["type"] == "fifo"  # files.md's named-pipe example
    assert got["a.txt"]["mode"].startswith("-rw")

    flat = files(spark, str(tmp_path), recurse=False)
    assert {r["name"] for r in flat.collect()} == {"a.txt", "sub", "pipe"}


@linux_only
def test_processes_source(spark):
    df = processes(spark)
    rows = {r["pid"]: r for r in df.collect()}
    me = rows[os.getpid()]
    assert "python" in me["name"] or "python" in me["command"]
    assert me["ppid"] > 0 and me["state"] in list("RSDZTtXxKWPI")
    # the processes.md example composition runs on it
    top = df.groupBy("name").count().orderBy(F.desc("count")).limit(5)
    assert top.count() <= 5


@linux_only
def test_sockets_source(spark):
    import socket as pysocket

    srv = pysocket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    try:
        rows = sockets(spark).collect()
        mine = [r for r in rows
                if r["protocol"] == "tcp" and r["local_port"] == port]
        assert mine and mine[0]["state"] == "LISTEN"
        assert mine[0]["local_addr"] == "127.0.0.1"
        assert mine[0]["uid"] == os.getuid()
    finally:
        srv.close()


@linux_only
def test_nics_source(spark):
    from tenzir_spark.sources.host import nics

    rows = {r["name"]: r for r in nics(spark).collect()}
    assert "lo" in rows
    assert rows["lo"]["mtu"] >= 1500  # loopback MTU is >= 16436 typically


def test_tcp_listen_source(spark):
    """tcp_listen: line-framed events from a connecting client, composed
    with a downstream textual pipeline."""
    import socket
    import threading

    from tenzir_spark.sources.host import tcp_listen

    got_port = {}

    def client(port):
        with socket.create_connection(("127.0.0.1", port), timeout=5) as c:
            c.sendall(b"k=a n=1\nk=b n=2\nk=c n=3\n")

    def on_ready(port):
        got_port["port"] = port
        threading.Thread(target=client, args=(port,), daemon=True).start()

    df = tcp_listen(spark, port=0, max_events=3, timeout_sec=10,
                    ready=on_ready)
    assert got_port["port"] > 0
    from tenzir_spark.plans.pipeline import run_tql

    out = run_tql(df, "parse line kv | measure").first()
    assert out["events"] == 3
    rows = sorted(r["line"] for r in df.collect())
    assert rows == ["k=a n=1", "k=b n=2", "k=c n=3"]


def test_udp_listen_source(spark):
    """udp_listen: one row per datagram (and per line with
    insert_newlines), composed with a downstream textual pipeline."""
    import socket
    import threading

    from tenzir_spark.sources.host import udp_listen

    got_port = {}

    def client(port):
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        c.sendto(b"k=a n=1", ("127.0.0.1", port))
        c.sendto(b"k=b n=2\nk=c n=3\n", ("127.0.0.1", port))
        c.close()

    def on_ready(port):
        got_port["port"] = port
        threading.Thread(target=client, args=(port,), daemon=True).start()

    df = udp_listen(spark, port=0, max_events=3, timeout_sec=10,
                    ready=on_ready, insert_newlines=True)
    assert got_port["port"] > 0
    rows = sorted(r["line"] for r in df.collect())
    assert rows == ["k=a n=1", "k=b n=2", "k=c n=3"]

    from tenzir_spark.plans.pipeline import run_tql

    out = run_tql(df, "parse line kv | measure").first()
    assert out["events"] == 3
