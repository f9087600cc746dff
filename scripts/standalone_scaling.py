"""N vs 4N EXECUTORS on a real (single-host) Spark standalone cluster.

Unlike local[N] (one JVM, threads share a heap), this starts a standalone
master + separate worker JVMs, each hosting one 4-core/4g executor — the
actual multi-executor topology `spark-submit` targets. The driver connects
in client mode and runs the identical CDC replay at 1 worker (N=4 cores)
and 4 workers (4N=16 cores).

Requires /opt/spark (same 4.1.2 as the pip pyspark). All data + shuffle on
tmpfs. Usage:

    python scripts/standalone_scaling.py [--changes /dev/shm/chg_heavy16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SPARK_HOME = "/opt/spark"
MASTER = "spark://127.0.0.1:7077"


def _env(n_workers: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_HOME=SPARK_HOME,
        SPARK_LOCAL_DIRS="/dev/shm/sa_local",
        SPARK_LOG_DIR="/tmp/spark-logs",
        SPARK_WORKER_INSTANCES=str(n_workers),
        PYSPARK_PYTHON=sys.executable,
    )
    return env


def start_cluster(n_workers: int) -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh", "-h", "127.0.0.1", "-p", "7077"],
                   env=_env(n_workers), capture_output=True)
    time.sleep(3)
    subprocess.run([f"{SPARK_HOME}/sbin/start-worker.sh", MASTER, "-c", "4", "-m", "6g"],
                   env=_env(n_workers), capture_output=True)
    time.sleep(4)


def stop_cluster(n_workers: int) -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=_env(n_workers), capture_output=True)
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=_env(n_workers), capture_output=True)
    time.sleep(2)


def run_ingest(n_workers: int, changes: str) -> dict:
    from tenzir_spark.cdc.runner import IngestRunner
    from tenzir_spark.session import get_spark

    total_cores = 4 * n_workers
    wh = f"/dev/shm/sa_wh_{n_workers}"
    shutil.rmtree(wh, ignore_errors=True)
    spark = get_spark(
        f"sa_scaling_{n_workers}w", cores=total_cores, master=MASTER,
        driver_memory="8g",
        extra_conf={
            "spark.executor.cores": "4",
            "spark.executor.memory": "4g",
            "spark.local.dir": "/dev/shm/sa_local_driver",
        },
    )
    runner = IngestRunner(spark, wh, n_buckets=64,
                          async_compact=os.environ.get("SA_ASYNC", "") == "1",
                          collapse_mode=os.environ.get("SA_COLLAPSE", "maxby"),
                          stats_mode=os.environ.get("SA_STATS", "full"))
    stats = runner.run(changes)
    final_rows = runner.final_state().count()
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    steady = stats["batch_stats"][1:]
    ev = sum(b["events_in"] for b in steady)
    sec = sum(b["wall_ms"] for b in steady) / 1000
    return {
        "workers": n_workers,
        "executor_cores": 4,
        "total_cores": total_cores,
        "events_in": stats["events_in"],
        "wall_sec": round(stats["wall_sec"], 2),
        "events_per_sec": round(stats["events_in"] / stats["wall_sec"], 1),
        "steady_events_per_sec": round(ev / sec, 1) if sec else None,
        "final_rows": final_rows,
        "batch_walls_ms": [b["wall_ms"] for b in stats["batch_stats"]],
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--changes", default="/dev/shm/chg_heavy16")
    p.add_argument("--workers", default="1,4")
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.changes, "manifest.json")):
        from tenzir_spark.cdc.changegen import generate_changes

        print(f"generating input at {args.changes} ...", file=sys.stderr)
        generate_changes(args.changes, n_events=16_000_000, n_docs=1_600_000,
                         n_parts=32, n_batches=16, seed=42, token_len=(64, 256))

    results = {}
    for n in [int(x) for x in args.workers.split(",")]:
        stop_cluster(n)
        start_cluster(n)
        try:
            results[n] = run_ingest(n, args.changes)
            print(json.dumps(results[n]), flush=True)
        finally:
            stop_cluster(n)
    ws = sorted(results)
    if len(ws) == 2 and results[ws[0]].get("steady_events_per_sec"):
        n, m = ws
        ratio = m / n
        for kind in ("events_per_sec", "steady_events_per_sec"):
            eff = (results[m][kind] / results[n][kind]) / ratio
            print(json.dumps({
                "metric": f"executor_scaling_efficiency_{kind}",
                "n_executors": n, "x4_executors": m, "efficiency": round(eff, 3),
            }), flush=True)
    with open(os.path.join(ROOT, "standalone_scaling.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
