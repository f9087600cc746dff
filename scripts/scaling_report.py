"""North-rule scaling evidence: run the identical CDC replay at two
parallelism levels (local[N] stands in for N executor cores — no real
cluster in this sandbox) on the same input and report throughput at both
plus scaling efficiency.

Methodology notes (also in BASELINE.md):
- input + warehouse + shuffle dirs live on tmpfs: in local mode all
  "executors" share ONE disk (358 MB/s here), an artifact a real cluster
  doesn't have — per-node disks scale with the node count. tmpfs isolates
  compute scaling from the sandbox's single vda.
- throughput is reported both TOTAL and STEADY-STATE (excluding the first
  batch, which carries JVM/JIT warmup — on a 10^10-event run the warmup
  share is ~0).

Usage: python scripts/scaling_report.py [--events 16000000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cores: int, args) -> dict:
    wh = f"/dev/shm/scaling_wh_{cores}"
    local = f"/dev/shm/spark_local_{cores}"
    for d in (wh, local):
        shutil.rmtree(d, ignore_errors=True)
    cmd = [
        sys.executable, os.path.join(ROOT, "jobs", "run_ingest.py"),
        "--cores", str(cores),
        "--events", str(args.events),
        "--docs", str(args.docs),
        "--batches", str(args.batches),
        "--parts", str(args.parts),
        "--changes", args.changes,
        "--warehouse", wh,
        "--local-dir", local,
        "--fresh",
    ]
    if os.environ.get("SR_ASYNC", "") == "1":
        cmd.append("--async-compact")
    out = subprocess.run(cmd, capture_output=True, text=True)
    batches = []
    for line in out.stderr.splitlines():
        if line.startswith("batch ") and " events in " in line:
            ev = int(line.split(": ")[1].split(" events")[0])
            ms = int(line.split(" events in ")[1].split("ms")[0])
            batches.append((ev, ms))
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    steady = batches[1:] if len(batches) > 1 else batches
    steady_events = sum(e for e, _ in steady)
    steady_sec = sum(m for _, m in steady) / 1000
    stats["steady_events_per_sec"] = round(steady_events / steady_sec, 1) if steady_sec else None
    stats["batch_walls_ms"] = [m for _, m in batches]
    for d in (wh, local):
        shutil.rmtree(d, ignore_errors=True)
    return stats


def box_probe() -> dict:
    """Host-state calibration in the SAME run as the scaling numbers
    (bench.py's fixed-cost probe): median wall of trivial 32-task jobs in
    a throwaway local[4] session. Good box: ~30-60 ms; the degraded host
    states documented in BASELINE.md push this to 200-1000+ ms — scaling
    efficiency measured on a degraded box is unusable (the stalls are
    host-side and do not scale with cores)."""
    import statistics
    import time

    sys.path.insert(0, ROOT)
    from tenzir_spark.session import get_spark

    spark = get_spark("scaling_box_probe", cores=4)
    spark.range(1_000_000).selectExpr("sum(id % 7) AS s").collect()
    walls = []
    for _ in range(15):
        t0 = time.monotonic()
        spark.range(32 * 1000, numPartitions=32).selectExpr("sum(id) AS s").collect()
        walls.append((time.monotonic() - t0) * 1000)
    spark.stop()
    return {"box_spark_job_ms": round(statistics.median(walls), 1),
            "box_spark_job_max_ms": round(max(walls), 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=16_000_000)
    p.add_argument("--docs", type=int, default=1_600_000)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--parts", type=int, default=32)
    p.add_argument("--changes", default="/dev/shm/chg_heavy16")
    p.add_argument("--cores", default="8,32")
    p.add_argument("--out", default="scaling_report.json",
                   help="output filename under the repo root")
    p.add_argument("--wait-healthy", type=int, default=0, metavar="SEC",
                   help="probe the box every 2 min and start measuring "
                        "only once box_spark_job_ms <= --healthy-ms, up to "
                        "SEC seconds; 0 = measure immediately. Efficiency "
                        "measured under host stalls is unusable, so this "
                        "turns the BASELINE.md re-run rule into a flag.")
    p.add_argument("--healthy-ms", type=float, default=80, metavar="MS",
                   help="box_spark_job_ms gate for --wait-healthy. The "
                        "default 80 admits borderline boxes; one measured "
                        "r4 run started at a momentary 80.0 dip on a "
                        "degraded box and produced 0.27 efficiency garbage "
                        "— use ~50 when the artifact matters (healthy "
                        "baseline: 30-60).")
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.changes, "manifest.json")):
        sys.path.insert(0, ROOT)
        from tenzir_spark.cdc.changegen import generate_changes

        print(f"generating {args.events} events at {args.changes} ...", file=sys.stderr)
        generate_changes(args.changes, n_events=args.events, n_docs=args.docs,
                         n_parts=args.parts, n_batches=args.batches, seed=42,
                         token_len=(64, 256))

    probe_before = box_probe()
    print(json.dumps({"probe_before": probe_before}), flush=True)
    if args.wait_healthy:
        import time

        deadline = time.monotonic() + args.wait_healthy
        wait_probes = [probe_before]
        # require TWO consecutive healthy probes: the box's degradation is
        # bistable with momentary dips (one measured r4 run started on a
        # single 80.0 ms reading and produced 0.27-efficiency garbage) —
        # one good sample is a dip, two 2-min-apart samples are a window
        streak = 1 if probe_before["box_spark_job_ms"] <= args.healthy_ms else 0
        while streak < 2:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                print(json.dumps({"wait_healthy": "timeout — measuring "
                                  "anyway; artifact will carry the "
                                  "degraded-box validity note"}), flush=True)
                break
            time.sleep(min(120, remaining))
            probe_before = box_probe()
            wait_probes.append(probe_before)
            streak = streak + 1 \
                if probe_before["box_spark_job_ms"] <= args.healthy_ms else 0
            print(json.dumps({"probe_retry": probe_before,
                              "healthy_streak": streak}), flush=True)

    results = {}
    for c in [int(x) for x in args.cores.split(",")]:
        results[c] = run_one(c, args)
        print(json.dumps({"cores": c, **{k: results[c][k] for k in
              ("value", "steady_events_per_sec", "wall_sec", "final_rows")}}),
              flush=True)

    cs = sorted(results)
    if len(cs) == 2:
        n, m = cs
        r = m / n
        for kind, key in (("total", "value"), ("steady", "steady_events_per_sec")):
            eff = (results[m][key] / results[n][key]) / r
            print(json.dumps({
                "metric": f"scaling_efficiency_{kind}",
                "from_cores": n, "to_cores": m,
                f"events_per_sec_{n}": results[n][key],
                f"events_per_sec_{m}": results[m][key],
                "efficiency": round(eff, 3),
            }), flush=True)
    probe_after = box_probe()
    print(json.dumps({"probe_after": probe_after}), flush=True)
    results["box_probe"] = {"before": probe_before, "after": probe_after}
    if args.wait_healthy:
        results["wait_healthy_probes"] = wait_probes
    # self-describing validity: efficiency measured under host stalls is
    # unusable (stalls are host-side, they do not scale with cores) —
    # say so IN the artifact instead of leaving the reader to correlate
    degraded = max(probe_before["box_spark_job_ms"],
                   probe_after["box_spark_job_ms"]) > 80
    results["box_degraded"] = degraded
    if degraded:
        results["validity_note"] = (
            "box_spark_job_ms > 80 during this run (healthy: 30-60): "
            "host-side stall state documented in BASELINE.md — re-run on "
            "a healthy box before citing the efficiency number")
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
