"""A/B: collapse_mode maxby vs semijoin on the 4x4-executor headline
config (VERDICT r2 #8 — semijoin now relies on AQE runtime broadcast
conversion; re-measure and promote or close).

Reuses standalone_scaling's cluster harness: 4 worker JVMs x 4 cores/4g,
async compaction, heavy-token input, winners stats for maxby ("full" for
semijoin — the semi join keeps no count column so winners falls back
anyway). Usage: python scripts/semijoin_ab.py [--changes ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from standalone_scaling import run_ingest, start_cluster, stop_cluster  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--changes", default="/dev/shm/chg_heavy16")
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.changes, "manifest.json")):
        from tenzir_spark.cdc.changegen import generate_changes

        print(f"generating input at {args.changes} ...", file=sys.stderr)
        generate_changes(args.changes, n_events=16_000_000, n_docs=1_600_000,
                         n_parts=32, n_batches=16, seed=42, token_len=(64, 256))

    os.environ["SA_ASYNC"] = "1"
    results = {}
    for mode in ("maxby", "semijoin"):
        os.environ["SA_COLLAPSE"] = mode
        os.environ["SA_STATS"] = "winners" if mode == "maxby" else "full"
        stop_cluster(args.workers)
        start_cluster(args.workers)
        try:
            results[mode] = run_ingest(args.workers, args.changes)
            results[mode]["collapse_mode"] = mode
            print(json.dumps(results[mode]), flush=True)
        finally:
            stop_cluster(args.workers)
    with open(os.path.join(ROOT, "semijoin_ab.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
