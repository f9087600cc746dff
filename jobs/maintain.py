"""Lake table maintenance CLI — the operator's toolbox for the lake layer
(Iceberg procedure analogs; reference analog: the `rebuild`/`flush`
command family, libtenzir/builtins/commands/rebuild.cpp).

    python jobs/maintain.py --warehouse /wh [--table corpus] <command>

Commands:
    history                     one line per retained snapshot
    compact [--sorted]          fold merge-on-read deltas into the base
    expire --keep N             drop old manifests + GC their files
    orphans [--older-than SEC]  delete crash-leftover files no manifest references
    rollback --to VERSION       rewind (new snapshot; watermarks rewind too)
    rebucket --buckets N        bucket-spec evolution (full-table rewrite)

Every command prints ONE JSON line; all are safe against readers
(snapshot isolation) and take the cross-process writer lease where they
mutate. Spark is only started for the commands that need a job
(compact/rebucket)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", default="corpus")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("history")
    c = sub.add_parser("compact")
    c.add_argument("--sorted", action="store_true",
                   help="key-sort bucket files (row-group-pruned lookups; "
                        "~25%% extra fold time)")
    e = sub.add_parser("expire")
    e.add_argument("--keep", type=int, required=True)
    e.add_argument("--older-than", type=float, default=None,
                   help="also KEEP snapshots younger than this many "
                        "seconds (Iceberg older_than)")
    o = sub.add_parser("orphans")
    o.add_argument("--older-than", type=float, default=3600.0)
    r = sub.add_parser("rollback")
    r.add_argument("--to", type=int, required=True)
    b = sub.add_parser("rebucket")
    b.add_argument("--buckets", type=int, required=True)
    args = p.parse_args(argv)

    from tenzir_spark.lake.table import LakeTable

    t = LakeTable(args.warehouse, args.table)
    try:
        if args.cmd == "history":
            out = {"history": t.history()}
        elif args.cmd == "expire":
            t.acquire_writer_lease()
            out = t.expire_snapshots(keep_last=args.keep, older_than_s=args.older_than)
        elif args.cmd == "orphans":
            t.acquire_writer_lease()
            out = t.remove_orphan_files(older_than_s=args.older_than)
        elif args.cmd == "rollback":
            t.acquire_writer_lease()
            out = {"version": t.rollback(args.to)}
        else:  # compact / rebucket need a Spark job
            from tenzir_spark.session import get_spark

            t.acquire_writer_lease()
            spark = get_spark("tenzir_spark_maintain", cores=args.cores)
            if args.cmd == "compact":
                out = {"version": t.compact(spark, sort_by_key=args.sorted)}
            else:
                out = {"version": t.rebucket(spark, args.buckets),
                       "n_buckets": args.buckets}
    finally:
        # explicit release: a process exit drops the flock anyway, but
        # in-process callers (tests, notebooks) must not leave the next
        # maintenance command locked out by a lingering instance
        t.release_writer_lease()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
