"""A/B: flat vs band-bucketed NearDupIndex layouts at probe time.

Evidence for two scale claims on the index side of the probe:

1. (always on) The index band table is never SHUFFLED: the allowed band
   set derives from the batch and is broadcast, so the index side
   streams through a map-side BroadcastHashJoin — asserted on the
   classify plan (no SortMergeJoin/shuffle between the band scan and
   the candidate join).
2. (``band_buckets=N`` layouts) The index band SCAN is statically
   pruned to the ``bb=`` directories the batch's bands hash into —
   asserted via ``PartitionFilters`` on the plan and measured as probe
   wall. Pruning pays off when the batch's distinct bands cover few
   buckets (steady micro-batches against a large index); a probe batch
   whose bands touch every bucket degenerates to the flat scan, which
   is why the layout is an option, not the default.

Builds one index per layout from identical deterministic batches
(dedup_index_bench.batch_df), then times ``classify`` of a fresh probe
batch against each.

Emits ONE JSON line.

Usage: python scripts/dedup_index_bucket_ab.py [--index-docs 200000]
       [--probe-docs 50000] [--band-buckets 64] [--probe-reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-docs", type=int, default=200_000)
    p.add_argument("--index-batches", type=int, default=4)
    p.add_argument("--probe-docs", type=int, default=50_000)
    p.add_argument("--band-buckets", type=int, default=64)
    p.add_argument("--probe-reps", type=int, default=3)
    p.add_argument("--dup-frac", type=float, default=0.2)
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = p.parse_args()

    from scripts.dedup_index_bench import batch_df
    from scripts.scaling_report import box_probe
    from tenzir_spark.operators.dedup_index import NearDupIndex
    from tenzir_spark.session import get_spark

    probe = box_probe()
    spark = get_spark("dedup_index_bucket_ab", cores=args.cores)
    base = tempfile.mkdtemp(prefix="ndi_ab_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    docs_per_batch = args.index_docs // args.index_batches
    probe_batch = args.index_batches  # fresh id space after the index
    out = {
        "index_docs": args.index_docs, "probe_docs": args.probe_docs,
        "band_buckets": args.band_buckets, "cores": args.cores,
        "box_spark_job_ms": probe["box_spark_job_ms"],
    }
    try:
        for name, bb in (("flat", None), ("bucketed", args.band_buckets)):
            idx = NearDupIndex(f"{base}/{name}", band_buckets=bb)
            for b in range(args.index_batches):
                idx.ingest(batch_df(spark, b, docs_per_batch,
                                    args.dup_frac),
                           "text", "doc_id", b)
            # ONE probe batch, identical for both layouts; its dup tail
            # reuses batch-0 content so the index genuinely fires
            pdf = batch_df(spark, probe_batch, args.probe_docs,
                           args.dup_frac)
            walls, dropped = [], None
            for _ in range(args.probe_reps):
                t0 = time.monotonic()
                res = idx.classify(pdf, "text", "doc_id", probe_batch)
                dropped = res.filter("NOT kept").count()
                walls.append(round(time.monotonic() - t0, 2))
            # probe_candidates exposes the (otherwise checkpointed-away)
            # probe join plan
            plan = (idx.probe_candidates(pdf, "text", "doc_id", probe_batch)
                    ._jdf.queryExecution().executedPlan().toString())
            out[name] = {
                "probe_walls_s": walls,
                "probe_wall_min_s": min(walls),
                "dropped": dropped,
                # the index side must reach the candidate join via a
                # broadcast, never a full-table shuffle
                "plan_has_broadcast_join": "BroadcastHashJoin" in plan,
                "plan_bb_partition_filter":
                    ("bb#" in plan.split("PartitionFilters", 1)[-1])
                    if bb else None,
            }
        out["verdict_same_decisions"] = (
            out["flat"]["dropped"] == out["bucketed"]["dropped"])
        out["bucketed_over_flat_wall"] = round(
            out["bucketed"]["probe_wall_min_s"]
            / out["flat"]["probe_wall_min_s"], 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
