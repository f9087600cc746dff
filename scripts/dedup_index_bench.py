"""NearDupIndex scale evidence: per-batch ingest wall as the index grows.

The contract under test is the reason the operator exists: dedup of each
new batch against EVERYTHING accepted must cost ~O(batch + index-probe),
never O(corpus text) — so batch walls should stay ~flat while the
accepted corpus grows by one batch every step (a full-corpus rescan
design would grow linearly). Documents are deterministic (text derived
from md5 of a content id — no RNG state), and ``dup_frac`` of each
batch duplicates content from earlier batches, so the index actually
fires.

Emits ONE JSON line:
  {"docs_per_batch": D, "batches": N, "dup_frac": f,
   "batch_walls_s": [...], "kept_per_batch": [...],
   "wall_ratio_last3_first3": r, "box_spark_job_ms": m}

Usage: python scripts/dedup_index_bench.py [--docs 10000] [--batches 10]
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


def batch_df(spark, batch: int, docs: int, dup_frac: float):
    """Deterministic batch: doc ids are globally unique; a ``dup_frac``
    tail of every batch > 0 reuses BATCH 0's content for the same slot
    (exact content duplicates — minhash-identical; batch 0's keeper
    stays the accepted representative, so every later batch's tail must
    be dropped against the index)."""
    from pyspark.sql import functions as F

    n_dup = int(docs * dup_frac) if batch > 0 else 0
    base = spark.range(docs).select(
        (F.lit(batch) * docs + F.col("id")).alias("row_id"))
    cid = F.when(
        F.col("row_id") % docs >= docs - n_dup,
        F.col("row_id") % docs,   # same slot, batch 0's content
    ).otherwise(F.col("row_id"))
    words = F.concat_ws(
        " ", *[F.md5(F.concat(cid.cast("string"), F.lit(f":{k}")))
               for k in range(8)])
    return base.select(
        F.concat(F.lit("doc"), F.format_string("%09d", "row_id"))
        .alias("doc_id"),
        words.alias("text"),
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=10_000)
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--dup-frac", type=float, default=0.2)
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    p.add_argument("--compact-every", type=int, default=0,
                   help="fold acked index partitions after every N "
                        "batches (0 = never) — long-horizon runs "
                        "exercise compaction under load")
    args = p.parse_args()

    from scripts.scaling_report import box_probe
    from tenzir_spark.operators.dedup_index import NearDupIndex
    from tenzir_spark.session import get_spark

    probe = box_probe()
    spark = get_spark("dedup_index_bench", cores=args.cores)
    root = tempfile.mkdtemp(prefix="ndi_bench_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    try:
        idx = NearDupIndex(root)
        walls, kept, compact_walls = [], [], []
        for b in range(args.batches):
            df = batch_df(spark, b, args.docs, args.dup_frac)
            t0 = time.monotonic()
            out = idx.ingest(df, "text", "doc_id", b)
            k = out.filter("kept").count()
            walls.append(round(time.monotonic() - t0, 2))
            kept.append(k)
            if args.compact_every and (b + 1) % args.compact_every == 0:
                t0 = time.monotonic()
                idx.compact(spark, upto_batch=b + 1)
                compact_walls.append(round(time.monotonic() - t0, 2))
        first3 = sum(walls[1:4]) / 3   # skip batch 0 (codegen warmup)
        last3 = sum(walls[-3:]) / 3
        # exactness over the whole horizon: batch 0 keeps everything,
        # every later batch drops exactly its dup tail
        n_dup = int(args.docs * args.dup_frac)
        kept_exact = (kept[0] == args.docs
                      and all(k == args.docs - n_dup for k in kept[1:]))
        print(json.dumps({
            "docs_per_batch": args.docs, "batches": args.batches,
            "dup_frac": args.dup_frac, "cores": args.cores,
            "batch_walls_s": walls, "kept_per_batch": kept,
            "kept_exact": kept_exact,
            "wall_ratio_last3_first3": round(last3 / first3, 3),
            "compact_every": args.compact_every or None,
            "compact_walls_s": compact_walls,
            "indexed_docs": idx.stats(spark)["indexed_docs"],
            "box_spark_job_ms": probe["box_spark_job_ms"],
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
