"""Build tenzir_spark.zip for `spark-submit --py-files` (north-rule
deployment shape):

    python scripts/package.py
    spark-submit --master yarn --py-files dist/tenzir_spark.zip \
        jobs/run_ingest.py --events 10000000000 --changes s3://... \
        --warehouse s3://... --buckets 4096

Local mode needs no packaging (the repo is on sys.path); on a cluster the
zip ships the package to every executor's PYTHONPATH.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "tenzir_spark.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "tenzir_spark")):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
                    n += 1
    print(f"{out}: {n} files, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
