"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row count
+ column names + order-insensitive normalized values.

Usage: python scripts/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "tolist"):
        return norm_cell(v.tolist())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return norm_cell(float(v))
    except ImportError:
        pass
    return str(v)


def norm_rows(pdf, cols):
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def main():
    from tenzir_spark.queries import REGISTRY
    from tenzir_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    passed = failed = skipped = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed += 1
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failed += 1
            continue
        scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            failed += 1
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL  {name}: rows {len(spdf)} != {len(opdf)}")
            failed += 1
            continue
        s_rows, o_rows = norm_rows(spdf, scols), norm_rows(opdf, scols)
        if s_rows != o_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:")
            print(f"      spark : {s_rows[bad]}")
            print(f"      duckdb: {o_rows[bad]}")
            failed += 1
            continue
        print(f"PASS  {name}: {len(spdf)} rows [{time.monotonic()-t0:.1f}s]")
        passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
