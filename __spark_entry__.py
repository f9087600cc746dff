"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC engine end-to-end — deterministic binlog replay
    (inserts/updates/deletes/schema-change, duplicate + out-of-order
    delivery) LWW-collapsed and MERGEd into a lake table; returns the final
    corpus state. Deterministic for a fixed seed."""
    from tenzir_spark.cdc.changegen import generate_changes
    from tenzir_spark.cdc.runner import IngestRunner

    root = tempfile.mkdtemp(prefix="tenzir_spark_entry_")
    changes = os.path.join(root, "changes")
    generate_changes(changes, n_events=4_000, n_docs=500, n_parts=4,
                     n_batches=4, schema_change_batch=2, seed=42)
    runner = IngestRunner(spark, os.path.join(root, "wh"), n_buckets=8)
    runner.run(changes)
    return runner.final_state().orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tenzir_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted => rows-only check)."""
    from tenzir_spark import queries as q

    return q.oracle_sql()
