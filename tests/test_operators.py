"""Operator library vs DuckDB oracle on a representative subset.

The full 37-query sweep lives in scripts/check_oracles.py (the driver runs
the equivalent at sf0.01); this keeps a fast guard inside `pytest -x -q`.
"""

import duckdb
import pytest

from tenzir_spark.queries import REGISTRY
from scripts.check_oracles import TABLES, norm_rows

SUBSET = [
    "where_filter", "summarize_q1", "summarize_aggs", "taste_per_schema",
    "unique_adjacent", "deduplicate_limit", "unroll_list", "enrich_lookup",
    "dedup_exact", "lang_id", "minhash_lsh_pairs", "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    fn, sql = REGISTRY[name]
    spdf = fn(spark, sf_dir).toPandas()
    opdf = ddb.execute(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    cols = sorted(spdf.columns)
    assert norm_rows(spdf, cols) == norm_rows(opdf, cols)


def test_rows_only_queries_run(spark, sf_dir):
    for name in ["simhash_fingerprint", "ann_lsh_topk", "token_fingerprint_udf"]:
        fn, sql = REGISTRY[name]
        assert sql is None
        assert fn(spark, sf_dir).count() > 0
