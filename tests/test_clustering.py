"""Connected-components duplicate clustering (operators/clustering.py)."""

import pytest
from pyspark.sql import functions as F

from tenzir_spark.operators.clustering import connected_components, dup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_chain_is_transitive(spark):
    # 1-2, 2-3, 3-4: one component even though (1,4) was never a pair
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_direction(spark):
    # edge direction must not matter; separate components keep separate ids
    comp = connected_components(
        _pairs(spark, [(9, 8), (10, 9), (2, 1), (5, 6)]))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {8: 8, 9: 8, 10: 8, 1: 1, 2: 1, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter 11)
    edges = [(i, i + 1) for i in range(1, 12)]
    comp = connected_components(_pairs(spark, edges))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert set(got) == set(range(1, 13))
    assert set(got.values()) == {1}


def test_dup_clusters_attach(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 8)], "doc_id long, text string")
    out = dup_clusters(df, "doc_id", _pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["component"] == 1 and rows[3]["component"] == 1
    assert rows[1]["cluster_size"] == 3 and rows[3]["cluster_size"] == 3
    assert rows[1]["is_canonical"] and not rows[2]["is_canonical"]
    # singletons: own component, size 1, canonical
    assert rows[4]["component"] == 4 and rows[4]["cluster_size"] == 1
    assert rows[4]["is_canonical"]
    # keep-one-per-cluster dedup drops exactly the non-canonical members
    kept = out.filter("is_canonical").count()
    assert kept == 4  # {1,2,3} -> 1, {5,6} -> 5, singletons 4 and 7


def test_string_ids(spark):
    # labels are type-agnostic: string ids elect the lexicographically
    # smallest member as canonical (URL/hash doc ids)
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string")
    comp = connected_components(pairs)
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_non_convergence_raises(spark):
    edges = [(i, i + 1) for i in range(1, 12)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, edges), max_iter=2)


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "a", 0)], "doc_id long, text string, component int")
    with pytest.raises(ValueError, match="already has a 'component'"):
        dup_clusters(df, "doc_id", _pairs(spark, []))


def test_empty_pairs(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = dup_clusters(df, "doc_id", _pairs(spark, []))
    assert all(r["is_canonical"] and r["cluster_size"] == 1
               for r in out.collect())
