"""Duplicate-cluster resolution — connected components over near-dup pairs.

Pairwise near-dup detection (``minhash_near_dup_pairs``,
``cosine_near_dup_lsh``) emits EDGES; a production dedup pipeline needs
the transitive closure: if A~B and B~C, exactly one of {A, B, C} should
survive even though (A, C) was never emitted as a pair. This module
groups pair edges into connected components and elects one canonical
document per component — the "keep one per duplicate cluster" step of
every large-scale curation pipeline (C4, RefinedWeb, Dolma all do this
after MinHash).

Algorithm: hash-min label propagation — every node starts labeled with
its own id; each round a node takes the min of its label and its
neighbors' labels; at fixpoint every node in a component carries the
component's smallest id. Rounds needed = graph diameter, and near-dup
clusters are shallow (star/clique-shaped — a duplicate "family" shares
most shingles pairwise), so 2-4 rounds is typical. For adversarial
long-chain graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) converges in O(log n) rounds with the same per-round join shape;
hash-min is the right default for dedup workloads and keeps the oracle
replayable.

Scale shape (the 100 TB contract):
- state per round is the slim (node:int64, label:int64) table — payload
  never enters the loop;
- each round is ONE shuffle join (edges ⋈ labels on dst) + ONE partial-
  agg'd groupBy(min) + a broadcast-size-exempt left join back; edges are
  localCheckpoint'ed once so the pair computation never re-executes;
- per-round ``localCheckpoint`` truncates lineage (iterative plans
  otherwise grow until the optimizer itself becomes the bottleneck);
- convergence is detected from a 1-row scalar aggregate (labels only
  ever decrease, so an unchanged label-sum ⇔ fixpoint) — the driver
  never sees row data.

Reference analog: the reference stops at pairwise/keyed dedup
(libtenzir/builtins/operators/deduplicate.cpp); cluster resolution is
the training-pipeline extension layered on our pair operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given by pair rows.

    Returns (node:int64, component:int64) for every node that appears in
    at least one pair; ``component`` is the smallest node id in the
    component. Nodes absent from ``pairs`` are singletons — attach them
    with a left join + coalesce (see :func:`dup_clusters`).
    """
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)  # pair detection runs exactly once
    )
    labels = edges.select(F.col("s").alias("n")).distinct().withColumn(
        "c", F.col("n"))
    labels = labels.localCheckpoint(eager=True)
    # labels only decrease, so sum(label) strictly decreases until the
    # fixpoint — a 1-row scalar agg per round is the convergence probe.
    # decimal(38,0) keeps the sum exact for any int64 node-id population.
    def _label_sum(ls: DataFrame) -> int:
        return ls.agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        ).head()[0] or 0

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["d"] == labels["n"])
            .groupBy("s")
            .agg(F.min("c").alias("_nc"))
        )
        labels = (
            labels.join(nbr_min, labels["n"] == nbr_min["s"], "left")
            .select(
                labels["n"].alias("n"),
                F.least(
                    labels["c"], F.coalesce(F.col("_nc"), labels["c"])
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("n").alias("node"), F.col("c").alias("component"))


def dup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Attach duplicate-cluster columns to ``df`` from near-dup ``pairs``:

    - ``component``: smallest ``id_col`` in the row's duplicate cluster
      (its own id for non-duplicated rows);
    - ``cluster_size``: number of input rows sharing the component;
    - ``is_canonical``: true for exactly the one row per cluster whose id
      IS the component id — ``filter("is_canonical")`` is the
      keep-one-per-cluster dedup.

    The component table is ≤ 2×|pairs| rows (only pair-connected nodes),
    and cluster sizes are computed from IT — each node appears exactly
    once — so the corpus side is ONE broadcast join: no corpus-wide
    shuffle anywhere in the attach.
    """
    comp = connected_components(pairs, src, dst, max_iter)
    sized = comp.join(
        F.broadcast(
            comp.groupBy("component").agg(F.count("*").alias("cluster_size"))),
        "component",
    )
    return (
        df.join(F.broadcast(sized), df[id_col] == sized["node"], "left")
        .select(
            df["*"],
            F.coalesce(sized["component"], df[id_col]).alias("component"),
            F.coalesce(sized["cluster_size"], F.lit(1)).cast("long").alias(
                "cluster_size"),
        )
        .withColumn("is_canonical", F.col("component") == F.col(id_col))
    )
