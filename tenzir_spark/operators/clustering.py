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

    Returns (node, component) — same type as the id columns (numeric or
    string; min over strings elects the lexicographically smallest id) —
    for every node that appears in at least one pair; ``component`` is
    the smallest node id in the component. Nodes absent from ``pairs``
    are singletons — attach them with a left join + coalesce (see
    :func:`dup_clusters`). Raises if the propagation has not reached a
    fixpoint after ``max_iter`` rounds (rounds needed = graph diameter;
    raise ``max_iter`` for pathological long-chain graphs) — a silent
    partial result would elect several "canonical" members per cluster.
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
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["d"] == labels["n"])
            .groupBy("s")
            .agg(F.min("c").alias("_nc"))
        )
        # labels only ever decrease, so "no label changed this round" ⇔
        # fixpoint. The change flag rides the same select (works for any
        # id type — no numeric cast) and is read back as ONE scalar agg
        # over the checkpointed round result.
        labels = (
            labels.join(nbr_min, labels["n"] == nbr_min["s"], "left")
            .select(
                labels["n"].alias("n"),
                F.least(
                    labels["c"], F.coalesce(F.col("_nc"), labels["c"])
                ).alias("c"),
                (F.coalesce(nbr_min["_nc"] < labels["c"], F.lit(False))
                 ).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = labels.agg(
            F.sum(F.col("_chg").cast("long")).alias("k")).head()[0] or 0
        labels = labels.drop("_chg")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter")
    return labels.select(F.col("n").alias("node"), F.col("c").alias("component"))


def dup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    broadcast_rows: int = 10_000_000,
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
    once — so the corpus side is ONE join, broadcast when the component
    table is small (the common case: duplicates are a fraction of the
    corpus) and a shuffle join past ``broadcast_rows`` (a heavily-
    duplicated web crawl can connect most of the corpus; force-
    broadcasting an unbounded table would OOM the driver).
    """
    for col in ("component", "cluster_size", "is_canonical"):
        if col in df.columns:
            raise ValueError(
                f"dup_clusters: input already has a {col!r} column — "
                "drop or rename it first")
    comp = connected_components(pairs, src, dst, max_iter)
    # comp is checkpointed by the loop, so the row count is a cheap probe
    small = comp.count() <= broadcast_rows
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    sized = comp.join(F.broadcast(sizes) if small else sizes, "component")
    attach = F.broadcast(sized) if small else sized
    return (
        df.join(attach, df[id_col] == sized["node"], "left")
        .select(
            df["*"],
            F.coalesce(sized["component"], df[id_col]).alias("component"),
            F.coalesce(sized["cluster_size"], F.lit(1)).cast("long").alias(
                "cluster_size"),
        )
        .withColumn("is_canonical", F.col("component") == F.col(id_col))
    )
