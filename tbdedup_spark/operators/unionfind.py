"""Distributed union-find: iterative smallest-id label propagation.

The reference never needs this (its duplicates are exact-hash groups — a
partition, not a graph); our three detectors emit *edges*, whose transitive
closure defines the clusters. north_rule names the algorithm: iterative
smallest-id label propagation via self-joins.

Each iteration does two monotone steps (labels only ever decrease, so
iterations are idempotent and safe to re-run — the property that makes the
checkpoint/resume story sound):

1. neighbor propagation  l(v) ← min(l(v), min_{(u,v)∈E} l(u))   [join on edges]
2. pointer jumping       l(v) ← min(l(v), l(l(v)))              [join labels]

Step 2 (path halving) makes chain-shaped components (caption-containment
chains A ⊂ B ⊂ C…) converge in O(log diameter) instead of O(diameter).
``localCheckpoint`` every iteration truncates the lineage that would
otherwise grow unboundedly (SURVEY §7 "what's hard" (a)).

Convergence check is one small aggregate per iteration; edges are reused
across iterations, so persist them once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "image_id",
    max_iter: int = 50,
) -> DataFrame:
    """(image_id, cluster_id) with cluster_id = min id in the component.

    ``nodes``: one column ``id_col``. ``edges``: columns a_id, b_id
    (direction irrelevant). Isolated nodes label themselves.
    """
    sym = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # step 1: min neighbor label
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "id")
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nbr_label", "label")).alias("label"))
        )
        # step 2: pointer jumping l(v) <- l(l(v))
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(F.col("id").alias("label"), F.col("label").alias("label2")).alias("y"),
                "label",
                "left",
            )
            .select(F.col("id"), F.least("label", F.coalesce("label2", "label")).alias("label"))
        )
        jumped = jumped.localCheckpoint()
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def with_representatives(components: DataFrame, id_col: str = "image_id") -> DataFrame:
    """CLUSTERS schema: representative = the smallest-id member = cluster_id
    itself (deterministic refinement of the reference's take-first rule,
    tbdedup/dedup/__init__.py:156-157)."""
    return components.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )
