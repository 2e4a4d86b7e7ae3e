"""Distributed connected components (SURVEY.md §2 C13) — turns near-dup
PAIRS into dedup CLUSTERS (the operation an LLM-corpus pipeline actually
ships: keep one canonical doc per component).

Algorithm: min-label propagation — every node starts labeled with its
own id; each round it takes the min of its label and its neighbors'
labels; fixpoint = components labeled by their min member.  Rounds are
whole-graph DataFrame joins (one shuffle each on the node id), so a
round costs O(|E|) shuffled bytes and the loop runs O(graph diameter)
rounds — near-dup graphs are overwhelmingly tiny star/clique clusters,
so diameter is small.  ``localCheckpoint`` truncates lineage each round
(the standard guard for iterative Spark algorithms; on a cluster use
``checkpoint`` to reliable storage instead).

This is the driver-coordinated-loop exception allowed by the engine's
no-driver-data rule: only the CONVERGENCE COUNT crosses to the driver,
never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """pairs(src, dst) undirected → (doc_id, cluster_id=min member id)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        neigh_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("nlabel")), "v"
            )
            .groupBy("u")
            .agg(F.min("nlabel").alias("min_neigh"))
        )
        new_labels = (
            labels.join(neigh_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("min_neigh", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))
