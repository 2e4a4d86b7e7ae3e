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


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row triangle audit of an undirected edge list (doc_a,
    doc_b): n_docs / n_edges / n_wedges (Σ C(deg,2), exact) /
    n_triangles + transitivity (3·T / wedges, one double division).

    Degree-ordered orientation (Suri & Vassilvitskii's MR-friendly
    formulation): each edge points low→high under the TOTAL order
    (degree, id), so every triangle is counted exactly once as a wedge
    at its smallest vertex closed by one oriented edge, and the wedge
    join fans out from low-degree endpoints (out-degrees O(√m))
    instead of Σ C(deg,2) on raw edges.  Edge-keyed shuffles only."""
    deg = (
        edges.select(F.col("doc_a").alias("doc"))
        .unionAll(edges.select(F.col("doc_b")))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = edges.join(
        deg.select(F.col("doc").alias("doc_a"), F.col("d").alias("da")), "doc_a"
    ).join(deg.select(F.col("doc").alias("doc_b"), F.col("d").alias("db")), "doc_b")
    a_first = F.struct("da", "doc_a") < F.struct("db", "doc_b")
    oriented = e.select(
        F.when(a_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("src"),
        F.when(a_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
    )
    o1 = oriented.select("src", F.col("dst").alias("b"), F.col("dst_d").alias("bd"))
    o2 = oriented.select("src", F.col("dst").alias("c"), F.col("dst_d").alias("cd"))
    wedges = o1.join(o2, "src").filter(
        F.struct(F.col("bd"), F.col("b")) < F.struct(F.col("cd"), F.col("c"))
    )
    tri = wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = (
        deg.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges"),
        )
        .crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(n_tri))
    )
    return stats.select(
        "n_docs",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            (3 * F.col("n_triangles")).cast("double")
            / F.col("n_wedges").cast("double"),
        ).alias("transitivity"),
    )
