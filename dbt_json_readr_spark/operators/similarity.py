"""Approximate-nearest-neighbor search over embedding columns
(SURVEY.md §2 C6-C7).

- brute-force top-k: exact baseline.  The query set broadcasts (it is
  small by construction); candidate scoring is a map-side cross join and
  the per-query top-k is a window over (query, score) — partial top-k
  happens map-side via the window's rank pruning at 100 TB.
- LSH top-k: the scale path — deterministic sign-bit buckets first, so
  scoring is bucket-local; recall trades off against bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..session import spread
from .dedup import embedding_bucket


def _scored(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    # norms are computed once per vector BEFORE the cross join; scoring
    # inside the join is one fold per pair, not three (see
    # functions/vectors.py cosine_prenormed)
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.to_double(F.col("embedding")).alias("q_v")
    ).withColumn("q_n", V.norm(F.col("q_v")))
    c = spread(corpus).select(
        F.col("vec_id").alias("neighbor_id"), V.to_double(F.col("embedding")).alias("c_v")
    ).withColumn("c_n", V.norm(F.col("c_v")))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine_prenormed(
                F.col("q_v"), F.col("c_v"), F.col("q_n"), F.col("c_n")
            ).alias("cosine"),
        )
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        _scored(queries, corpus)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Top-k within the query's sign-LSH bucket only."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        V.to_double(F.col("embedding")).alias("q_v"),
        embedding_bucket(F.col("embedding")).alias("bucket"),
    ).withColumn("q_n", V.norm(F.col("q_v")))
    c = spread(corpus).select(
        F.col("vec_id").alias("neighbor_id"),
        V.to_double(F.col("embedding")).alias("c_v"),
        embedding_bucket(F.col("embedding")).alias("bucket"),
    ).withColumn("c_n", V.norm(F.col("c_v")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine_prenormed(
                F.col("q_v"), F.col("c_v"), F.col("q_n"), F.col("c_n")
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


QUANT = 1_000_000


def label_centroids(corpus: DataFrame) -> DataFrame:
    """Per-label centroid vectors — the IVF coarse quantizer (labels
    stand in for k-means cell assignments, which a real pipeline
    precomputes the same way).

    Determinism: components accumulate as FIXED-POINT integers
    (floor(v·1e6) summed exactly as longs, divided once at the end), so
    the centroid is identical under any partitioning/engine — a parallel
    double-sum would drift in the last ulp and flip ANN tie-breaks.
    """
    comp = corpus.select(
        "label", F.posexplode(V.to_double(F.col("embedding"))).alias("dim", "val")
    ).select(
        "label", "dim", F.floor(F.col("val") * QUANT).cast("long").alias("q")
    )
    per_dim = comp.groupBy("label", "dim").agg(
        (F.sum("q").cast("double") / (F.lit(QUANT) * F.count(F.lit(1)))).alias("c")
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda x: x["c"]
        ).alias("centroid")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, nprobe: int = 1
) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` nearest centroid cells, then
    exact top-k inside those cells only.  Centroids broadcast (|labels|
    rows); the only corpus-wide shuffle is the cell-key join — the
    pattern that keeps 100 TB of vectors out of the scoring cross
    product.  Scoring cost grows linearly with nprobe; recall per
    nprobe is MEASURED by plans/llm.py ann_recall_eval (cells are
    disjoint, so no cross-cell dedup is needed)."""
    cents = label_centroids(corpus)
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.to_double(F.col("embedding")).alias("q_v")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("c_cos"), "label")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "q_v", "label", V.cosine(F.col("q_v"), F.col("centroid")).alias("c_cos"))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_v", "label")
    )
    c = spread(corpus).select(
        "label", F.col("vec_id").alias("neighbor_id"), V.to_double(F.col("embedding")).alias("c_v")
    ).withColumn("c_n", V.norm(F.col("c_v")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        F.broadcast(probed.withColumn("q_n", V.norm(F.col("q_v"))))
        .join(c, "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine_prenormed(
                F.col("q_v"), F.col("c_v"), F.col("q_n"), F.col("c_n")
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
