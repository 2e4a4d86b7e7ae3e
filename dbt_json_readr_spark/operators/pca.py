"""Distributed PCA top component via fixed-point power iteration
(SURVEY.md §2 C34).

Linear algebra as DataFrame ops, engine-exact end to end:

1. Components quantize to fixed-point longs (floor(v·1e6)), center on
   the per-dim integer mean.
2. The covariance-scaled second-moment matrix builds as the classic
   outer-product aggregation: self-join the narrow (vec_id, dim, qc)
   table on vec_id → (i, j, qc_i·qc_j) → sum div n.  The d² fanout
   happens map-side and partial-aggregates before the (i, j) shuffle,
   so the corpus crosses the wire once no matter how many rows — the
   standard one-pass Gram-matrix shape.
3. Power iteration on the d²-row matrix: y = (C·x) with per-term
   integer div, renormalized by the max-|y| scalar — every step integer
   arithmetic with truncation-toward-zero division, which Spark ``div``
   and DuckDB ``//`` agree on exactly (verified, including negatives),
   so a 5-iteration run is hash-gated like a relational query.

Overflow budget (int64): |v| ≤ ~1.4 keeps |qc| ≤ 2.8e6, cov entries ≤
8e12, and the C·x products ≤ 8e18 < 2⁶³.  Corpora with larger
components should drop QUANT one decade (bounds scale quadratically).
This corpus measures max|v| = 0.58.

Scale posture: cov is d² rows (64 dims → 4096) — broadcast-sized for
any d where explicit PCA is sane; iterations touch only cov and the
d-row vector, so after the one corpus pass the loop cost is
independent of corpus size.  Sign/rotation determinism comes from the
all-positive init and integer arithmetic (no RNG, no float drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import release_iter_handle
from .kmeans import QUANT, components


def centered_components(embs: DataFrame) -> DataFrame:
    """(vec_id, dim, qc): fixed-point components centered on the
    per-dim integer mean (sum div n — truncation matches the oracle)."""
    comp = components(embs)
    means = comp.groupBy("dim").agg(
        F.expr("sum(qv) div count(1)").cast("long").alias("m")
    )
    return comp.join(F.broadcast(means), "dim").select(
        "vec_id", "dim", (F.col("qv") - F.col("m")).alias("qc")
    )


def gram_matrix(centered: DataFrame) -> DataFrame:
    """(i, j, c): per-pair-of-dims sum(qc_i·qc_j) div n — one corpus
    pass, partial-aggregated before the (i, j) shuffle."""
    a = centered.select("vec_id", F.col("dim").alias("i"), F.col("qc").alias("qa"))
    b = centered.select("vec_id", F.col("dim").alias("j"), F.col("qc").alias("qb"))
    return (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.expr("sum(qa * qb) div count(1)").cast("long").alias("c"))
    )


def power_iteration_topvec(embs: DataFrame, iters: int = 5) -> DataFrame:
    """(dim, eigvec_fp): the dominant principal direction after
    ``iters`` fixed-point power iterations, components scaled to
    max |x| = 1e6.  Same cache discipline as the other iterative
    operators: cov persists for the loop, per-round vectors
    materialize before their parent releases, one handle (the result
    vector) stays pinned at exit."""
    centered = centered_components(embs)
    cov = gram_matrix(centered).persist()
    cov.count()
    # per-round vectors localCheckpoint (r12, guide §3.3): persist()
    # kept the data but let each round's LOGICAL plan embed the
    # previous round's — after `iters` rounds the analyzer walked an
    # exponentially-nested tree (driver-side planning dominated the
    # operator; same fix as operators/kmeans.py / graph.py)
    x = cov.select(F.col("i").alias("dim")).distinct().select(
        "dim", F.lit(QUANT).cast("long").alias("x")
    ).localCheckpoint()
    for _ in range(iters):
        y = (
            cov.join(F.broadcast(x.withColumnRenamed("dim", "j")), "j")
            .groupBy("i")
            .agg(F.expr(f"sum((c * x) div {QUANT}L)").cast("long").alias("y"))
        )
        m = y.agg(F.max(F.abs("y")).alias("mx"))
        nxt = (
            y.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("dim"),
                F.expr(f"y div greatest(mx div {QUANT}L, 1L)").cast("long").alias("x"),
            )
            .localCheckpoint()
        )
        release_iter_handle(x)
        x = nxt
    cov.unpersist()
    return x.select("dim", F.col("x").alias("eigvec_fp")).orderBy("dim")
