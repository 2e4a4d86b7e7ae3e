"""Fixed-point Lloyd's k-means over embedding columns (SURVEY.md §2 C33).

Iterative ML expressed as DataFrame ops, engine-exact:

- Components quantize to fixed-point longs (floor(v·1e6)) once; every
  distance, argmin, and centroid update after that is INTEGER
  arithmetic — bit-identical across engines, partitionings, and
  cluster topologies, so a 2-iteration run is oracle-checkable like
  any relational query (a float Lloyd's would drift in tie-breaks).
- Assignment: components join the (k·dims)-row centroid table
  BROADCAST on dim; squared diffs partial-aggregate map-side, so the
  only shuffle per iteration is the (n_vecs·k)-row narrow distance
  table, then an (n_vecs)-row argmin window.  Vectors never shuffle.
- Update: floor(sum/count) per (cluster, dim) stays in the integer
  domain, so the next iteration's inputs are exact.
- Ties break deterministically by (dist, cid) — the property that
  makes the result reproducible at all.

Magnitude bounds (64 dims, |v| ≤ ~2): q ~ 2e6, diff² ~ 1.6e13, per-pair
dist ~ 1e15 < 2⁶³; inertia sums fit BIGINT for corpora to ~10⁴ vecs per
stats group — beyond that, move inertia to DECIMAL(38,0).

Scale posture: each Lloyd iteration is one broadcast join + two narrow
shuffles — the exact shape MLlib's distributed KMeans uses (centroids
driver-side between rounds; here they stay in a DataFrame, which AQE
still plans broadcast because the side is k·dims rows).  Cost grows
linearly in k; for k beyond broadcast reach, pre-bucket with a coarse
quantizer (see operators/similarity.py ivf_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..session import release_iter_handle, rotate_cached

QUANT = 1_000_000


def components(embs: DataFrame) -> DataFrame:
    """(vec_id, dim, qv): fixed-point vector components, one row per
    dimension — the narrow long-format table every stage joins on."""
    return embs.select(
        "vec_id", F.posexplode(V.to_double(F.col("embedding"))).alias("dim", "val")
    ).select("vec_id", "dim", F.floor(F.col("val") * QUANT).cast("long").alias("qv"))


def init_centroids(comp: DataFrame, k: int) -> DataFrame:
    """Deterministic seeding: the first k vec_ids are the initial
    centroids (the reproducible stand-in for kmeans++ sampling)."""
    return comp.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), "dim", F.col("qv").alias("qc")
    )


def assign(comp: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid, dist): nearest centroid per vector by integer
    squared-L2, ties broken by cid."""
    diff = F.col("qv") - F.col("qc")
    dist = (
        comp.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = W.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "dist")
    )


def update(assigned: DataFrame, comp: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, dim) floor(mean) in fixed point.
    Clusters that lost all members drop out (standard Lloyd's)."""
    return (
        assigned.select("vec_id", "cid")
        .join(comp, "vec_id")
        .groupBy("cid", "dim")
        .agg(
            F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("qc")
        )
    )


# latest-wins rotation of the persisted handles that back the most
# recent Lloyd result (≤2 pinned per session across ANY number of
# invocations — same discipline as operators/dedup.py's sketch cache,
# keyed per SparkSession via session.rotate_cached).  Unpersisting a
# previous caller's frames is safe: their plans recompute.
def _rotate_handles(new: list[DataFrame]) -> None:
    rotate_cached("lloyd", new)


def _lloyd_loop(comp: DataFrame, k: int, iters: int):
    """``iters`` Lloyd rounds over a PERSISTED components frame.
    Returns (assigned, cents), both persisted and materialized;
    ``assigned`` carries squared-L2 to the PREVIOUS round's centroids —
    the quantity Lloyd's just minimized.

    Lineage discipline (r12, guide §3.3 / operators/graph.py): each
    round ``localCheckpoint``s (eager — materializes AND truncates the
    logical plan).  The previous persist()+count() discipline kept the
    DATA warm but left the PLAN iterative — every round's logical tree
    embedded the previous round's roughly three times over, so a
    5-iteration ``cents`` was a ~3⁵-node tree, and a consumer composing
    several quantizers (the ANN sweep) handed the analyzer a
    multi-million-node plan: the sweep spent ~170 s of a ~190 s action
    in DRIVER-side analysis/canonicalization with every frame already
    cached (executed-plan dump measured 2.1M formatted lines, 184k
    InMemoryTableScan references).  Truncation costs cross-invocation
    sameSemantics cache reuse (checkpointed plans are unique), which no
    consumer relied on — the loop has always re-run eagerly per
    invocation."""
    cents = init_centroids(comp, k).localCheckpoint()
    assigned = None
    for _ in range(iters):
        prev_assigned, prev_cents = assigned, cents
        assigned = assign(comp, cents).localCheckpoint()
        if prev_assigned is not None:
            release_iter_handle(prev_assigned)
        cents = update(assigned, comp).localCheckpoint()
        release_iter_handle(prev_cents)
    return assigned, cents


def kmeans_cells(embs: DataFrame, k: int = 8, iters: int = 2, rotate: bool = True):
    """(cells, cents) under the FINAL centroids: the IVF coarse
    quantizer refined by Lloyd rounds instead of taken from labels.
    ``cells`` is the full-corpus (vec_id, cid, dist) assignment.

    ``rotate=False`` leaves the persisted handles OUT of the session's
    latest-wins ``lloyd`` slot so a caller composing SEVERAL quantizers
    into one plan (the ANN parameter sweep) can pin them all together
    afterwards via ``pin_lloyd_handles`` — with per-call rotation the
    second quantizer unpersisted the first's cells while the sweep's
    final union still referenced them, and every config over the
    rotated-out quantizer replayed its full Lloyd chain at action time
    (measured: the 7-config sweep at sf0.1 spent >100 s in exactly
    these replays, r12)."""
    comp = components(embs).persist()
    assigned, cents = _lloyd_loop(comp, k, iters)
    # eager localCheckpoint: materialized AND plan-truncated, so any
    # number of downstream subtrees read a flat LogicalRDD instead of
    # re-embedding the Lloyd chain (see _lloyd_loop's r12 note)
    cells = assign(comp, cents).localCheckpoint()
    release_iter_handle(assigned)
    comp.unpersist()
    if rotate:
        _rotate_handles([cells, cents])
    return cells, cents


def pin_lloyd_handles(frames: list[DataFrame]) -> None:
    """Rotate ALL of ``frames`` into the session's ``lloyd`` slot at
    once — the multi-quantizer companion to ``kmeans_cells(...,
    rotate=False)``; the bound stays one slot per session, it just
    holds one sweep's handles instead of one call's."""
    _rotate_handles(frames)


def kmeans_stats(embs: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """Run ``iters`` Lloyd iterations and emit per-cluster stats from
    the final assignment (see _lloyd_loop for semantics + cache
    discipline).  The final assigned/cents handles back the returned
    plan and stay pinned until the next Lloyd invocation rotates them
    out."""
    comp = components(embs).persist()
    assigned, cents = _lloyd_loop(comp, k, iters)
    comp.unpersist()  # assigned/cents are materialized; comp is spent
    _rotate_handles([assigned, cents])
    stats = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("dist").cast("long").alias("inertia_fp"),
    )
    checksum = cents.groupBy("cid").agg(F.sum("qc").cast("long").alias("centroid_checksum"))
    return (
        stats.join(checksum, "cid")
        .select(
            F.col("cid").alias("cluster_id"), "n_vecs", "inertia_fp", "centroid_checksum"
        )
        .orderBy("cluster_id")
    )
