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
from ..session import release_iter_handle, spread
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


def centroid_components(corpus: DataFrame) -> DataFrame:
    """Flat per-(label, dim) centroid components — the fixed-point core
    shared by the IVF quantizer and the PQ codebook.

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
    return comp.groupBy("label", "dim").agg(
        (F.sum("q").cast("double") / (F.lit(QUANT) * F.count(F.lit(1)))).alias("c")
    )


def label_centroids(corpus: DataFrame) -> DataFrame:
    """Per-label centroid vectors — the IVF coarse quantizer (labels
    stand in for k-means cell assignments, which a real pipeline
    precomputes the same way)."""
    per_dim = centroid_components(corpus)
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


def pq_assign(corpus: DataFrame, n_subdim: int = 8, n_codes: int = 4) -> DataFrame:
    """Product-quantization assignment: split each vector into
    ``dims/n_subdim`` subspaces and snap each subvector to the nearest
    of ``n_codes`` codebook entries (per-label centroid subvectors —
    the same deterministic codebook source as IVF).  Returns one row
    per (vec_id, subspace) with the chosen code and its quantized
    squared distance.

    Determinism: per-dim squared residuals are floor-quantized to
    integers BEFORE the 8-term sum, so the argmin ranking is exact
    integer comparison — no float-accumulation ties.  Scale shape: the
    codebook broadcasts (n_codes × dims rows); the per-vector work is
    an explode + map-side partial agg keyed (vec, sub, code), then one
    vec-keyed window — nothing corpus × corpus."""
    dq = pq_distance_table(corpus, n_subdim=n_subdim, n_codes=n_codes)
    w = W.partitionBy("vec_id", "subspace").orderBy("dqsum", "code")
    return dq.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop(
        "rn"
    )


def pq_distance_table(
    corpus: DataFrame, n_subdim: int = 8, n_codes: int = 4
) -> DataFrame:
    """(vec_id, subspace, code, dqsum) for EVERY code — the shared
    building block: argmin over it is PQ assignment (``pq_assign``),
    and the query-side slice is the ADC lookup table asymmetric-
    distance search sums over.  Same integer-exact arithmetic."""
    codes = (
        centroid_components(corpus)
        .filter(F.col("label") < n_codes)
        .select(F.col("label").alias("code"), "dim", "c")
    )
    comp = spread(corpus).select(
        "vec_id", F.posexplode(V.to_double(F.col("embedding"))).alias("dim", "val")
    )
    resid = F.col("val") - F.col("c")
    return (
        comp.join(F.broadcast(codes), "dim")
        .groupBy(
            "vec_id",
            (F.col("dim").cast("long") / n_subdim).cast("int").alias("subspace"),
            "code",
        )
        .agg(
            F.sum(F.floor(resid * resid * F.lit(QUANT)).cast("long")).alias("dqsum")
        )
    )


def normalized_subspace_components(
    corpus: DataFrame, n_subdim: int = 8
) -> DataFrame:
    """(vec_id, ss, sd, qv): fixed-point components of the UNIT-
    normalized vector, keyed by (subspace, subdim).

    Normalizing first makes quantized squared-L2 track cosine exactly
    (for unit vectors ‖a−b‖² = 2−2·cos(a,b)), which closes the
    L2-vs-cosine metric gap VERDICT r4 measured at recall@5 = 0.12 on
    the unnormalized ADC.  The norm is the portable left-fold
    (functions/vectors.py) and the division happens BEFORE the floor
    quantization, so both engines produce identical integers."""
    base = corpus.select(
        "vec_id", V.to_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", V.norm(F.col("v")))
    return base.select(
        "vec_id", "nrm", F.posexplode("v").alias("dim", "val")
    ).select(
        "vec_id",
        (F.col("dim").cast("long") / n_subdim).cast("int").alias("ss"),
        (F.col("dim") % n_subdim).cast("int").alias("sd"),
        F.floor(F.col("val") / F.col("nrm") * QUANT).cast("long").alias("qv"),
    )


def _pq_codebook_assign(comp_sub: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, ss, code): nearest code per (vector, subspace) by
    integer squared-L2 — Lloyd's assignment step generalized with the
    subspace key (all subspaces train simultaneously)."""
    diff = F.col("qv") - F.col("qc")
    dist = (
        comp_sub.join(F.broadcast(cent), ["ss", "sd"])
        .groupBy("vec_id", "ss", "code")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = W.partitionBy("vec_id", "ss").orderBy("dist", "code")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "ss", "code")
    )


def pq_train_codebooks(
    comp_sub: DataFrame, n_codes: int = 16, iters: int = 2
) -> DataFrame:
    """Per-subspace PQ codebooks trained with fixed-point Lloyd rounds
    (the real PQ trainer — Jégou's codebooks are per-subspace k-means,
    not shared label centroids).  Returns (ss, code, sd, qc),
    materialized (the table is tiny: subspaces × codes × subdims rows).

    Seeding is deterministic (first ``n_codes`` vec_ids' subvectors),
    every distance/update is integer arithmetic on the fixed-point
    components, and empty codes drop out — so an unrolled-CTE oracle
    replays the identical rounds bit-for-bit, the same contract as
    operators/kmeans.py.  ``comp_sub`` should be persisted by the
    caller (it is scanned ``2·iters + 1`` times)."""
    # eager localCheckpoint per round (r12, guide §3.3 — same lineage
    # truncation as operators/kmeans.py): persist() kept the data warm
    # but left each round's logical plan embedding the previous
    # round's, and ADC consumers compose this tree several times over
    cent = (
        comp_sub.filter(F.col("vec_id") < n_codes)
        .select("ss", F.col("vec_id").cast("int").alias("code"), "sd", F.col("qv").alias("qc"))
        .localCheckpoint()
    )
    for _ in range(iters):
        assigned = _pq_codebook_assign(comp_sub, cent)
        prev = cent
        cent = (
            assigned.join(comp_sub, ["vec_id", "ss"])
            .groupBy("ss", "code", "sd")
            .agg(
                F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("qc")
            )
            .localCheckpoint()
        )
        release_iter_handle(prev)
    return cent


def pq_distance_table_trained(
    comp_sub: DataFrame, cent: DataFrame
) -> DataFrame:
    """(vec_id, subspace, code, dqsum) against TRAINED codebooks —
    integer-exact, the shared block for trained-PQ assignment and the
    ADC query lookup tables."""
    diff = F.col("qv") - F.col("qc")
    return (
        comp_sub.join(F.broadcast(cent), ["ss", "sd"])
        .groupBy("vec_id", F.col("ss").alias("subspace"), "code")
        .agg(F.sum(diff * diff).alias("dqsum"))
    )


def kmeans_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    km_k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """IVF ANN over Lloyd-REFINED cells: the coarse quantizer is a
    2-iteration fixed-point k-means (operators/kmeans.py) instead of
    the given labels — the production IVF build, where cell quality is
    trained, not inherited.  Probing is integer squared-L2 against the
    final centroids (bit-exact argmin, same arithmetic as training);
    in-cell scoring is the usual prenormed cosine.  Scale shape
    matches ivf_topk: centroids broadcast, the corpus shuffles only on
    its cell key."""
    from . import kmeans as KM

    cells, cents = KM.kmeans_cells(corpus, k=km_k, iters=iters)
    return ivf_topk_from_cells(queries, corpus, cells, cents, k=k, nprobe=nprobe)


def kmeans_probe(
    queries: DataFrame, cents: DataFrame, nprobe: int, with_rank: bool = False
) -> DataFrame:
    """(query_id, cid): the ``nprobe`` nearest trained cells per query —
    integer squared-L2 against the broadcast centroids, bit-exact
    argmin (same fixed-point arithmetic as training).  ``with_rank``
    additionally returns the probe rank (1 = nearest cell), which lets
    a sweep evaluate every smaller nprobe from ONE probed frame by
    filtering ``probe_rank <= p`` — the rank order is the same total
    (dist, cid) order that defines nprobe membership, so the filtered
    frame is exactly the nprobe=p probe set."""
    from . import kmeans as KM

    qcomp = KM.components(queries)
    diff = F.col("qv") - F.col("qc")
    qdist = (
        qcomp.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    probe_w = W.partitionBy("vec_id").orderBy("dist", "cid")
    ranked = (
        qdist.withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
    )
    if with_rank:
        return ranked.select(
            F.col("vec_id").alias("query_id"), "cid", F.col("rn").alias("probe_rank")
        )
    return ranked.select(F.col("vec_id").alias("query_id"), "cid")


def ivf_scored_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    cells: DataFrame,
    cents: DataFrame,
    nprobe: int,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, probe_rank): every in-probed-cell
    candidate scored ONCE, with the rank of the cell it came from — the
    shared substrate of ``ivf_topk_from_cells`` and the parameter sweep
    (r12): a corpus vector lives in exactly one cell, so the nprobe=p
    result is precisely the ``probe_rank <= p`` slice of the
    nprobe=max frame; scoring at max and slicing replaces one full
    probe+score subtree per configuration."""
    probed = kmeans_probe(queries, cents, nprobe, with_rank=True)
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.to_double(F.col("embedding")).alias("q_v")
    ).withColumn("q_n", V.norm(F.col("q_v")))
    c = (
        spread(corpus)
        .join(cells.select("vec_id", "cid"), "vec_id")
        .select(
            "cid",
            F.col("vec_id").alias("neighbor_id"),
            V.to_double(F.col("embedding")).alias("c_v"),
        )
        .withColumn("c_n", V.norm(F.col("c_v")))
    )
    return (
        F.broadcast(probed.join(q, "query_id"))
        .join(c, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine_prenormed(
                F.col("q_v"), F.col("c_v"), F.col("q_n"), F.col("c_n")
            ).alias("cosine"),
            "probe_rank",
        )
    )


def ivf_topk_from_cells(
    queries: DataFrame,
    corpus: DataFrame,
    cells: DataFrame,
    cents: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """The probe-then-score half of kmeans_ivf_topk, split out so sweep
    evaluations (plans/llm.py ann_sweep_eval) can reuse ONE trained
    quantizer across several nprobe settings."""
    scored = ivf_scored_candidates(queries, corpus, cells, cents, nprobe)
    return topk_from_scored(scored.drop("probe_rank"), k)


def topk_from_scored(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over an already-scored candidate frame — the
    final window of every IVF read, shared so sweep configs derived by
    ``probe_rank`` slicing rank identically to the direct path."""
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
