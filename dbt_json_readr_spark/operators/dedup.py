"""Deduplication operator family (SURVEY.md §2 C1-C5) for LLM-scale
corpus curation, all expressed as DataFrame ops (no Python in the row
path).

Scale design: every variant turns the O(n²) pair space into a
bucket-local join —
- exact:    hash groupBy (one shuffle on the content hash)
- minhash:  LSH banding; only same-band pairs are candidates
- simhash:  byte-banding of the 32-bit sketch (pigeonhole: hamming≤3
            pairs must agree on ≥1 of 4 bands)
- embedding: deterministic sign-bit buckets
Oversized buckets (degenerate content) are capped with an explicit
count filter so one hot bucket cannot quadratic-blow a 100 TB run;
the cap is a visible parameter, not a silent drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import vectors as V
from ..session import spread

DEFAULT_BUCKET_CAP = 2000


def normalize_text(col):
    """lower, trim, collapse whitespace — the canonical form hashed by
    exact dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Content-hash dedup: every doc tagged with its group's canonical
    (min) doc_id.  One shuffle on the 32-hex md5."""
    d = docs.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_hash"))
    w = W.partitionBy("content_hash")
    return d.select(
        "doc_id",
        "content_hash",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.25,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup candidate pairs via minhash LSH, verified with exact
    shingle jaccard.  rows/band = n_hashes//bands; P(candidate) ≈
    1-(1-j^r)^b, tuned so ~j≥threshold pairs are likely candidates."""
    r = n_hashes // bands
    # shingles are hashed to 60-bit longs immediately: every downstream
    # stage (minhash, the band self-join carrying sh for verify, the
    # bucket-size window) then shuffles/compares 8-byte longs instead of
    # k-char strings — ~2.5× narrower rows in the two fat exchanges
    sh = spread(docs).select(
        "doc_id",
        F.array_distinct(
            F.transform(H.char_shingles(F.col("text"), k), lambda s: H.hash64(s, "sh"))
        ).alias("sh"),
    )
    mh = sh.select("doc_id", "sh", H.minhash_array(F.col("sh"), n_hashes).alias("mh"))
    banded = mh.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), H.band_key(F.col("mh"), b, r).alias("bkey")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    # Pair generation via groupBy + in-bucket explode instead of a
    # self-join: a DataFrame self-join recomputes the whole sketch
    # pipeline once PER SIDE (and Catalyst may broadcast the fat side
    # wholesale), where collect_list computes the sketch once and
    # shuffles it once, keyed by bucket.  The cap bounds the collected
    # array (≤ bucket_cap × |sh| longs); a degenerate bucket still
    # buffers in the agg before exclusion, but that hazard is identical
    # to the window formulation and ObjectHashAggregate spills.
    members = (
        banded.groupBy("band", "bkey")
        .agg(F.collect_list(F.struct("doc_id", "sh")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= bucket_cap))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    # verify IN the bucket (jaccard is identical for every band copy of
    # a pair), so the final dedup shuffles narrow (doc_a, doc_b,
    # jaccard) rows — the shingle arrays never cross a second exchange
    inter = F.size(F.array_intersect("p.a.sh", "p.b.sh"))
    union = F.size(F.array_union("p.a.sh", "p.b.sh"))
    return (
        members.select(pair.alias("p"))
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("doc_a"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Near-dup pairs whose 32-bit simhash hamming distance ≤ 3; the four
    8-bit bands guarantee recall by pigeonhole.  Band buckets above
    ``bucket_cap`` are excluded before the self-join — same quadratic
    guard as minhash (a degenerate band value must not O(n²) the run)."""
    sims = spread(docs).select(
        "doc_id", H.simhash32(H.tokens(F.col("text"))).alias("simhash")
    )
    banded = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    # groupBy + in-bucket explode: one sketch computation and one
    # shuffle instead of a per-side recompute self-join (see
    # minhash_lsh_pairs) — simhash32 is 32 F.aggregate passes per doc,
    # so computing it once matters even more here
    members = (
        banded.groupBy("band", "bval")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= bucket_cap))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    return (
        members.select(pair.alias("p"))
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("doc_a"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("doc_b"),
            H.hamming32(F.col("p.a.simhash"), F.col("p.b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def token_jaccard_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    threshold: float = 0.9,
    block_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Exact token-set jaccard within a blocking column — the precise
    (non-sketch) dedup for short docs; blocking bounds the pair space
    and ``block_cap`` hard-bounds it: a block bigger than the cap is
    excluded (use a finer blocking key instead of letting one block go
    quadratic over the corpus)."""
    t = spread(docs).select(
        "doc_id", F.col(block_col).alias("block"), F.array_distinct(H.tokens(F.col("text"))).alias("tok")
    )
    members = (
        t.groupBy("block")
        .agg(F.collect_list(F.struct("doc_id", "tok")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= block_cap))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    inter = F.size(F.array_intersect("p.a.tok", "p.b.tok"))
    union = F.size(F.array_union("p.a.tok", "p.b.tok"))
    return (
        members.select(pair.alias("p"))
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("doc_a"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


EMB_BUCKET_DIMS = [0, 7, 19, 31]


def embedding_bucket(vec) -> F.Column:
    """Deterministic 4-bit sign-LSH bucket (fixed dims, no RNG — byte-
    reproducible across runs and engines)."""
    out = F.lit(0)
    for i, d in enumerate(EMB_BUCKET_DIMS):
        out = out + F.when(vec.getItem(d) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return out.cast("int")


def embedding_cosine_pairs(
    embs: DataFrame, threshold: float = 0.4, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Near-dup embedding pairs within a sign-LSH bucket with cosine ≥
    threshold.  Grouped pair generation + the same quadratic-guard cap
    as the sketch dedups (a 4-bit LSH leaves ~n/16 vectors per bucket;
    above the cap the bucket needs more hash bits, not an O(n²) scan)."""
    e = spread(embs).select(
        F.col("vec_id"),
        V.to_double(F.col("embedding")).alias("v"),
        embedding_bucket(F.col("embedding")).alias("bucket"),
    )
    members = (
        e.groupBy("bucket")
        .agg(F.collect_list(F.struct("vec_id", "v")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= bucket_cap))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    return (
        members.select(pair.alias("p"))
        .select(
            F.least("p.a.vec_id", "p.b.vec_id").alias("vec_a"),
            F.greatest("p.a.vec_id", "p.b.vec_id").alias("vec_b"),
            V.cosine(F.col("p.a.v"), F.col("p.b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
