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
    sh = spread(docs).select(
        "doc_id", H.char_shingles(F.col("text"), k).alias("sh")
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
    # cap degenerate buckets before the self-join
    sized = banded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(W.partitionBy("band", "bkey"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    a = sized.select(
        F.col("band"), F.col("bkey"), F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = sized.select(
        F.col("band"), F.col("bkey"), F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    # verify IN the bucket join (jaccard is identical for every band copy
    # of a pair), so the final dedup shuffles narrow (doc_a, doc_b,
    # jaccard) rows — the shingle arrays never cross a second exchange
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
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
    sized = banded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(W.partitionBy("band", "bval"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    a = sized.select("band", "bval", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = sized.select("band", "bval", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", H.hamming32(F.col("sim_a"), F.col("sim_b")).alias("hamming"))
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
    t = t.withColumn(
        "block_n", F.count(F.lit(1)).over(W.partitionBy("block"))
    ).filter(F.col("block_n") <= block_cap)
    a = t.select("block", F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a"))
    b = t.select("block", F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    inter = F.size(F.array_intersect("tok_a", "tok_b"))
    union = F.size(F.array_union("tok_a", "tok_b"))
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
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


def embedding_cosine_pairs(embs: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Near-dup embedding pairs within a sign-LSH bucket with cosine ≥
    threshold."""
    e = spread(embs).select(
        F.col("vec_id"),
        V.to_double(F.col("embedding")).alias("v"),
        embedding_bucket(F.col("embedding")).alias("bucket"),
    )
    a = e.select("bucket", F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"))
    b = e.select("bucket", F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", V.cosine(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
