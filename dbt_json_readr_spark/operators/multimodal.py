"""Multimodal column plumbing (SURVEY.md §2 C12) — *rows-only*.

Pattern for a 100 TB multimodal lake: media lives as an opaque
``binary`` column next to a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` (the only sanctioned
Python path in this engine), so each executor core processes whole
record batches and the bytes never leave the executor.

The image/audio codecs are not in this container, so the decode step is
STUBBED: ``decode_media`` raises ``NotImplementedError`` and the
pipeline routes through ``fake_decode`` — a deterministic stand-in
(md5-seeded) so the Spark-side plumbing (schema, batching, partition
behavior) is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_MODALITIES = ["image", "audio", "video"]


def decode_media(payload: bytes, modality: str, meta: dict) -> object:
    """Real decoder entry point — requires PIL / soundfile / av, which
    are not installed here.  Swap this in for ``fake_decode`` on a
    cluster with codec images."""
    raise NotImplementedError(
        f"no codec available for modality={modality}; install media libs "
        "and replace fake_decode with decode_media"
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic decode stand-in: 4 'features' from the payload's
    md5 — stable across runs, partitionings, and engines."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:4]]


def as_media_table(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: text bytes stand in for the media
    payload; modality + typed metadata derive deterministically from
    doc_id (JVM-side, no Python)."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.when(modality == "image", F.lit("png"))
        .when(modality == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
        F.when(modality != "audio", (F.col("doc_id") % 640 + 64).cast("int")).alias("width"),
        F.when(modality != "audio", (F.col("doc_id") % 480 + 48).cast("int")).alias("height"),
        F.when(modality == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.
    Each pandas batch is one Arrow record batch per partition slice —
    the shape a real decoder (resize / frame-sample / fft) plugs into."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": payloads.map(fake_decode),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
