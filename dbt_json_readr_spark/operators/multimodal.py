"""Multimodal column plumbing (SURVEY.md §2 C12).

Pattern for a 100 TB multimodal lake: media lives as an opaque
``binary`` column next to a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` (the only sanctioned
Python path in this engine), so each executor core processes whole
record batches and the bytes never leave the executor.

Two tiers:

- REAL decode (``multimodal_decode``): payloads are genuine PNG and
  WAV files synthesized deterministically from ``doc_id``
  (integer-only pixel/sample patterns — no float transcendentals), and
  ``decode_media`` parses them with pure stdlib (zlib chunk walk +
  scanline unfiltering for PNG, RIFF parsing for WAV).  Because the
  content patterns are closed-form in doc_id, a DuckDB oracle
  recomputes every decoded stat arithmetically — decode correctness is
  hash-gated like any relational query.
- Declared stub (video, and the legacy ``extract_features`` path):
  mp4 needs a codec stack this container doesn't ship, so video rows
  flow through with ``decoded = false`` and null features — the gated
  escape hatch is part of the schema, not an exception.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
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


# ------------------------------------------------- real synth + decode
#
# Content formulas (shared by the Spark decoder and the DuckDB oracle —
# plans/llm.py multimodal_decode):
#   image:  w = 16 + doc_id % 16,  h = 16 + doc_id % 8, 8-bit grayscale
#           pixel(x, y) = (x*7 + y*13 + doc_id) % 256
#   audio:  sr = 8000 + (doc_id % 4) * 4000,  n = 400 + doc_id % 100
#           PCM16 mono sample(i) = ((i*17 + doc_id*31) % 65536) - 32768
#   video:  no codec in this container → empty payload, decoded=false

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_units", T.LongType()),  # pixels | samples
        T.StructField("content_sum", T.LongType()),
        T.StructField("content_min", T.LongType()),
        T.StructField("content_max", T.LongType()),
    ]
)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def synth_png(doc_id: int) -> bytes:
    """Real 8-bit grayscale PNG with the doc_id pixel pattern."""
    w, h = 16 + doc_id % 16, 16 + doc_id % 8
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 (None) per scanline
        raw.extend((x * 7 + y * 13 + doc_id) % 256 for x in range(w))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def synth_wav(doc_id: int) -> bytes:
    """Real RIFF/WAVE PCM16 mono file with the doc_id sample pattern."""
    sr = 8000 + (doc_id % 4) * 4000
    n = 400 + doc_id % 100
    samples = [((i * 17 + doc_id * 31) % 65536) - 32768 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


_PAETH = 4


def _unfilter_scanline(ftype: int, line: bytearray, prev: bytearray, bpp: int) -> bytearray:
    """PNG filter reconstruction, all five filter types (a real decoder
    must handle them even though our encoder emits type 0)."""
    out = bytearray(line)
    n = len(line)
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i] if prev else 0
        c = prev[i - bpp] if (prev and i >= bpp) else 0
        if ftype == 1:
            out[i] = (out[i] + a) & 0xFF
        elif ftype == 2:
            out[i] = (out[i] + b) & 0xFF
        elif ftype == 3:
            out[i] = (out[i] + (a + b) // 2) & 0xFF
        elif ftype == _PAETH:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    return out


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (8-bit grayscale): chunk walk → IHDR
    dims → inflate IDAT → per-scanline unfilter → pixel stats."""
    assert payload[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat = 8, b""
    w = h = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            assert depth == 8 and ctype == 0, "decoder supports 8-bit grayscale"
            # an Adam7-interlaced file would pass the per-field asserts but
            # decode to silently wrong pixel stats — reject it explicitly
            assert interlace == 0, "Adam7 interlace not supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w
    pixels: list[int] = []
    prev: bytearray = bytearray()
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        line = _unfilter_scanline(row[0], bytearray(row[1:]), prev, 1)
        pixels.extend(line)
        prev = line
    return {
        "width": w,
        "height": h,
        "n_units": len(pixels),
        "content_sum": sum(pixels),
        "content_min": min(pixels),
        "content_max": max(pixels),
    }


def decode_wav(payload: bytes) -> dict:
    """Pure-stdlib WAV decode via the ``wave`` RIFF parser → PCM16
    sample stats."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        samples = struct.unpack(f"<{n}h", wf.readframes(n))
    return {
        "sample_rate": sr,
        "n_units": n,
        "content_sum": sum(samples),
        "content_min": min(samples),
        "content_max": max(samples),
    }


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents → multimodal table with REAL payload bytes.  Runs as
    Arrow-batched mapInPandas: synthesis is the ingest boundary (the
    one place bytes are born in Python); everything downstream treats
    payload as an opaque binary column."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            mods = ids.map(lambda d: _MODALITIES[d % 3])
            payloads = [
                synth_png(d) if m == "image" else (synth_wav(d) if m == "audio" else b"")
                for d, m in zip(ids, mods)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "modality": mods,
                    "fmt": mods.map({"image": "png", "audio": "wav", "video": "mp4"}.get),
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(_synth, schema=schema)


def decode_media_row(payload: bytes, fmt: str) -> dict | None:
    """Real decoder entry point: png/wav parse with stdlib; formats
    needing absent codec stacks (mp4) return None → decoded=false."""
    if fmt == "png":
        return decode_png(payload)
    if fmt == "wav":
        return decode_wav(payload)
    return None


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of the binary payload column."""

    _int_fields = [
        ("width", "Int32"),
        ("height", "Int32"),
        ("sample_rate", "Int32"),
        ("n_units", "Int64"),
        ("content_sum", "Int64"),
        ("content_min", "Int64"),
        ("content_max", "Int64"),
    ]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_media_row(p, f) for p, f in zip(pdf["payload"], pdf["fmt"])
            ]
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "fmt": pdf["fmt"],
                "decoded": pd.array([d is not None for d in decoded], dtype="boolean"),
            }
            for name, dtype in _int_fields:
                out[name] = pd.array(
                    [d.get(name) if d else None for d in decoded], dtype=dtype
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODE_SCHEMA)


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
