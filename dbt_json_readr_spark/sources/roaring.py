"""Delta Lake DELETION VECTORS: pure-Python decode (and fixture-side
encode) of the public binary formats, driver-side only — positions are
metadata (like Iceberg position deletes), the data never leaves Spark.

Authorities (all public):
- Delta PROTOCOL.md "Deletion Vectors" / "Deletion Vector Descriptor
  Schema": descriptor fields (storageType u/i/p, pathOrInlineDv,
  offset, sizeInBytes, cardinality), the Z85 inline/UUID encodings,
  the on-disk file layout (1-byte format version, per-DV big-endian
  size prefix + data + big-endian CRC-32 of the data), and the DV data
  blob = little-endian int32 magic 1681511377 followed by a 64-bit
  RoaringBitmapArray.
- RoaringBitmap "RoaringFormatSpec" (github.com/RoaringBitmap): the
  portable 32-bit serialization (cookies 12346/12347, array / bitmap /
  run containers) that the 64-bit array embeds per 32-bit key bucket.
- ZeroMQ RFC 32 (Z85): the 85-character alphabet used for inline DVs
  and the 16-byte UUID in "u" storage.

Every structural assumption is VALIDATED on read (size prefix must
equal the descriptor's sizeInBytes, magic must match, CRC-32 must
match, decoded cardinality must equal the descriptor's cardinality) —
a real writer whose layout diverges from this transcription fails
loudly instead of yielding silently-wrong deletes.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377  # little-endian int32 preceding the 64-bit bitmap

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


class DeletionVectorError(ValueError):
    """Malformed / out-of-contract deletion-vector bytes."""


def z85_decode(text: str) -> bytes:
    """ZeroMQ RFC 32 Base85: 5 chars → 4 bytes (big-endian base 85)."""
    if len(text) % 5:
        raise DeletionVectorError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 char {c!r}") from None
        if v > 0xFFFFFFFF:
            raise DeletionVectorError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeletionVectorError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out += reversed(chunk)
    return "".join(out)


# ------------------------------------------------ 32-bit portable


def _decode_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard portable 32-bit roaring bitmap starting at ``pos``;
    returns (sorted values, next position)."""
    # unsigned: a run cookie with ≥0x8000 containers would go negative
    # under '<i' and arithmetic-shift into a bogus size
    (first,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (first & 0xFFFF) == _SERIAL_COOKIE_RUN:
        size = (first >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif first == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {first & 0xFFFF}")
    keys_cards = struct.unpack_from(f"<{2 * size}H", buf, pos)
    pos += 4 * size
    if has_offsets:
        pos += 4 * size  # offsets are redundant for a sequential read
    values: list[int] = []
    for i in range(size):
        key = keys_cards[2 * i]
        card = keys_cards[2 * i + 1] + 1
        base = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, pos)
            pos += 4 * n_runs
            for r in range(n_runs):
                start, length = runs[2 * r], runs[2 * r + 1]
                values.extend(range(base + start, base + start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w, word in enumerate(words):
                while word:
                    low = word & -word
                    values.append(base + (w << 6) + low.bit_length() - 1)
                    word ^= low
    return values, pos


def _encode_roaring32(values: list[int]) -> bytes:
    """Portable no-run-container serialization (cookie 12346; array
    containers ≤4096 entries, bitmap containers above) — the shape the
    reference Java writer emits for bitmaps without runs."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(values):
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    size = len(buckets)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, size)
    keys = sorted(buckets)
    desc = b"".join(struct.pack("<HH", k, len(buckets[k]) - 1) for k in keys)
    blobs = []
    for k in keys:
        vals = buckets[k]
        if len(vals) <= 4096:
            blobs.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blobs.append(struct.pack("<1024Q", *words))
    offsets = []
    off = len(head) + len(desc) + 4 * size
    for b in blobs:
        offsets.append(off)
        off += len(b)
    return head + desc + struct.pack(f"<{size}i", *offsets) + b"".join(blobs)


# ------------------------------------------------ 64-bit array + blob


def decode_dv_blob(buf: bytes) -> list[int]:
    """Delta DV data blob → sorted 64-bit row indexes.  Layout: int32
    LE magic, int64 LE bucket count, then per bucket int32 LE high key
    + one portable 32-bit roaring bitmap.  Truncated / corrupt bytes
    raise DeletionVectorError (never a bare struct.error), so callers
    gate on one exception class."""
    if len(buf) < 12:
        raise DeletionVectorError(f"DV blob too short ({len(buf)} bytes)")
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != MAGIC:
        raise DeletionVectorError(
            f"DV magic mismatch: got {magic}, want {MAGIC} — layout "
            "assumption (offset/endianness) does not match this writer"
        )
    (n_buckets,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: list[int] = []
    try:
        for _ in range(n_buckets):
            (key,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            vals, pos = _decode_roaring32(buf, pos)
            out.extend((key << 32) | v for v in vals)
    except (struct.error, IndexError) as e:
        raise DeletionVectorError(f"DV blob truncated/corrupt: {e}") from e
    if pos != len(buf):
        raise DeletionVectorError(
            f"DV blob has {len(buf) - pos} trailing bytes after the bitmap"
        )
    return out


def encode_dv_blob(positions: list[int]) -> bytes:
    buckets: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise DeletionVectorError(f"negative row index {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    parts = [struct.pack("<iq", MAGIC, len(buckets))]
    for k in sorted(buckets):
        parts.append(struct.pack("<i", k))
        parts.append(_encode_roaring32(buckets[k]))
    return b"".join(parts)


# ------------------------------------------------ file storage


def read_dv_from_file(path: str, offset: int, size_in_bytes: int) -> list[int]:
    """One DV from an on-disk DV file: seek ``offset``, int32
    BIG-endian size prefix (must equal the descriptor's sizeInBytes),
    ``size`` data bytes, int32 BIG-endian CRC-32 of the data."""
    with open(path, "rb") as f:
        version = f.read(1)
        if version != b"\x01":
            raise DeletionVectorError(
                f"DV file format version {version!r} (want 1): {path}"
            )
        f.seek(offset)
        head = f.read(4)
        if len(head) != 4:
            raise DeletionVectorError(
                f"DV offset {offset} points past EOF in {path}"
            )
        (size,) = struct.unpack(">i", head)
        if size != size_in_bytes:
            raise DeletionVectorError(
                f"DV size prefix {size} != descriptor sizeInBytes "
                f"{size_in_bytes} at offset {offset} in {path}"
            )
        data = f.read(size)
        if len(data) != size:
            raise DeletionVectorError(f"DV file truncated: {path}")
        tail = f.read(4)
        if len(tail) != 4:
            raise DeletionVectorError(f"DV checksum truncated: {path}")
        (crc,) = struct.unpack(">i", tail)
        if crc != zlib.crc32(data) - (1 << 32 if zlib.crc32(data) >= 1 << 31 else 0):
            raise DeletionVectorError(f"DV checksum mismatch in {path}")
    return decode_dv_blob(data)


def encode_inline(positions: list[int]) -> tuple[str, int, int]:
    """Fixture-side inline ('i') encoding: (z85 text with zero padding,
    sizeInBytes of the UNPADDED blob, cardinality)."""
    blob = encode_dv_blob(positions)
    padded = blob + b"\x00" * (-len(blob) % 4)
    return z85_encode(padded), len(blob), len(set(positions))


def write_dv_file_blobs(path: str, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write PRE-ENCODED DV blobs (executor-encoded bitmaps the driver
    never decodes) as one spec-true DV file; returns per-blob
    (offset, sizeInBytes) in input order.  Same framing as
    ``write_dv_file`` — version byte, then per DV a BIG-endian size
    prefix, the blob, and a BIG-endian CRC-32."""
    descs: list[tuple[int, int]] = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        for blob in blobs:
            offset = f.tell()
            f.write(struct.pack(">i", len(blob)))
            f.write(blob)
            crc = zlib.crc32(blob)
            f.write(struct.pack(">i", crc - (1 << 32 if crc >= 1 << 31 else 0)))
            descs.append((offset, len(blob)))
    return descs


def write_dv_file(path: str, dvs: list[list[int]]) -> list[tuple[int, int, int]]:
    """Position-list writer; returns per-DV (offset, sizeInBytes,
    cardinality) descriptor triples in input order.  ONE framing
    implementation: delegates to the blob writer so the byte layout
    cannot drift between the two entry points."""
    blobs = [encode_dv_blob(p) for p in dvs]
    descs = write_dv_file_blobs(path, blobs)
    return [
        (offset, size, len(set(p)))
        for (offset, size), p in zip(descs, dvs)
    ]
