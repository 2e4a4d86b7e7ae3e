"""Dependency-free binary test helpers (no Spark, no DuckDB)."""

from __future__ import annotations


def snappy_uvarint(n: int) -> bytes:
    """Base-128 uvarint (the snappy length preamble) — one definition
    for the snappy tests; three hand-rolled copies drifted in r11
    (one only correct below 16384)."""
    out = bytearray()
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out.append(b7 | 0x80)
        else:
            out.append(b7)
            return bytes(out)
