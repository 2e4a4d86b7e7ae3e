"""Executor-side Iceberg partition transforms (spec §Partition
Transforms + Appendix B) as PURE Spark Column expressions — the write
path's half of the transform story (sources/skipping.py holds the
driver-side Python twin used for pruning audits).

The interesting one is ``bucket[N]``: the spec mandates
murmur3_x86_32 over the value's canonical bytes (8-byte little-endian
for every integral/temporal type, raw UTF-8 for strings).  Spark's
built-in ``hash()`` IS Murmur3_x86_32 but with seed 42 and Spark's own
element framing, so it can never agree with Iceberg readers; a Python
UDF would agree but put Python in the one place a 100 TB write spends
all its time.  Instead the hash is expressed with higher-order
functions: blocks fold through ``aggregate`` whose lambda variables
(h, b) keep every reuse a cheap variable reference — the naive
compose-Columns version duplicates subtrees ~4000× and blows the
expression tree.  All 32-bit arithmetic runs widened in BIGINT and is
masked back, so ANSI mode can never see an overflow: ``(x * c) mod
2^32`` splits into 16-bit halves (max intermediate 2^49).

Verified bit-for-bit against the pure-Python reference
(skipping.murmur3_x86_32) by property test over ints, longs and
unicode strings (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _mask(x: Column) -> Column:
    return x.bitwiseAND(F.lit(_M32))


def _mul32(x: Column, c: int) -> Column:
    """(x * c) mod 2^32 without ever exceeding 2^49 — ANSI-safe."""
    lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = _mask(
        (F.shiftright(x, 16).bitwiseAND(F.lit(0xFFFF)) * F.lit(c)).bitwiseAND(
            F.lit(0xFFFF)
        )
        * F.lit(0x10000)
    )
    return _mask(lo + hi)


def _rotl32(x: Column, r: int) -> Column:
    return _mask(F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r)))


def _mix(h: Column, k: Column) -> Column:
    """One murmur3 block round.  Callers MUST pass h and k as lambda
    variables (aggregate/transform bindings) — the body references
    each several times."""
    k = _mul32(k, _C1)
    k = _rotl32(k, 15)
    k = _mul32(k, _C2)
    h = h.bitwiseXOR(k)
    h = _rotl32(h, 13)
    return _mask(_mul32(h, 5) + F.lit(0xE6546B64))


def _fmix(h: Column, length: Column) -> Column:
    """Finalization: xor in the byte length, then the avalanche."""
    h = h.bitwiseXOR(length)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mul32(h, 0xC2B2AE35)
    return h.bitwiseXOR(F.shiftright(h, 16))


def murmur3_long(v: Column) -> Column:
    """murmur3_x86_32(little_endian_8_bytes(v), seed=0) as an unsigned
    value in [0, 2^32) — the Appendix-B hash for int/long/date/time/
    timestamp (all hash through their 8-byte long form).  Null → null.

    COLUMN-API form: an ``aggregate`` fold whose lambda bodies run
    interpreted — small tree, safe to compile anywhere, ~70 s per 60M
    rows.  The WRITE path never uses it: ``with_murmur3_long`` binds
    every 32-bit step as its own projection column, which whole-stage
    codegen compiles to one local each — measured 0.8 s per 60M rows
    (at parity with Spark's native ``hash``).  A fully UNROLLED Column
    tree sits between the two (~8 s/60M) but its single giant
    generated method OOMed janino at sf10 — don't resurrect it."""
    blocks = F.array(
        _mask(v.cast("long")),
        F.shiftright(v.cast("long"), 32).bitwiseAND(F.lit(_M32)),
    )
    return F.aggregate(
        F.when(v.isNotNull(), blocks),
        F.lit(0).cast("long"),
        _mix,
        lambda h: _fmix(h, F.lit(8)),
    )


def with_murmur3_long(df: "DataFrame", out_col: str, v: Column) -> "DataFrame":
    """CHAIN-BOUND murmur3_x86_32 of ``v``'s 8-byte-LE long form into
    ``df[out_col]`` — the write path's executor-side hash.  Every
    32-bit round lands in its own temp projection column: CollapseProject
    keeps non-cheap expressions referenced twice un-inlined, so codegen
    emits one local per step instead of the ~4000-leaf unrolled tree
    (which OOMs janino) or the interpreted HOF fold (~100× slower).
    Temps drop before return; null in → null out (null propagates
    through every arithmetic step)."""
    tag = f"__mm_{out_col}"
    n = [0]
    temps: list[str] = []

    def bind(d, expr):
        n[0] += 1
        name = f"{tag}_{n[0]}"
        temps.append(name)
        return d.withColumn(name, expr), F.col(name)

    def mul32(d, x, c):
        lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
        hi = _mask(
            (
                F.shiftright(x, 16).bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
            ).bitwiseAND(F.lit(0xFFFF))
            * F.lit(0x10000)
        )
        return bind(d, _mask(lo + hi))

    def rotl32(d, x, r):
        return bind(d, _mask(F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r))))

    def mix(d, h, k):
        d, k = mul32(d, k, _C1)
        d, k = rotl32(d, k, 15)
        d, k = mul32(d, k, _C2)
        d, h = bind(d, h.bitwiseXOR(k))
        d, h = rotl32(d, h, 13)
        d, t = mul32(d, h, 5)
        d, h = bind(d, _mask(t + F.lit(0xE6546B64)))
        return d, h

    vv = v.cast("long")
    df, b0 = bind(df, _mask(vv))
    df, b1 = bind(df, F.shiftright(vv, 32).bitwiseAND(F.lit(_M32)))
    df, h = mix(df, F.lit(0).cast("long"), b0)
    df, h = mix(df, h, b1)
    df, h = bind(df, h.bitwiseXOR(F.lit(8)))
    df, h = bind(df, h.bitwiseXOR(F.shiftright(h, 16)))
    df, h = mul32(df, h, 0x85EBCA6B)
    df, h = bind(df, h.bitwiseXOR(F.shiftright(h, 13)))
    df, h = mul32(df, h, 0xC2B2AE35)
    df = df.withColumn(out_col, h.bitwiseXOR(F.shiftright(h, 16)))
    return df.drop(*temps)


def with_murmur3_decimal(
    df: "DataFrame", out_col: str, v: Column, type_json: str
) -> "DataFrame":
    """CHAIN-BOUND murmur3_x86_32 of a decimal(p<=18, s) column's
    MINIMAL big-endian two's-complement unscaled bytes (Appendix B) —
    the write path's executor-side decimal hash, same cost shape as
    ``with_murmur3_long``.

    The buffer length n is value-dependent (1..8 bytes), but the
    little-endian words murmur folds are still fixed shift/mask
    expressions of the unscaled BIGINT per n — big-endian byte i of an
    n-byte buffer is ``(u >> 8(n-i)) & 0xFF`` — so an 8-way ``when``
    selects the first block word, only n=8 has a second block, and the
    0-3 tail bytes are always the LOWEST bytes of u, so the tail word
    depends only on r = n & 3.  Every 32-bit round binds as its own
    projection column (one codegen local each); no HOF fold, no
    variable-length loop.  Null in → null out (explicit final guard:
    the byte words coalesce nulls to 0 mid-chain)."""
    tag = f"__mmd_{out_col}"
    n_ctr = [0]
    temps: list[str] = []

    def bind(d, expr):
        n_ctr[0] += 1
        name = f"{tag}_{n_ctr[0]}"
        temps.append(name)
        return d.withColumn(name, expr), F.col(name)

    def mul32(d, x, c):
        lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
        hi = _mask(
            (
                F.shiftright(x, 16).bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
            ).bitwiseAND(F.lit(0xFFFF))
            * F.lit(0x10000)
        )
        return bind(d, _mask(lo + hi))

    def rotl32(d, x, r):
        return bind(d, _mask(F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r))))

    def mix(d, h, k):
        d, k = mul32(d, k, _C1)
        d, k = rotl32(d, k, 15)
        d, k = mul32(d, k, _C2)
        d, h = bind(d, h.bitwiseXOR(k))
        d, h = rotl32(d, h, 13)
        d, t = mul32(d, h, 5)
        d, h = bind(d, _mask(t + F.lit(0xE6546B64)))
        return d, h

    def byte_of(u, shift):  # big-endian byte at fixed shift, as 0..255
        return F.shiftright(u, shift).bitwiseAND(F.lit(0xFF)) if shift else u.bitwiseAND(F.lit(0xFF))

    def le_word(u, shifts):  # little-endian word from 4 BE byte shifts
        w = byte_of(u, shifts[0])
        for j, sh in enumerate(shifts[1:], start=1):
            w = w + byte_of(u, sh) * F.lit(1 << (8 * j))
        return w

    # u_raw propagates null; the final guard tests IT, not the decimal
    # source — a guard referencing the DECIMAL column keeps the
    # decimal alive through the whole bound chain and measured
    # 42 s/60M rows steady-state vs 2.3 s with the long-typed guard
    # (r10; the mechanism is plan-side, the hash math is identical)
    df, u_raw = bind(df, decimal_unscaled_long(v, type_json))
    df, u = bind(df, F.coalesce(u_raw, F.lit(0).cast("long")))
    df, nb = bind(df, _min_twos_nbytes(u))
    r = nb.bitwiseAND(F.lit(3))

    # first block word: bytes 1..4 of the n-byte buffer (n >= 4 only)
    w1 = F.lit(0).cast("long")
    for n in range(4, 9):
        shifts = [8 * (n - i) for i in (1, 2, 3, 4)]
        w1 = F.when(nb == n, le_word(u, shifts)).otherwise(w1)
    df, w1c = bind(df, w1)
    # second block word exists only at n=8: bytes 5..8 = low word of u
    df, w2c = bind(df, le_word(u, [24, 16, 8, 0]))
    # tail word: the last r bytes are always u's LOWEST r bytes
    tail = (
        F.when(r == 1, byte_of(u, 0))
        .when(r == 2, byte_of(u, 8) + byte_of(u, 0) * F.lit(0x100))
        .when(r == 3, byte_of(u, 16) + byte_of(u, 8) * F.lit(0x100) + byte_of(u, 0) * F.lit(0x10000))
        .otherwise(F.lit(0).cast("long"))
    )
    df, tailc = bind(df, tail)

    df, m1 = mix(df, F.lit(0).cast("long"), w1c)
    df, h = bind(df, F.when(nb >= 4, m1).otherwise(F.lit(0).cast("long")))
    df, m2 = mix(df, h, w2c)
    df, h = bind(df, F.when(nb == 8, m2).otherwise(h))
    df, k = mul32(df, tailc, _C1)
    df, k = rotl32(df, k, 15)
    df, k = mul32(df, k, _C2)
    df, h = bind(df, F.when(r > 0, h.bitwiseXOR(k)).otherwise(h))
    # fmix: xor in the byte length, then the avalanche
    df, h = bind(df, h.bitwiseXOR(nb))
    df, h = bind(df, h.bitwiseXOR(F.shiftright(h, 16)))
    df, h = mul32(df, h, 0x85EBCA6B)
    df, h = bind(df, h.bitwiseXOR(F.shiftright(h, 13)))
    df, h = mul32(df, h, 0xC2B2AE35)
    df = df.withColumn(
        out_col,
        F.when(u_raw.isNull(), F.lit(None).cast("long")).otherwise(
            h.bitwiseXOR(F.shiftright(h, 16))
        ),
    )
    return df.drop(*temps)


def _long_form(col: Column, type_json: str) -> Column:
    """The spec's 8-byte-long canonical form per source type — ONE
    definition shared by the Column-API hash and the chain-bound write
    path, so the two can never hash the same value differently."""
    if type_json in ("int", "long"):
        return col.cast("long")
    if type_json == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    if type_json in ("timestamp", "timestamptz"):
        # ntz casts to tz under the pinned UTC session — same micros
        # the driver-side twin computes against the naive epoch
        return F.unix_micros(col.cast("timestamp"))
    raise ValueError(f"bucket over {type_json!r} has no executor-side hash")


def _decimal_params(type_json: str) -> tuple[int, int]:
    """(precision, scale) of an Iceberg ``decimal(p, s)`` type string
    (the writer emits a space after the comma; tolerate both)."""
    inner = type_json[len("decimal(") : -1]
    p_s, s_s = inner.split(",")
    return int(p_s), int(s_s)


def decimal_unscaled_long(col: Column, type_json: str) -> Column:
    """The EXACT unscaled integer of a decimal(p<=18, s) column as a
    BIGINT — the value Appendix B says to encode as minimal big-endian
    two's-complement bytes and hash.  The ×10^s runs in decimal
    arithmetic wide enough to never round (p + s + 2 <= 38), so ANSI
    mode can't see an overflow either; p > 18 gates loudly (a 38-digit
    unscaled value needs big-integer bytes no Column expression can
    build — the driver-side twin covers reads)."""
    p, s = _decimal_params(type_json)
    if p > 18:
        raise ValueError(
            f"bucket over {type_json!r} has no executor-side hash — "
            "unscaled values past 18 digits exceed BIGINT; precision "
            "<= 18 is supported"
        )
    return (
        col.cast(f"decimal({p},{s})") * F.lit(10**s).cast(f"decimal({s + 1},0)")
    ).cast("long")


def _min_twos_nbytes(u: Column) -> Column:
    """Byte count of the MINIMAL big-endian two's-complement encoding
    of BIGINT ``u`` (1..8) — the length murmur3 folds in, and the
    amount of ``u``'s low bytes that form the hashed buffer."""
    c = F.when(u.between(-0x80, 0x7F), 1)
    for n in range(2, 8):
        c = c.when(u.between(-(1 << (8 * n - 1)), (1 << (8 * n - 1)) - 1), n)
    return c.otherwise(8).cast("long")


def min_twos_complement_bytes(u: Column) -> Column:
    """BIGINT → BINARY: the minimal big-endian two's-complement bytes
    (spec Appendix B's decimal buffer; e.g. -128 is ONE byte 0x80).
    ``hex`` of a negative BIGINT is already the full 16-digit two's
    complement; positives left-pad to 16, then the last 2·n hex digits
    are exactly the minimal encoding."""
    def of(uu: Column) -> Column:
        def with_n(n: Column) -> Column:
            full = F.lpad(F.hex(uu), 16, "0")
            return F.unhex(full.substr(F.lit(17) - n * F.lit(2), n * F.lit(2)))

        return F.transform(F.array(_min_twos_nbytes(uu)), with_n)[0]

    # bind u (often a deep expression) once — same analysis-cost rule
    # as murmur3_binary's operand binding
    return F.transform(F.array(u), of)[0]


def with_bucket_column(
    df: "DataFrame", out_col: str, source: str, type_json: str, n: int
) -> "DataFrame":
    """``df`` + ``out_col`` = bucket[n](source) — the write path's
    DataFrame-level form.  Long-form types hash through the chain-bound
    murmur3 (codegen-fast); decimals through the chain-bound
    bounded-buffer variant; strings fall back to the HOF Column (the
    variable-length loop cannot unroll or chain)."""
    col = F.col(source)
    if type_json in ("string", "uuid", "binary") or type_json.startswith(
        "fixed["
    ):
        # variable-length byte buffers: the HOF Column binds its
        # operand once, so no chain form is needed (uuid's 16-byte
        # buffer included — same bounded-buffer path as decimals)
        return df.withColumn(out_col, bucket_value(col, type_json, n))
    if type_json.startswith("decimal("):
        df = with_murmur3_decimal(df, f"__h_{out_col}", col, type_json)
        return df.withColumn(
            out_col,
            F.col(f"__h_{out_col}").bitwiseAND(F.lit(0x7FFFFFFF)).cast("long")
            % F.lit(n),
        ).drop(f"__h_{out_col}")
    df = with_murmur3_long(df, f"__h_{out_col}", _long_form(col, type_json))
    return df.withColumn(
        out_col,
        F.col(f"__h_{out_col}").bitwiseAND(F.lit(0x7FFFFFFF)).cast("long")
        % F.lit(n),
    ).drop(f"__h_{out_col}")


def _byte_at(b: Column, pos: Column) -> Column:
    """The pos-th (1-based) byte of a BINARY column as a BIGINT in
    [0, 255]; 0 past the end (callers gate on length)."""
    return F.coalesce(
        F.conv(F.hex(b.substr(pos, F.lit(1))), 16, 10).cast("long"), F.lit(0)
    )


def murmur3_utf8(s: Column) -> Column:
    """murmur3_x86_32(utf8_bytes(s), seed=0), unsigned in [0, 2^32) —
    the Appendix-B hash for strings.  Null → null; '' → 0 (spec)."""
    return murmur3_binary(F.encode(s, "UTF-8"))


def murmur3_binary(b: Column) -> Column:
    """murmur3_x86_32 over a BINARY column's raw bytes, seed 0,
    unsigned in [0, 2^32) — the byte-buffer hash strings (UTF-8
    bytes) and decimals (minimal two's-complement unscaled bytes)
    share.  Full 4-byte little-endian blocks fold through
    ``aggregate``; the 0-3 tail bytes and the avalanche run in the
    finish lambda.  Null → null; empty → 0.

    ``b`` and its length bind ONCE as lambda variables
    (``transform`` over a one-element array) before the body ever
    references them: the body reads ~10 bytes of ``b``, and when the
    operand is itself a deep expression (the decimal byte builder),
    composing it in directly clones that subtree at every reference —
    measured 94 s of ANALYSIS on a 2-row plan before this binding."""
    return F.transform(F.array(b), _murmur3_binary_of)[0]


def _murmur3_binary_of(b: Column) -> Column:
    def over_n(n: Column) -> Column:
        nblocks = F.shiftright(n, 2)
        # sequence(1, 0) is the DESCENDING [1, 0], not empty — guard.
        idx = F.when(
            nblocks >= 1, F.sequence(F.lit(1).cast("long"), nblocks)
        ).otherwise(F.array().cast("array<bigint>"))
        blocks = F.transform(
            idx,
            lambda i: _byte_at(b, i * 4 - 3)
            + _byte_at(b, i * 4 - 2) * F.lit(0x100)
            + _byte_at(b, i * 4 - 1) * F.lit(0x10000)
            + _byte_at(b, i * 4) * F.lit(0x1000000),
        )

        def _finish(h: Column) -> Column:
            r = n.bitwiseAND(F.lit(3))
            p = F.shiftleft(nblocks, 2)
            tail = (
                F.when(r >= 1, _byte_at(b, p + 1)).otherwise(F.lit(0))
                + F.when(r >= 2, _byte_at(b, p + 2) * F.lit(0x100)).otherwise(F.lit(0))
                + F.when(r >= 3, _byte_at(b, p + 3) * F.lit(0x10000)).otherwise(F.lit(0))
            )
            k = _mul32(_rotl32(_mul32(tail, _C1), 15), _C2)
            h = F.when(r > 0, h.bitwiseXOR(k)).otherwise(h)
            return _fmix(h, n)

        return F.aggregate(
            F.when(b.isNotNull(), blocks), F.lit(0).cast("long"), _mix, _finish
        )

    return F.transform(F.array(F.octet_length(b).cast("long")), over_n)[0]


# ---------------------------------------------------------------- API


def _uuid_bytes(col: Column) -> Column:
    """The 16 big-endian RFC-4122 bytes of a CANONICAL-STRING uuid
    column (the Spark carrier for Iceberg's uuid type — the read
    bridge maps uuid → StringType, same as iceberg-spark).  Appendix B
    hashes exactly these bytes; a malformed string unhexes to the
    wrong length and hashes to null via the length gate, never to a
    wrong bucket."""
    raw = F.unhex(F.regexp_replace(col, F.lit("-"), F.lit("")))
    return F.when(F.octet_length(raw) == 16, raw)


def bucket_value(col: Column, type_json: str, n: int) -> Column:
    """``bucket[n](col)`` — (murmur3 & Integer.MAX_VALUE) % n, the
    spec's exact formula, per source type.  decimal(p<=18, s) hashes
    its minimal two's-complement unscaled bytes; uuid hashes its 16
    big-endian bytes (canonical-string carrier — the read bridge's
    Spark type for uuid); fixed[L]/binary hash the raw bytes (BINARY
    carrier) — all Appendix B.  Raises for types this module cannot
    hash executor-side (decimal p > 18 gates in
    decimal_unscaled_long — the driver-side twin covers reads)."""
    if type_json == "string":
        h = murmur3_utf8(col)
    elif type_json.startswith("decimal("):
        h = murmur3_binary(
            min_twos_complement_bytes(decimal_unscaled_long(col, type_json))
        )
    elif type_json == "uuid":
        h = murmur3_binary(_uuid_bytes(col))
    elif type_json == "binary" or type_json.startswith("fixed["):
        h = murmur3_binary(col)
    else:
        h = murmur3_long(_long_form(col, type_json))
    return h.bitwiseAND(F.lit(0x7FFFFFFF)).cast("long") % F.lit(n)


def truncate_value(col: Column, type_json: str, w: int) -> Column:
    """``truncate[w](col)`` — v - (v mod w) for integrals (mod always
    non-negative: pmod), the first w CODEPOINTS for strings (spec:
    unicode characters, not bytes — substring is codepoint-based)."""
    if type_json in ("int", "long"):
        return (col.cast("long") - F.pmod(col.cast("long"), F.lit(w))).cast(
            "long"
        )
    if type_json == "string":
        return F.substring(col, 1, w)
    raise ValueError(f"truncate over {type_json!r} is not supported here")


def datepart_value(col: Column, type_json: str, transform: str) -> Column:
    """``year/month/day/hour`` ordinals since 1970 (spec §Partition
    Transforms).  hour uses floor division on micros so pre-1970
    timestamps land in the right hour (int division truncates toward
    zero)."""
    if transform == "year":
        return (F.year(col) - F.lit(1970)).cast("long")
    if transform == "month":
        return ((F.year(col) - F.lit(1970)) * F.lit(12) + F.month(col) - F.lit(1)).cast(
            "long"
        )
    if transform == "day":
        return F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("long")
    if transform == "hour":
        # exact INTEGER division: `/` on two bigints is double division,
        # which rounds for |micros| >= 2^53 (~year 2255) and can land a
        # row one hour off its spec-true partition (r9 review).  The
        # pmod makes the numerator exactly divisible, so `div`'s
        # truncate-toward-zero never matters.
        us = F.unix_micros(col.cast("timestamp"))
        per = F.lit(3_600_000_000)
        return F.call_function("div", us - F.pmod(us, per), per).cast("long")
    raise ValueError(f"unknown date transform {transform!r}")
