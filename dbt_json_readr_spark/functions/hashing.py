"""Cross-engine deterministic hashing & sketch primitives.

Every primitive exists twice: a Spark ``Column`` builder (JVM-side,
codegen-friendly — no Python UDFs) and a DuckDB SQL-text builder used by
the oracles.  Both are anchored on md5, which is bit-identical
everywhere, so every sketch (minhash, simhash, fingerprints, LSH bands)
is reproducible across engines and across cluster topologies — a salted
md5-derived 60-bit integer instead of engine-private hash functions.

Scale note: md5 is ~3× slower than xxhash but still >1 GB/s/core
JVM-side; determinism across engines is worth it for an auditable
dedup pipeline (reruns and backfills produce identical sketches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------ hash64


def hash64(col: Column, salt: str = "") -> Column:
    """60-bit positive int from md5(salt ':' value)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def sql_hash64(expr: str, salt: str = "") -> str:
    return f"('0x' || substr(md5('{salt}:' || {expr}), 1, 15))::BIGINT"


# ------------------------------------------------------------ shingles


def char_shingles(col: Column, k: int) -> Column:
    """Distinct char k-grams; texts shorter than k yield [text]."""
    return F.when(F.length(col) < k, F.array(col)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - k + 1),
                lambda i: col.substr(i, F.lit(k)),
            )
        )
    )


def char_shingles_ordered(col: Column, k: int) -> Column:
    """Positional (non-distinct) char k-grams, for rolling-hash schemes."""
    return F.when(F.length(col) < k, F.array(col)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col) - k + 1),
            lambda i: col.substr(i, F.lit(k)),
        )
    )


def sql_char_shingles(expr: str, k: int) -> str:
    return (
        f"CASE WHEN len({expr}) < {k} THEN [{expr}] "
        f"ELSE list_distinct(list_transform(range(1, len({expr})-{k}+2), "
        f"i -> substr({expr}, i, {k}))) END"
    )


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


# ------------------------------------------------------------ minhash


def minhash_lane_cols(sh: Column, n_hashes: int, prefix: str = "mh") -> list[Column]:
    """n independent minhash lanes as FLAT columns over one exploded
    shingle row, four per md5 call: an md5 digest is 128 bits = four
    independent 32-bit hash functions (hex chars 1-8, 9-16, 17-24,
    25-32), so n//4 salted digests give n lanes at a quarter of the
    digest cost of one-per-call.  32-bit lanes are plenty for a min
    statistic (ties need a within-doc 2⁻³² collision).

    Flat columns instead of an array-HOF pipeline on purpose: Spark's
    higher-order functions (transform/aggregate) are CodegenFallback —
    every md5+conv inside them runs on the interpreted expression path.
    Exploding shingles to rows keeps the whole hash in whole-stage
    codegen, and groupBy(doc).min(lane) gets map-side partial
    aggregation for free (measured ~2× end-to-end on the LSH operator).

    Measured dead end (keep it dead): deriving the n hashes as affine
    permutations (a_i·h+b_i mod 2³¹-1) of ONE base md5 halves the hash
    cost but the permutations are correlated (one-permutation-hashing
    weakness) — LSH candidate volume nearly doubled at sf0.1
    (60k vs 32.5k) and end-to-end the operator got SLOWER.  Distinct
    output bits of one cryptographic digest carry no such coupling."""
    assert n_hashes % 4 == 0
    out = []
    for p in range(n_hashes // 4):
        d = F.md5(F.concat(F.lit(f"mhp{p}:"), sh.cast("string")))
        for lane in range(4):
            out.append(
                F.conv(F.substring(d, 1 + 8 * lane, 8), 16, 10)
                .cast("long")
                .alias(f"{prefix}{4 * p + lane}")
            )
    return out


def minhash_array(shingles: Column, n_hashes: int) -> Column:
    """Array-input twin of ``minhash_lane_cols`` (same values, same
    digest/lane layout) for callers that already hold a shingle array.
    Interpreted-HOF path — prefer the flat columns in hot operators."""
    assert n_hashes % 4 == 0

    def _digests(p: int):
        # closure factory: F.transform inspects lambda arity, so a
        # default-arg trick would bind the array-index column instead
        return lambda s: F.md5(F.concat(F.lit(f"mhp{p}:"), s.cast("string")))

    # one F.aggregate pass per digest so each md5 is evaluated exactly
    # once: referencing a transform result in four array_min expressions
    # would duplicate the md5 subtree (no CSE inside interpreted HOFs)
    init = F.array(*[F.lit(2**62).cast("long") for _ in range(4)])

    def _lane_min(acc, d):
        return F.array(
            *[
                F.least(
                    acc.getItem(lane),
                    F.conv(F.substring(d, 1 + 8 * lane, 8), 16, 10).cast("long"),
                )
                for lane in range(4)
            ]
        )

    quads = [
        F.aggregate(F.transform(shingles, _digests(p)), init, _lane_min)
        for p in range(n_hashes // 4)
    ]
    return F.concat(*quads)


def sql_minhash_array(shingles_expr: str, n_hashes: int) -> str:
    assert n_hashes % 4 == 0
    mins = []
    for p in range(n_hashes // 4):
        digest = f"md5('mhp{p}:' || CAST(s AS VARCHAR))"
        for lane in range(4):
            mins.append(
                f"list_min(list_transform({shingles_expr}, "
                f"s -> ('0x' || substr({digest}, {1 + 8 * lane}, 8))::BIGINT))"
            )
    return f"[{', '.join(mins)}]"


def band_key_flat(lane_cols: list[Column], band: int) -> Column:
    """Band key from flat minhash lane columns — identical string
    contract to ``band_key``/``sql_band_key`` (comma-joined decimal
    lanes, salted per band), but codegen-friendly (no array HOF)."""
    joined = F.concat_ws(",", *[c.cast("string") for c in lane_cols])
    return hash64(joined, f"band{band}")


def band_key(mh: Column, band: int, rows_per_band: int) -> Column:
    """Hash of one LSH band (slice of the minhash signature)."""
    sl = F.slice(mh, band * rows_per_band + 1, rows_per_band)
    joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), ",")
    return hash64(joined, f"band{band}")


def sql_band_key(mh_expr: str, band: int, rows_per_band: int) -> str:
    lo = band * rows_per_band + 1
    hi = lo + rows_per_band - 1
    joined = f"array_to_string(list_slice({mh_expr}, {lo}, {hi}), ',')"
    return sql_hash64(joined, f"band{band}")


# ------------------------------------------------------------ simhash


def simhash32(token_col: Column) -> Column:
    """32-bit simhash over (non-distinct) tokens: per bit, sign of the
    sum of ±1 votes from each token's hash."""
    hs = F.transform(token_col, lambda t: hash64(t, "sim"))

    def _vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for j in range(32):
        vote = F.aggregate(hs, F.lit(0).cast("long"), _vote(j))
        bits.append(F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sql_simhash32(tokens_expr: str) -> str:
    hs = f"list_transform({tokens_expr}, t -> {sql_hash64('t', 'sim')})"
    parts = [
        f"(CASE WHEN list_sum(list_transform({hs}, "
        f"h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {2**j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(32)
    ]
    return "(" + " + ".join(parts) + ")"


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def sql_hamming32(a: str, b: str) -> str:
    return f"CAST(bit_count(xor({a}, {b})) AS INTEGER)"
