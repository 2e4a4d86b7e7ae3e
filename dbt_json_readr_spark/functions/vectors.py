"""JVM-side vector math over ``array<float>`` embedding columns.

Dot products and norms are explicit left folds (``F.aggregate`` over
``zip_with``) so the summation order is the array order — deterministic
and identical to the DuckDB oracle's ``list_reduce`` fold, which a
parallel/reordered sum would not be.  Everything is cast to double
before multiplying so both engines round identically.

At 100 TB scale this is the right shape anyway: per-row folds are
whole-stage-codegen'd, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine with the norms precomputed ONCE per vector instead of per
    pair — HOF folds are interpreted (CodegenFallback), so the per-pair
    cost drops 3× and a corpus vector's norm is no longer re-folded for
    every query it meets.  Bit-identical to ``cosine``: same left-fold
    dot, same ``dot / (na * nb)`` association, so oracles need no
    restructuring."""
    return dot(a, b) / (na * nb)


# --------------------------------------------------- DuckDB SQL twins


def sql_to_double(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
