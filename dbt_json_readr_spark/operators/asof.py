"""As-of (point-in-time) join (SURVEY.md §2 B13) — Spark lacks a native
one; this composes it from a tagged union + running ``last(..,
ignorenulls)`` window, so it stays JVM-side with ONE shuffle on the join
key (vs. the naive range-join cross product).

Semantics: for each left row, the right row with the greatest
``ts`` <= left.ts within the same key (inclusive).  Right side must be
unique per (key, ts) for determinism — pre-aggregate if not.

At 100 TB this is the standard scalable pattern: both sides shuffle once
on (key), sort within partition by ts, single pass — identical shape to
what a merge-asof engine does, expressed declaratively so Catalyst/AQE
handle partitioning and skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    l_tag = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (on, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias(f"_r_{ts}"),
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts).alias(f"_r_{ts}"),
    )
    # right rows sort before left rows at equal ts → inclusive match
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_is_left")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = r_tag.unionByName(l_tag).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last(f"_r_{ts}", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    keep = [on, ts] + [c for c in left.columns if c not in (on, ts)] + [
        f"{c}{suffix}" for c in right_cols
    ] + [f"{ts}{suffix}"]
    return filled.filter(F.col("_is_left") == 1).select(*keep)
