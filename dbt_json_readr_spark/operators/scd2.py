"""SCD Type-2 merge emulation (no Delta MERGE INTO in this image —
per the public guidance for lakehouse-less Spark: anti-join + union +
window).  Given the current dimension state and an update batch, emit
the next state:

- changed keys: current row closed (``effective_to`` = update ts,
  ``is_current`` = false) + a new current row appended
- new keys: inserted as current
- untouched keys and already-closed history: pass through unchanged

One shuffle on the business key; updates are typically tiny next to the
dimension → broadcast.  Deterministic: pure column logic, no
last-writer-wins races (the caller must pre-dedupe updates per key,
e.g. latest-per-key via a window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    eff_col: str = "effective_from",
    end_col: str = "effective_to",
    cur_col: str = "is_current",
) -> DataFrame:
    """current(key, *tracked, eff, end, cur) + updates(key, *tracked, eff)
    → next SCD2 state with the same schema."""
    upd = F.broadcast(
        updates.select(
            F.col(key),
            *[F.col(c).alias(f"_u_{c}") for c in tracked],
            F.col(eff_col).alias("_u_eff"),
        )
    )
    # any tracked attribute differs (null-safe)
    diff = None
    for c in tracked:
        d = ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        diff = d if diff is None else (diff | d)

    joined = current.join(upd, key, "left")
    has_upd = F.col("_u_eff").isNotNull()
    # pass-through: history rows, untouched keys, and current rows whose
    # update carries identical tracked values
    close = F.col(cur_col) & has_upd & diff
    kept = joined.select(
        key,
        *tracked,
        F.col(eff_col),
        F.when(close, F.col("_u_eff")).otherwise(F.col(end_col)).alias(end_col),
        F.when(close, F.lit(False)).otherwise(F.col(cur_col)).alias(cur_col),
    )
    # new versions for changed keys
    fresh_versions = (
        joined.filter(close)
        .select(
            key,
            *[F.col(f"_u_{c}").alias(c) for c in tracked],
            F.col("_u_eff").alias(eff_col),
            F.lit(None).cast(current.schema[end_col].dataType).alias(end_col),
            F.lit(True).alias(cur_col),
        )
    )
    # brand-new keys
    inserts = (
        updates.join(current.select(key).distinct(), key, "left_anti")
        .select(
            key,
            *tracked,
            F.col(eff_col),
            F.lit(None).cast(current.schema[end_col].dataType).alias(end_col),
            F.lit(True).alias(cur_col),
        )
    )
    return kept.unionByName(fresh_versions).unionByName(inserts)
