"""Gap-based sessionization (SURVEY.md §2 B10) — the classic
lag → gap>threshold → cumulative-sum pattern, entirely window functions
(one shuffle on user_id, no UDF).  Scales: state per user is a sort
within its partition; skewed power-users are handled by AQE skew split
since the window partitions by user_id only."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEFAULT_GAP_S = 30 * 60


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """events(user_id, ts, event_id, ...) → + session_id (1-based per user)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # timestamp→double keeps sub-second precision (micros/1e6), matching
    # DuckDB's epoch(); unix_timestamp() would truncate and disagree at
    # gap boundaries
    gap = F.col("ts").cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_s), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("int"),
    )


def session_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """One row per (user, session): bounds, size, decimal-exact value sum."""
    return (
        sessionize(events, gap_s)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
