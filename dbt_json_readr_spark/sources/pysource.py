"""Spark 4 Python Data Source API connector (`pyspark.sql.datasource`,
new in 4.0): a deterministic synthetic-events generator usable as BOTH a
batch source and a partition-planned streaming source.

Why it exists: the engine's other sources are file readers; this is the
"no JVM connector exists" case the Python Data Source API was built for
(think: an internal REST firehose, a bespoke binary feed).  The
generator is the honest stand-in — and being md5-derived it is exactly
reproducible in DuckDB SQL (functions/hashing.py sql_hash64), so a
query over the connector is oracle-gated like every other key, proving
the connector delivers identical rows on every engine, rerun, and
partitioning.

Scale shape: batch reads plan one InputPartition per row-range — each
executor generates its slice independently (no driver materialization);
the stream reader plans the same range partitions per micro-batch via
DataSourceStreamReader (NOT SimpleDataSourceStreamReader, which reads
on the driver).  Python-side generation is the slow path by design
budget: it IS the source, there is no JVM alternative for a custom
connector, and rows stream out Arrow-batched.

Determinism contract (shared with PYSOURCE_SQL_CTE below and the
pure-Python replay in tests): for row i
  user_id    = 1 + hash64(i, 'user') % n_users
  type_bucket= hash64(i, 'type') % 100  → <60 view, <90 click, purchase
  value      = (hash64(i, 'val') % 100000) / 100.0
  ts_micros  = BASE_EPOCH_US + (hash64(i, 'ts') % 604800) * 1_000_000
where hash64(i, salt) = int(md5(f"{salt}:{i}")[:15 hex], 16).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"

# 2024-01-01 00:00:00 UTC in microseconds
BASE_EPOCH_US = 1_704_067_200_000_000
WEEK_S = 604_800


def _h64(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)


def _row(i: int, n_users: int) -> tuple:
    b = _h64(i, "type") % 100
    etype = "view" if b < 60 else ("click" if b < 90 else "purchase")
    return (
        i,
        BASE_EPOCH_US + (_h64(i, "ts") % WEEK_S) * 1_000_000,
        1 + _h64(i, "user") % n_users,
        etype,
        (_h64(i, "val") % 100_000) / 100.0,
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_users = int(options.get("n_users", 100))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))
        return [_Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users)


class _StreamReader(DataSourceStreamReader):
    """Partition-planned micro-batches over the same row space: offset =
    {"i": next_row}; each batch advances by rows_per_batch until n."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_users = int(options.get("n_users", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.n_parts = int(options.get("partitions", 4))

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        return {"i": self.n}

    def partitions(self, start: dict, end: dict):
        # MUST cover [start, end) COMPLETELY: the engine commits `end`
        # regardless of what we plan, so truncating here (the original
        # rows_per_batch*n_parts cap) silently LOST rows whenever a
        # batch spanned more than the cap — under availableNow the
        # plain MicroBatchStream API captures latestOffset() once and
        # plans ONE batch of the whole backlog (no admission control in
        # pyspark 4.1.2's PythonMicroBatchStream).  rows_per_batch now
        # bounds the PARTITION size (executor memory), never the batch.
        lo, hi = start["i"], end["i"]
        if lo >= hi:
            return [_Range(lo, lo)]
        step = max(1, min(self.rows_per_batch, -(-(hi - lo) // self.n_parts)))
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("n", ...)` after
    `spark.dataSource.register(SyntheticEventsDataSource)`; also
    `spark.readStream.format("synthetic_events")`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


def sql_generator_cte(n: int, n_users: int) -> str:
    """DuckDB replay of the connector's generator arithmetic — the
    oracle side of the determinism contract (same md5-derived fields
    over range(n))."""

    def h(salt: str) -> str:
        return f"('0x' || substr(md5('{salt}:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT"

    return f"""
SELECT i AS event_id,
       {BASE_EPOCH_US} + ({h("ts")} % {WEEK_S}) * 1000000 AS ts_us,
       1 + {h("user")} % {n_users} AS user_id,
       CASE WHEN {h("type")} % 100 < 60 THEN 'view'
            WHEN {h("type")} % 100 < 90 THEN 'click'
            ELSE 'purchase' END AS event_type,
       CAST({h("val")} % 100000 AS DOUBLE) / 100.0 AS value
FROM range({n}) t(i)
"""
