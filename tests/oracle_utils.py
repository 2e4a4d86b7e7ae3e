"""Mirror of the driver's DuckDB-oracle comparison: run a Spark query and
an ANSI-SQL oracle over the same parquet tables, compare row count, column
names, and order-insensitive values.

Values are compared EXACTLY (no float tolerance): the engine's numeric
convention (decimal-exact aggregation, final cast to double) makes results
bit-identical across engines and partitionings; a mismatch here is a bug,
not noise.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _dec.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = normalize_rows(spark_cols, spark_rows)
    d = normalize_rows(duck_cols, duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
