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


_DUCK_KIND = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
    "FLOAT": "f", "DOUBLE": "f",
    "VARCHAR": "s", "BOOLEAN": "b", "DATE": "date",
}


def _duck_kind(t: str) -> str:
    t = str(t)
    if t in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"
    if t.startswith("DECIMAL"):
        return "dec"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if "[" in t or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return _DUCK_KIND.get(t, t)


def _spark_kind(t) -> str:
    n = t.simpleString()
    if n in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if n in ("float", "double"):
        return "f"
    if n.startswith("decimal"):
        return "dec"
    if n == "string":
        return "s"
    if n == "boolean":
        return "b"
    if n == "date":
        return "date"
    if n.startswith("timestamp"):
        return "ts"
    if n.startswith(("array", "struct", "map")):
        return "nested"
    return n


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    # Type-KIND parity guard: the driver's hash compares pandas-level
    # values, where DuckDB HUGEINT (any uncast integer sum) renders as
    # float64 while Spark's long renders as int64 — identical values,
    # different hashes (CORRECTNESS_r01: events_json_props,
    # dbt_description_coverage).  Exact width (int32 vs int64) is
    # hash-neutral; int-vs-float is not.
    duck_types = dict(zip(duck_cols, rel.types))
    spark_types = {f.name: f.dataType for f in spark_df.schema.fields}
    for c in spark_cols:
        dk, sk = _duck_kind(duck_types[c]), _spark_kind(spark_types[c])
        assert dk != "HUGEINT", (
            f"column {c!r}: oracle returns HUGEINT (uncast integer sum?) — "
            f"wrap it in CAST(... AS BIGINT) for driver hash parity"
        )
        assert dk == sk, (
            f"column {c!r}: type-kind mismatch spark={sk} duck={dk} "
            f"(spark {spark_types[c].simpleString()}, duck {duck_types[c]})"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = normalize_rows(spark_cols, spark_rows)
    d = normalize_rows(duck_cols, duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
