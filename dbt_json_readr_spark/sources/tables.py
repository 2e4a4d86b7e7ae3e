"""Loaders for the benchmark parquet tables.

Explicit schemas so the scan never pays inference and Catalyst can prune
columns / push filters into the parquet reader.  At 100 TB these would be
partitioned lake paths; the API is the same (`sf_dir` becomes a lake
prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts is stored as TIMESTAMP_NTZ(MICROS); requesting LTZ reads the
    # same micros with UTC wall-clock semantics (session TZ is pinned
    # UTC in prep()), matching DuckDB's naive read bit-for-bit.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark table with its explicit schema."""
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic `partsupp` synthesized from part × supplier.

    The benchmark testdata ships no partsupp.parquet, so the TPC-H
    shapes that need it (Q2/Q9/Q11/Q16/Q20) build it from pure integer
    arithmetic over the tables that DO exist — the same construction a
    generator would use, not a derivation from lineitem:

    - every part gets exactly 4 supplier rows, ``ps_suppkey =
      (p_partkey*4 + i) % S + 1`` for ``i ∈ 0..3`` where S = |supplier|
      (TPC-H dbgen assigns 4 suppliers per part with a modular stride;
      consecutive residues are used here because they stay collision-free
      for ANY supplier count ≥ 4, which dbgen's stride does not at the
      tiny test-scale S);
    - ``ps_availqty``/``ps_supplycost`` are integer hashes of the key
      pair, supplycost carried as exact DECIMAL(12,2) built from cents.

    The identical arithmetic is expressed in DuckDB SQL as
    :data:`plans.tpch.PARTSUPP_CTE`, so oracle comparisons are
    bit-exact.  Scale posture: the build is one broadcast of a 1-row
    supplier count + a 4-way explode of the part scan — no shuffle; at
    lake scale partsupp would simply be a real table and `load` replaces
    this function.
    """
    part = load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("long").alias("s_cnt"))
    )
    keyed = (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(3).cast("long"))).alias("i"),
            "s_cnt",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("i")) % F.col("s_cnt") + 1).alias("ps_suppkey"),
        )
    )
    cents = (F.col("ps_partkey") * 97 + F.col("ps_suppkey") * 61) % 99901 + 100
    return keyed.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 47 + F.col("ps_suppkey") * 31) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        # DECIMAL multiply (never divide: DuckDB decimal÷int yields DOUBLE)
        (cents.cast("decimal(14,0)") * F.lit("0.01").cast("decimal(4,2)"))
        .cast("decimal(12,2)")
        .alias("ps_supplycost"),
    )
