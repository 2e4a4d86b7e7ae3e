"""Probe: unrolled fixed-order dot/norm (codegen) vs the interpreted
F.aggregate/zip_with fold — bit-identity check + timing on the
ann_bruteforce_topk shape (VERDICT r12 item 2).

Usage: python tools_probe_dotunroll_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dbt_json_readr_spark.functions import vectors as V  # noqa: E402
from dbt_json_readr_spark.session import get_spark, prep, spread  # noqa: E402
from dbt_json_readr_spark.sources.tables import load  # noqa: E402


def dot_w(a, b, width):
    acc = F.lit(0.0)
    for i in range(width):
        acc = acc + a.getItem(i) * b.getItem(i)
    return F.when((F.size(a) == width) & (F.size(b) == width), acc).otherwise(
        V.dot(a, b)
    )


def _jvm_cpu(spark):
    try:
        pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def timed(spark, label, df, runs=3):
    for r in range(runs):
        c0 = _jvm_cpu(spark)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label:40s} run{r+1}: {dt:7.3f}s wall {_jvm_cpu(spark)-c0:8.3f} cpu", flush=True)


def scored(embs, dot_fn, width):
    def norm_fn(v):
        return F.sqrt(dot_fn(v, v, width)) if width else V.norm(v)

    q = embs.select(
        F.col("vec_id").alias("query_id"), V.to_double(F.col("embedding")).alias("q_v")
    ).withColumn("q_n", norm_fn(F.col("q_v")))
    c = spread(embs).select(
        F.col("vec_id").alias("neighbor_id"), V.to_double(F.col("embedding")).alias("c_v")
    ).withColumn("c_n", norm_fn(F.col("c_v")))
    dot_expr = (
        dot_fn(F.col("q_v"), F.col("c_v"), width)
        if width
        else V.dot(F.col("q_v"), F.col("c_v"))
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr / (F.col("q_n") * F.col("c_n"))).alias("cosine"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = prep(get_spark("probe_dot"))
    spark.sparkContext.setLogLevel("ERROR")
    embs = load(spark, sf_dir, "embeddings")
    width = embs.select(F.size("embedding")).limit(1).collect()[0][0]
    print("width:", width)

    cur = scored(embs, None, None)
    new = scored(embs, dot_w, width)

    # bit-identity: compare doubles EXACTLY via bin() representation
    a = cur.select("query_id", "neighbor_id", F.expr("cast(cosine as string)").alias("s"),
                   "cosine")
    b = new.select("query_id", "neighbor_id", F.col("cosine").alias("c2"))
    j = a.join(b, ["query_id", "neighbor_id"])
    n_tot = j.count()
    n_diff = j.filter(F.col("cosine") != F.col("c2")).count()
    # NaN-safe exact compare
    n_diff2 = j.filter(~(F.col("cosine").eqNullSafe(F.col("c2")))).count()
    print(f"pairs={n_tot} diff={n_diff} diff_nullsafe={n_diff2}")

    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    topk_cur = cur.withColumn("rank", F.row_number().over(w)).filter("rank <= 5")
    topk_new = new.withColumn("rank", F.row_number().over(w)).filter("rank <= 5")
    timed(spark, "bruteforce topk CURRENT (HOF fold)", topk_cur)
    timed(spark, "bruteforce topk UNROLLED", topk_new)
    spark.stop()


if __name__ == "__main__":
    main()
