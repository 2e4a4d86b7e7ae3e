"""Probe verify-join shapes for the minhash jaccard verify at sf1
(VERDICT r13 items 5/7): current shape vs set-side broadcast hints vs
a Generate barrier that evaluates array_intersect once per pair.

Usage: python tools_probe_verify_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dbt_json_readr_spark.functions import hashing as H  # noqa: E402
from dbt_json_readr_spark.operators import dedup as D  # noqa: E402
from dbt_json_readr_spark.plans.explain import formatted_plan  # noqa: E402
from dbt_json_readr_spark.session import get_spark, prep  # noqa: E402
from dbt_json_readr_spark.sources.tables import load  # noqa: E402


def _jvm_cpu(spark):
    try:
        pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def timed(spark, label, df, runs=2):
    plan = formatted_plan(df)
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoop)", plan)
    print(f"  [{label}] joins: {joins}")
    for r in range(runs):
        c0 = _jvm_cpu(spark)
        spark.sparkContext.setJobDescription(f"probe:{label}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label:40s} run{r+1}: {dt:7.3f}s wall {_jvm_cpu(spark)-c0:8.3f} cpu", flush=True)
    spark.sparkContext.setJobDescription(None)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = prep(get_spark("probe_verify"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    k, n_hashes, bands, tau = 5, 12, 3, 0.8

    rows = D._shingle_rows(docs, k)
    per_doc = rows.select(
        "doc_id", "sh", *H.minhash_lane_cols(F.col("sh"), n_hashes)
    ).groupBy("doc_id").agg(
        *[F.min(f"mh{i}").alias(f"mh{i}") for i in range(n_hashes)],
        F.collect_set("sh").alias("sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_doc.count()
    cand = D._cand_from_mins(per_doc.drop("sh"), n_hashes, bands, D.DEFAULT_BUCKET_CAP).persist()
    print("n_cand:", cand.count())
    sets = per_doc.select("doc_id", "sh")
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter

    # v0: current shape
    v0 = (
        F.broadcast(cand)
        .join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )
    timed(spark, "v0 current", v0)

    # v1: set sides explicitly broadcast, candidates streamed
    v1 = (
        cand
        .join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )
    timed(spark, "v1 bcast sets", v1)

    # v2: v1 + Generate barrier — intersect evaluated ONCE
    joined = cand.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
    v2 = (
        joined.select(
            "doc_a",
            "doc_b",
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
            F.explode(F.array(F.size(F.array_intersect("sh_a", "sh_b")))).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )
    timed(spark, "v2 bcast sets + barrier", v2)

    # v3: current join shape + barrier (isolate barrier effect)
    joined3 = F.broadcast(cand).join(sa, "doc_a").join(sb, "doc_b")
    v3 = (
        joined3.select(
            "doc_a",
            "doc_b",
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
            F.explode(F.array(F.size(F.array_intersect("sh_a", "sh_b")))).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )
    timed(spark, "v3 current joins + barrier", v3)

    # sanity: row counts agree
    n0, n1, n2 = v0.count(), v1.count(), v2.count()
    print("counts:", n0, n1, n2, "match:", n0 == n1 == n2)
    spark.stop()


if __name__ == "__main__":
    main()
