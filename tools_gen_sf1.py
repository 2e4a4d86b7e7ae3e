"""Generate a ~10× (sf1-equivalent) soak dataset from the driver's sf0.1
parquet, under /tmp (scratch; the repo never writes to /root/testdata).

Construction (pure Spark, deterministic): 10 replicas of every table
with key-space offsets so joins stay consistent inside each replica;
documents get a per-replica salt token appended (every doc therefore
has 9 high-jaccard near-dup siblings — the dup-heavy profile of a web
crawl, which is exactly what the dedup family must survive at scale);
embeddings get a small per-replica perturbation (near-dup vectors for
the ANN family); events shift event-time by the replica index hours so
the time axis stretches instead of piling up.

Usage:  python tools_gen_sf1.py [dest_dir]   (default /tmp/spark_graft_sf1)
Then:   SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_json_readr_spark.session import get_spark  # noqa: E402
from dbt_json_readr_spark.sources.tables import load  # noqa: E402

# r5: REPLICAS is env-tunable so the same construction yields the sf10
# soak decade (SPARK_GRAFT_GEN_REPLICAS=100 → /tmp/spark_graft_sf10)
REPLICAS = int(os.environ.get("SPARK_GRAFT_GEN_REPLICAS", "10"))
SRC = "/root/testdata/sf0.1"

# per-table integer key columns to offset per replica (dims region/nation
# stay global so FK domains keep working)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("gen_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ["region", "nation"]:
        load(spark, SRC, name).write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    for name, keys in OFFSETS.items():
        base = load(spark, SRC, name)
        maxes = {
            k: int(base.agg(F.max(k)).first()[0]) + 1 for k in keys
        }
        reps = []
        for r in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + F.lit(r * maxes[k])).cast("long"))
            if name == "documents" and r > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{r}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "embeddings" and r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", lambda x: (x + F.lit(r * 1e-3)).cast("float")
                    ),
                )
            if name == "events" and r > 0:
                rep = rep.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {r} HOURS")
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        print(f"{name}: {out.count()} rows -> {dest}/{name}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
