"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is timed as a full action (plan + execute + collect).  A tiny
warm-up action first so JVM/codegen startup is not billed to q1.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_json_readr_spark import registry  # noqa: E402
from dbt_json_readr_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "events_sessionization",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    # warm-up: JVM + whole-stage-codegen compile for the expression
    # shapes the headline uses (decimal aggs, md5 sketches, windows) on
    # the smoke-scale data, so compilation isn't billed to the timings
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = registry.queries()
    for key in HEADLINE:
        if key in warm:
            warm[key](spark, "/root/testdata/sf0.001").count()

    available = registry.queries()
    timings: dict[str, float] = {}
    for key in HEADLINE:
        if key not in available:
            continue
        t0 = time.perf_counter()
        n = available[key](spark, sf_dir).count()
        timings[key] = round(time.perf_counter() - t0, 3)
        print(f"# {key}: {timings[key]}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
