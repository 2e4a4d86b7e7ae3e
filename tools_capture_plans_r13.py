"""Capture .explain('formatted') dumps for r13-touched keys into
plans/r13/<key>_<tag>.txt (tag = before|after).

Usage: python tools_capture_plans_r13.py <tag> [key ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_json_readr_spark import registry  # noqa: E402
from dbt_json_readr_spark.plans.explain import formatted_plan  # noqa: E402
from dbt_json_readr_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "dedup_minhash_lsh",
    "dedup_containment_lsh",
    "dedup_minhash_est_calibration",
    "ann_bruteforce_topk",
    "dedup_embedding_cosine",
    "semdedup_prune",
    "dedup_band_utility",
    "dedup_threshold_curve",
    "dedup_k_sweep",
    "dedup_containment",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "doc_sparse_cosine_topk",
    "dedup_simhash",
    "dedup_method_agreement",
    "dedup_lsh_recall",
]


def main():
    tag = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    spark = get_spark("plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r13", exist_ok=True)
    qs = registry.queries()
    for key in keys:
        df = qs[key](spark, "/root/testdata/sf0.1")
        p = formatted_plan(df)
        path = f"plans/r13/{key}_{tag}.txt"
        with open(path, "w") as f:
            f.write(p)
        print(f"{path}: {len(p.splitlines())} lines")
    spark.stop()


if __name__ == "__main__":
    main()
