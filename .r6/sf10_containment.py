import sys, time, json
sys.path.insert(0, "/root/repo")
from dbt_json_readr_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("sf10soak")
spark.sparkContext.setLogLevel("ERROR")
from dbt_json_readr_spark.plans.llm import dedup_containment_lsh
from dbt_json_readr_spark.operators import dedup as D
from dbt_json_readr_spark.plans.llm import _MH_K, _MH_N, _MH_BANDS, spread, load

sf = "/tmp/spark_graft_sf10"
docs = spread(load(spark, sf, "documents"))
t0 = time.time()
cand = D.minhash_candidate_pairs(docs, k=_MH_K, n_hashes=_MH_N, bands=_MH_BANDS)
n_cand = cand.count()
t_cand = time.time() - t0
print(json.dumps({"n_candidates_precap": n_cand, "candidate_gen_s": round(t_cand,1)}), flush=True)

t0 = time.time()
capped, capped_docs = D.candidate_degree_cap(cand, D.DEFAULT_DEGREE_CAP)
n_capped = capped.count()
n_docs_capped = capped_docs.count()
t_cap = time.time() - t0
print(json.dumps({"n_candidates_postcap": n_capped, "n_docs_with_drops": n_docs_capped, "cap_s": round(t_cap,1)}), flush=True)

t0 = time.time()
out = dedup_containment_lsh(spark, sf)
agg = out.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
t_full = time.time() - t0
print(json.dumps({"full_verify_s": round(t_full,1), "rows_by_status": {r.status: r.n for r in agg}}), flush=True)
print("DONE", flush=True)
