import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as E
from tests.oracle_utils import duckdb_conn, normalize_rows
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.driver.memory", "6g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
print("entry:", len(E.entry(spark).collect()), flush=True)
con = duckdb_conn("/root/testdata/sf0.1")
bad = []
keys = sys.argv[1:] or list(E.queries().keys())
qs = E.queries(); osql = E.oracle_sql()
for k in keys:
    t0 = time.time()
    try:
        sdf = qs[k](spark, "/root/testdata/sf0.1")
        sql = osql.get(k)
        if not sql:
            print(f"{k} rows-only {sdf.count()} {time.time()-t0:.1f}s", flush=True); continue
        rel = con.sql(sql)
        s = normalize_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        d = normalize_rows(list(rel.columns), rel.fetchall())
        ok = s == d
        if not ok: bad.append(k)
        print(f"{k} {'MATCH' if ok else 'MISMATCH'} {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        bad.append(k)
        print(f"{k} ERROR {type(e).__name__}: {e}", flush=True)
print("BAD:", json.dumps(bad), flush=True)
