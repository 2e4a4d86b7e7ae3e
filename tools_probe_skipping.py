"""Scale probe for stats-based file skipping (r8, VERDICT r7 item 2).

Builds a Delta table over the sf10 soak lineitem (~60M rows) under
/tmp: range-laid-out on l_orderkey into ~64 files, one commit whose
adds carry REAL per-file stats (min/max/nullCount read back from the
parquet footers — the same stats a production Delta writer records).
Then measures a selective predicate two ways:

  pruned   — read_delta_snapshot(predicate=...): files drop from the
             scan list BEFORE spark.read
  unpruned — read_delta_snapshot() + the same row filter: Spark opens
             every file (parquet row-group stats still help, but every
             footer/first-page is touched)

Prints ONE JSON line with files/bytes/rows/wall-times.  Usage:

  python tools_probe_skipping.py [src_dir] [dest_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_json_readr_spark.session import get_spark  # noqa: E402
from dbt_json_readr_spark.sources import lakeformats as LF  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
DEST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_delta_skip"
N_FILES = 64


def build(spark) -> None:
    import pyarrow.parquet as pq

    if os.path.isdir(os.path.join(DEST, "_delta_log")):
        return
    df = spark.read.parquet(os.path.join(SRC, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    (
        df.repartitionByRange(N_FILES, "l_orderkey")
        .write.mode("overwrite")
        .parquet(DEST)
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "skip-probe",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": n, "type": t, "nullable": True, "metadata": {}}
                            for n, t in [
                                ("l_orderkey", "long"),
                                ("l_partkey", "long"),
                                ("l_quantity", "double"),
                                ("l_extendedprice", "double"),
                                ("l_shipdate", "date"),
                            ]
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    for name in sorted(os.listdir(DEST)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(DEST, name))
        lo, hi, nrows = None, None, md.num_rows
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_orderkey
            st = col.statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        add = {
            "path": name,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(DEST, name)),
            "modificationTime": 0,
            "dataChange": True,
        }
        if lo is not None:
            add["stats"] = json.dumps(
                {
                    "numRecords": nrows,
                    "minValues": {"l_orderkey": int(lo)},
                    "maxValues": {"l_orderkey": int(hi)},
                    "nullCount": {"l_orderkey": 0},
                }
            )
        actions.append({"add": add})
    log = os.path.join(DEST, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    snap = LF.delta_snapshot(DEST)
    maxes = [
        json.loads(f["stats"]).get("maxValues", {}).get("l_orderkey")
        for f in snap["files"]
        if f.get("stats")
    ]
    maxes = [m for m in maxes if m is not None]
    if not maxes:
        raise SystemExit("no file carries l_orderkey stats — nothing to probe")
    hi_key = max(maxes)
    # a ~1/64 selective range in the middle of the key space
    lo_v, hi_v = int(hi_key * 0.50), int(hi_key * 0.515)
    pred = [("l_orderkey", ">=", lo_v), ("l_orderkey", "<", hi_v)]
    from dbt_json_readr_spark.sources import skipping as S

    out = {"files_total": len(snap["files"])}
    kept, skipped = LF.prune_delta_files(snap, pred)
    out["files_kept"] = len(kept)
    results = {}
    for label in ("pruned", "unpruned", "pruned2", "unpruned2"):
        t0 = time.time()
        if label.startswith("pruned"):
            df = LF.read_delta_snapshot(spark, DEST, predicate=pred)
        else:
            df = LF.read_delta_snapshot(spark, DEST).filter(
                S.predicate_column(pred)
            )
        agg = df.groupBy().agg({"l_extendedprice": "sum", "*": "count"})
        row = agg.collect()[0]
        results[label] = {
            "sec": round(time.time() - t0, 3),
            "rows": row[1] if isinstance(row[1], int) else row[0],
            "files_scanned": len(df.inputFiles()),
        }
    out["runs"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
