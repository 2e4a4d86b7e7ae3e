"""Streaming fixed-cost audit at sf1 (VERDICT r12 item 6).

Times every registry ``streaming_*`` key at sf0.1 and at the 10×
replica set (tools_gen_sf1.py), records wall + JVM CPU + output rows +
the last micro-batch's state-operator metrics (rows in state, memory
used) via a StreamingQueryListener, and prints ONE JSON document for
BENCH_sf1.json's streaming section.

The claim under test: the 8–21 s sf0.1 walls are per-micro-batch
ENGINE constants (RocksDB open/commit, availableNow planning), not
per-row scaling — so a 10× corpus should move walls far less than 10×.
Any key whose wall ratio approaches the data ratio is flagged.

Usage: python tools_probe_streaming_sf1.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from dbt_json_readr_spark import registry  # noqa: E402
from dbt_json_readr_spark.session import get_spark  # noqa: E402


class _StateCapture(StreamingQueryListener):
    """Keeps the LAST progress event per query name — availableNow
    runs finish before we read it, so 'last' is the final batch."""

    def __init__(self):
        self.last: dict = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        try:
            ops = [
                {
                    "operatorName": so.operatorName,
                    "numRowsTotal": so.numRowsTotal,
                    "numRowsUpdated": so.numRowsUpdated,
                    "memoryUsedBytes": so.memoryUsedBytes,
                }
                for so in (p.stateOperators or [])
            ]
        except Exception:
            ops = []
        self.last[p.name] = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "stateOperators": ops,
        }

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def _jvm_cpu(spark):
    try:
        pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def main():
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    spark = get_spark("stream_sf1_audit")
    spark.sparkContext.setLogLevel("ERROR")
    cap = _StateCapture()
    spark.streams.addListener(cap)

    keys = [k for k in registry.queries() if k.startswith("streaming_")]
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        keys = [k for k in keys if k in only]
    out: dict = {}
    for key in keys:
        fn = registry.queries()[key]
        row: dict = {}
        # sf1 runs FIRST: the per-key cold JIT lands on the sf1 run,
        # biasing the wall ratio UPWARD — conservative for the fixed-
        # cost claim (a ratio << 10 holds a fortiori)
        for label, sf_dir in (("sf1", sf1), ("sf0.1", sf01)):
            cap.last.clear()
            try:
                c0 = _jvm_cpu(spark)
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                wall = round(time.perf_counter() - t0, 3)
                time.sleep(0.7)  # listener events are async
                row[label] = {
                    "wall_s": wall,
                    "cpu_s": round(_jvm_cpu(spark) - c0, 2),
                    "rows": n,
                    "state_last_batch": dict(cap.last),
                }
            except Exception as e:  # noqa: BLE001 — audit must finish
                row[label] = {"error": repr(e)[:200]}
        if "wall_s" in row.get("sf0.1", {}) and "wall_s" in row.get("sf1", {}):
            w0 = max(row["sf0.1"]["wall_s"], 1e-9)
            row["wall_ratio_sf1_vs_sf01"] = round(row["sf1"]["wall_s"] / w0, 2)
        out[key] = row
        print(f"{key:36s} {json.dumps(row.get('sf0.1'))} -> {json.dumps(row.get('sf1'))}",
              file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
