"""Stage-level profile of stock q12 at the scaled fixture: run once, then
dump per-stage wall, task time, GC, shuffle bytes from the UI REST API."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    parts = sys.argv[2] if len(sys.argv) > 2 else "64"
    spark = get_spark(
        "exp_q12_profile",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "true",
            "spark.sql.shuffle.partitions": parts,
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()
    qname = os.environ.get("PROFILE_QUERY", "q12_fact_fact_join")
    fn = lambda: qs[qname].fn(spark, out)
    t0 = time.perf_counter()
    fn().toArrow()
    wall = time.perf_counter() - t0
    print(f"WALL {wall:.3f}")
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    for s in sorted(stages, key=lambda s: s["stageId"]):
        print(
            f"stage {s['stageId']:3d} tasks={s['numCompleteTasks']:4d} "
            f"exec_ms={s['executorRunTime']:>9} cpu_ms={s['executorCpuTime']//1_000_000:>9} "
            f"gc_ms={s['jvmGcTime']:>7} "
            f"sh_read={s['shuffleReadBytes']//(1<<20):>6}M sh_write={s['shuffleWriteBytes']//(1<<20):>6}M "
            f"in={s['inputBytes']//(1<<20):>7}M  {s['name'][:60]}"
        )


if __name__ == "__main__":
    main()
