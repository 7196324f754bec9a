"""q12 AQE skew-split within-run A/B (OPTIMIZATION_r11 "not yet" #1 residual).

The skewJoin confs are runtime-settable SQL confs, so unlike the codec/
local-dir matrix in exp_q12.py this alternates stock vs skew-tuned INSIDE
one Spark session — the only citable comparison on this box (epoch rule).

Variant confs (restored to session defaults between reps):
  spark.sql.adaptive.forceOptimizeSkewedJoin=true
  spark.sql.adaptive.skewJoin.skewedPartitionFactor=2
  spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes=32m
  spark.sql.adaptive.advisoryPartitionSizeInBytes=16m

Usage: python tools/exp_q12_skew_ab.py [scaled_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TUNED = {
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
        32 * 1024 * 1024
    ),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 * 1024 * 1024),
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    from wikipediaetl_spark.catalog import all_queries
    from wikipediaetl_spark.session import get_spark

    spark = get_spark(
        "exp_q12_skew_ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()  # warm
    fn = lambda: qs["q12_fact_fact_join"].fn(spark, out)
    defaults = {k: spark.conf.get(k, None) for k in TUNED}

    def set_confs(d):
        for k, v in d.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    results: dict[str, list[float]] = {"stock": [], "tuned": []}
    values: dict[str, object] = {}
    for rep in range(3):
        for name, confs in (("stock", defaults), ("tuned", TUNED)):
            set_confs(confs)
            spark.sparkContext.setJobDescription(f"q12_skew_ab {name} rep{rep}")
            t0 = time.perf_counter()
            tbl = fn().toArrow()
            results[name].append(time.perf_counter() - t0)
            values[name] = sorted(map(tuple, tbl.to_pylist()[0].items())) and sorted(
                tuple(sorted(r.items())) for r in tbl.to_pylist()
            )
    set_confs(defaults)
    match = values["stock"] == values["tuned"]
    print(f"values_match {match}", flush=True)
    for name, walls in results.items():
        print(
            f"RESULT {name} best {min(walls):.3f} reps "
            + "/".join(f"{w:.2f}" for w in walls),
            flush=True,
        )
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
