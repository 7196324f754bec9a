"""Focused 400x measurement of the q176 star answer-grain MV rung
(VERDICT r8 #6: pull q11's rollup rung — 2.22x at 400x — under the 2x gate
with the q173 answer-grain discipline, or pin it).

Runs only: stock q11 / q176 MV build / MV serve / DuckDB denominator over
the scaled fixture, plus the q01 canary for epoch comparability, and
PATCHES the mv_* keys into the committed BENCH_BUCKETED_400x.json's
q11_star_join entry (the rest of that artifact is r8's full run; the mv row
records its own canary so ratios stay within-run citable).

Usage: python tools/exp_q176.py [factor=400]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark

from tools.bench_bucketed import best_of, build_q176_layout, serve_q176
from tools.bench_scale import build_scaled, time_duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    rows = build_scaled(out, factor)
    spark = get_spark(
        "exp_q176",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()  # warm
    canary = best_of(lambda: qs["q01_pricing_summary"].fn(spark, out))

    stock_s = best_of(lambda: qs["q11_star_join"].fn(spark, out))
    t0 = time.perf_counter()
    build_q176_layout(spark, out)
    build_s = time.perf_counter() - t0
    mv_rows = sorted(map(tuple, serve_q176(spark, out).collect()))
    stock_rows = sorted(map(tuple, qs["q11_star_join"].fn(spark, out).collect()))
    assert mv_rows == stock_rows, "q176 MV must match stock q11 exactly"
    serve_s = best_of(lambda: serve_q176(spark, out))
    dd = time_duckdb(out, qs["q11_star_join"].oracle)

    res = {
        "factor": factor,
        "rows": rows,
        "q01_canary_s": round(canary, 3),
        "stock_spark_s": round(stock_s, 3),
        "mv_build_s": round(build_s, 1),
        "mv_spark_s": round(serve_s, 3),
        "duckdb_s": round(dd, 3),
        "stock_ratio": round(stock_s / dd, 2),
        "mv_ratio": round(serve_s / dd, 2),
        "mv_exact_match": True,
        "mv_path": "q176_region_nation_year_mv",
    }
    print(json.dumps(res))

    art = os.path.join(REPO, f"BENCH_BUCKETED_{factor}x.json")
    if os.path.exists(art):
        with open(art) as f:
            payload = json.load(f)
        payload["queries"]["q11_star_join"].update(
            {
                "mv_spark_s": res["mv_spark_s"],
                "mv_ratio": res["mv_ratio"],
                "mv_build_s": res["mv_build_s"],
                "mv_exact_match": True,
                "mv_path": res["mv_path"],
                "mv_session_note": "mv_* measured in a separate r9 session "
                f"(tools/exp_q176.py, q01 canary {res['q01_canary_s']} s, own "
                f"duckdb denominator {res['duckdb_s']} s -> mv_ratio is "
                "within-run); other keys are the r8 full run",
            }
        )
        with open(art, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"patched {art}")


if __name__ == "__main__":
    main()
