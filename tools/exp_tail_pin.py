"""Within-run litigation of the remaining never-litigated >=2x tail rows.

Every 400x work-dominated row >=2x has either an adopted plan wave or a
pinned regime note — except this tail: q40/q41/q47 (HTML/regex extraction),
q88 (PII regexp_replace), q127/q128/q132/q137 (broadcast-planned TPC-H
shapes with no fact-fact shuffle). For each, this harness measures 3
alternated within-run reps of the stock Spark plan and 3 warm DuckDB reps
of the oracle in ONE process, so the pair shares an epoch (the q81/q106
lesson: cross-session ratios move more than most plan effects).

The goal is a named-regime pin, not a wave: each of these plans is already
the shape we'd pick at 100 TB (single scan, broadcast dims, partial aggs);
the residual ratio is per-row expression cost (Java regex / codegen
arithmetic vs DuckDB's vectorized RE2 / HUGEINT) at a toy 1-3s scale.

MEASURED (r11 session 3, 400x, shared-epoch within-run best/best):
q40 3.17x (5.285/1.669 s), q41 5.11x (2.650/0.519), q47 3.28x
(12.953/3.946), q88 2.47x (24.445/9.898), q127 2.51x, q128 2.49x,
q132 2.18x, q137 2.11x. Pinned as theorized: per-row Java-regex floor
(q40/q41/q47/q88 — single scan, <=1 exchange, no join) and
broadcast-planned codegen-floor TPC-H shapes (q127/q128/q132/q137).
No variant to adopt.

Usage: python tools/exp_tail_pin.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.catalog import all_queries

TARGETS = [
    "q40_html_categories",
    "q41_html_last_edited",
    "q47_sanitize_filename",
    "q88_pii_redaction",
    "q127_top_supplier",
    "q128_small_qty_revenue",
    "q132_min_cost_supplier",
    "q137_potential_promotion",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    qs = all_queries()
    spark = get_spark("exp_tail_pin", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    results = {}
    for name in TARGETS:
        qd = qs[name]
        # warmup both engines once, then 3 alternated timed reps each
        qd.fn(spark, out).collect()
        con.execute(qd.oracle).fetchall()
        s_runs, d_runs = [], []
        for _ in range(3):
            t0 = time.time()
            qd.fn(spark, out).collect()
            s_runs.append(round(time.time() - t0, 3))
            t0 = time.time()
            con.execute(qd.oracle).fetchall()
            d_runs.append(round(time.time() - t0, 3))
        results[name] = {
            "spark_runs": s_runs,
            "duckdb_runs": d_runs,
            "ratio_best": round(min(s_runs) / min(d_runs), 2),
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"factor": factor, "results": results}))


if __name__ == "__main__":
    main()
