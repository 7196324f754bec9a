"""r12 shared-epoch refresh of BENCH_SCALE_400x rows touched this round
(VERDICT r11 #8 plus every query the r12 waves changed).

One process, one epoch: every target runs 3 alternated Spark reps (fresh
DataFrame per rep — rebuilding avoids shuffle-file reuse) against 3 DuckDB
oracle reps over the same 400× fixture, using the CANONICAL methodology of
tools/bench_scale.py so the refreshed rows stay comparable to the rest of
the artifact: Spark materializes via df.toArrow() (columnar, engine-fair —
collect() charges Spark ~2× driver row-conversion on wide results) and
DuckDB uses a fresh connection per rep with fetch_arrow_table(), view
setup excluded from the timed region. The q81/q106 r11 rows carried
epoch-disclaimer notes because their numerator and denominator came from
different epochs; these rows share one.

Writes the measurements to stdout as JSON; tools/annotate-style row
updates are applied to BENCH_SCALE_400x.json by the caller (see
OPTIMIZATION_r12.md).

Usage: python tools/exp_refresh_r12.py [outdir=.benchdata/scaled400x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark

TARGETS = [
    # VERDICT r11 #8: the two rows whose r11 canonical numbers carried
    # epoch-disclaimer notes
    "q81_salted_join",
    "q106_collect_set",
    # r12 adopted waves
    "q108_exact_correlation",
    "q88_pii_redaction",
    "q47_sanitize_filename",
    "q32_date_funcs",
    "q13_left_join",
    "q10_cube",
    "q66_grouping_sets",
    "q18_range_join",
    "q76_conditional_agg",
    "q127_top_supplier",
    # connected-components adaptive doubling host (q83 itself is an
    # excluded-quadratic-under-replication row; q109 carries the cap row)
    "q109_dedup_decision",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    targets = TARGETS
    if os.environ.get("SPARK_GRAFT_REFRESH_QUERIES"):
        targets = os.environ["SPARK_GRAFT_REFRESH_QUERIES"].split(",")
    qs = all_queries()
    spark = get_spark("exp_refresh_r12", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    def duck_rep(sql):
        con = duckdb.connect()  # fresh connection per rep, like bench_scale
        for t in TABLES:
            p = os.path.join(out, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        t0 = time.perf_counter()
        con.execute(sql).fetch_arrow_table()
        dt = time.perf_counter() - t0
        con.close()
        return round(dt, 3)

    def mat(df):
        try:
            df.toArrow()
        except Exception:
            df.collect()

    results = {}
    for name in targets:
        qd = qs[name]
        mat(qd.fn(spark, out))  # warm both engines once
        duck_rep(qd.oracle)
        s_runs, d_runs = [], []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"refresh {name}")
            t0 = time.perf_counter()
            mat(qd.fn(spark, out))
            s_runs.append(round(time.perf_counter() - t0, 3))
            d_runs.append(duck_rep(qd.oracle))
        results[name] = {
            "spark_runs": s_runs,
            "duckdb_runs": d_runs,
            "spark_s": min(s_runs),
            "duckdb_s": min(d_runs),
            "ratio": round(min(s_runs) / min(d_runs), 2),
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"outdir": out, "results": results}))


if __name__ == "__main__":
    main()
