"""Full per-query Spark-vs-DuckDB timing sweep → BENCH_FULL.md.

    python tools/bench_full.py [sf_dir] > BENCH_FULL.md

Times every oracle-checked catalog query on both engines (best of 2) at the
given scale factor. The artifact the perf discussion in BENCH_NOTES.md is
grounded in.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = all_queries()
    spark = get_spark("bench_full")
    con = duckdb.connect()
    con.execute("SET threads TO %d" % (os.cpu_count() or 8))
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # warm both engines
    qs["q05_group_agg"].fn(spark, sf_dir).collect()

    print(f"# BENCH_FULL — all oracle queries at `{sf_dir}`, best of 2 (sec)")
    print()
    print("| query | spark | duckdb | ratio |")
    print("|---|---|---|---|")
    tot_s = tot_d = 0.0
    from wikipediaetl_spark.catalog import _WINDOW_ALIASES

    for name, qd in sorted(qs.items()):
        if qd.oracle is None:
            continue
        if name in _WINDOW_ALIASES:
            # driver-window aliases are byte-identical re-registrations;
            # timing them would double-count their targets in the totals
            continue
        # Arrow on both sides (engine-fair result materialization — see
        # tools/bench_scale._materialize): collect()/fetchall() charge each
        # engine its Python row-object tax instead of its compute
        s = best_of(lambda: qd.fn(spark, sf_dir).toArrow())
        d = best_of(lambda: con.execute(qd.oracle).fetch_arrow_table())
        tot_s += s
        tot_d += d
        print(f"| {name} | {s:.3f} | {d:.3f} | {s / max(d, 1e-9):.1f}x |")
    print(f"| **total** | **{tot_s:.2f}** | **{tot_d:.2f}** | **{tot_s / tot_d:.1f}x** |")


if __name__ == "__main__":
    main()
