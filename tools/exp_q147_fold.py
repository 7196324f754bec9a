"""Fold the q189 bootstrap+attach posture into q147's one-shot row
(VERDICT r11 #3): measure, within ONE session at 400×, the cost of
standing up q147's enrichment answer two ways:

  A replay    — q147 as shipped: ALL history replayed through the
                stateful streaming operator (one-shot micro-batch 0 over
                40M events; the 22.45×/25.27 one_shot_ratio floor in
                BENCH_SCALE_400x).
  B bootstrap — q189's posture: batch-bootstrap the rollup from history
                (one Catalyst join+aggregate), attach the delta as two
                micro-batch merges, serve from the rollup. Same answer
                (shared oracle), hash-compared in-harness.

Also times the warm DuckDB full-recompute oracle in the same process so
all three numbers share one epoch.

Usage: python tools/exp_q147_fold.py [outdir=.benchdata/scaled400x]
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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    qs = all_queries()
    spark = get_spark("exp_q147_fold", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ("events", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, t + '.parquet')}')"
        )

    def run(name):
        t0 = time.perf_counter()
        rows = sorted(map(tuple, qs[name].fn(spark, out).collect()))
        return round(time.perf_counter() - t0, 3), rows

    # value identity first (shared oracle: same answer required)
    _, ra = run("q147_stream_static_enrich")
    _, rb = run("q189_bootstrap_attach_enrich")
    assert ra == rb, f"paths diverged: {ra[:2]} vs {rb[:2]}"
    con.execute(qs["q147_stream_static_enrich"].oracle).fetchall()  # warm

    a_runs, b_runs, d_runs = [], [], []
    for _ in range(3):
        spark.sparkContext.setJobDescription("q147 A: one-shot replay")
        ta, va = run("q147_stream_static_enrich")
        spark.sparkContext.setJobDescription("q147 B: bootstrap+attach (q189 posture)")
        tb, vb = run("q189_bootstrap_attach_enrich")
        assert va == ra and vb == ra
        t0 = time.perf_counter()
        con.execute(qs["q147_stream_static_enrich"].oracle).fetchall()
        d_runs.append(round(time.perf_counter() - t0, 3))
        a_runs.append(ta)
        b_runs.append(tb)
    out_d = {
        "outdir": out,
        "replay_one_shot_runs": a_runs,
        "bootstrap_attach_runs": b_runs,
        "duckdb_runs": d_runs,
        "replay_one_shot_ratio": round(min(a_runs) / min(d_runs), 2),
        "bootstrap_one_shot_ratio": round(min(b_runs) / min(d_runs), 2),
        "bootstrap_vs_replay": round(min(a_runs) / min(b_runs), 2),
        "values_match": True,
    }
    print(json.dumps(out_d))


if __name__ == "__main__":
    main()
