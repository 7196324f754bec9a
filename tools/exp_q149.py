"""q149 Python-state overhead experiments (VERDICT r5 #5).

The q164 JVM twin runs the same semantics at ~4x vs DuckDB while q149
(applyInPandasWithState) sat at 48x — the delta is Arrow round-trip plus
per-group pandas dispatch. Levers measured here, each as the bounded
single-run wall of the q149 dataflow at the scaled fixture:

  base       — the catalog q149 as-is (after any code-level fixes)
  arrow100k  — spark.sql.execution.arrow.maxRecordsPerBatch=100000
  arrow1m    — ... =1000000

Code-level findings feed wikipediaetl_spark/streaming/stateful.py (the
per-group constant-cost discipline documented on _EXACT_OUT_TMPL); conf
findings feed the q149 docstring. Usage:

    python tools/exp_q149.py [factor=400] [reps=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # `python tools/exp_q149.py shards [factor] [reps]` sweeps n_shards
    # (SPARK_GRAFT_Q149_SHARDS) instead of the Arrow-batch confs — the
    # measured points behind the sizing rule documented on
    # running_user_stats_exact_sharded (VERDICT r6 #8).
    mode = "conf"
    args = sys.argv[1:]
    if args and args[0] == "shards":
        mode = "shards"
        args = args[1:]
    factor = int(args[0]) if args else 400
    reps = int(args[1]) if len(args) > 1 else 2
    scaled = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    assert os.path.exists(os.path.join(scaled, "events.parquet"))

    spark = get_spark(
        "exp_q149",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from wikipediaetl_spark.catalog import all_queries

    q149 = all_queries()["q149_stateful_running_stats"].fn
    if mode == "shards":
        # r8 (VERDICT r7 #8): 1024/8192 added around the rule's optimum so
        # the curve has five points, not three-with-a-gap
        for shards in ("512", "1024", "4096", "8192", "32768"):
            os.environ["SPARK_GRAFT_Q149_SHARDS"] = shards
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                q149(spark, scaled).toArrow()
                best = min(best, time.perf_counter() - t0)
            print(f"shards={shards:>6s} {best:7.2f} s")
        os.environ.pop("SPARK_GRAFT_Q149_SHARDS", None)
        return
    variants = [
        ("base", None),
        ("arrow100k", "100000"),
        ("arrow1m", "1000000"),
    ]
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    for name, batch in variants:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", batch or prev
        )
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            q149(spark, scaled).toArrow()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s} {best:7.2f} s")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


if __name__ == "__main__":
    main()
