"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) on local[$SPARK_GRAFT_CPUS].
Timings are end-to-end per query: plan + optimize + execute + fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark

# Headline set: one per operator family, weighted toward the scale-relevant
# shapes (agg, fact-fact join, window, as-of, dedup self-join, ANN, streaming).
HEADLINE = [
    "q01_pricing_summary",
    "q04_orderby_limit",
    "q11_star_join",
    "q12_fact_fact_join",
    "q13_left_join",
    "q19_asof_join",
    "q20_window_topk",
    "q29_json_extract",
    "q37_tumbling_window",
    "q38_bfs_reachability",
    "q44_category_distribution",
    "q51_hash_dedup",
    "q53_shingle_neardup",
    "q57_cosine_topk",
    "q63_fingerprint",
    "q67_tfidf_top_terms",
    "q83_neardup_clusters",
    "q86_decontamination",
    "q90_sequence_packing",
    "q148_pipeline_capstone",
]


def _first_touch_probe_sec(mb: int = 512) -> float:
    """Machine-epoch probe (VERDICT r11 #1): seconds to allocate and
    first-touch `mb` MiB of fresh anonymous memory, measured BEFORE the
    Spark session exists. On this VM class (lazy snapshot restore +
    virtio-balloon free-page reporting, mechanism pinned in BENCH_NOTES
    r11 session 4) the first touch of a fresh page round-trips to the
    VMM, so a degraded epoch reads 10-100× slower than a clean one
    (measured: 2 GiB at 0.22 s held-retouch vs 41 s degraded fresh).
    Emitted as an extra JSON key so the headline artifact is
    self-adjudicating: readers separate engine movement from epoch
    movement without cross-referencing prose. Purely additive — the
    timed queries, their names and the methodology are unchanged."""
    n = mb << 20
    t0 = time.perf_counter()
    buf = bytearray(n)  # zero-fill touches every page
    for i in range(0, n, 4096):  # belt-and-braces: explicit write per page
        buf[i] = 1
    dt = time.perf_counter() - t0
    del buf
    return round(dt, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    probe_sec = _first_touch_probe_sec()
    spark = get_spark("bench")
    qs = all_queries()

    # JVM/codegen warm-up on the smallest fixture so timings measure the
    # engine, not first-call class loading.
    warm = sf_dir.replace("sf0.1", "sf0.001") if "sf0.1" in sf_dir else sf_dir
    try:
        qs["q01_pricing_summary"].fn(spark, warm).collect()
    except Exception:
        pass

    # best-of-3, round-robin: the whole suite runs three times and each
    # query keeps its minimum. Round-robin (vs back-to-back reps) decouples
    # a query's two samples by ~20s, so a transient GC pause or OS cache
    # eviction can't poison both — back-to-back best-of-2 showed ±50%
    # swings on individual queries between otherwise identical runs.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings = {name: float("inf") for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            qd = qs[name]
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).collect()
            timings[name] = min(timings[name], time.perf_counter() - t0)
    timings = {name: round(v, 3) for name, v in timings.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # self-documenting methodology (VERDICT r9 #7): the per-round
                # artifact IS best-of-N round-robin — visible in the JSON, not
                # just in this file's history
                "reps": reps,
                "methodology": f"best-of-{reps} round-robin per query",
                # epoch self-adjudication (VERDICT r11 #1), ADDITIVE keys:
                # q01 is the canary the r10/r11 adjudications already used
                # (its best-of-N moves with the machine epoch, not the
                # engine — it is untouched since r4); the probe is raw
                # first-touch page-fault bandwidth before the suite ran.
                "canary_q01_sec": timings["q01_pricing_summary"],
                "first_touch_probe_mb": 512,
                "first_touch_probe_sec": probe_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
