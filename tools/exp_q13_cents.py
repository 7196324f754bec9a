"""Within-run A/B: q13's per-custkey partial folds BIGINT cents instead of
DECIMAL(18,2) (the q32/q108 r12 finding: per-row decimal accumulates, not
scans, dominate these aggregates).

Arm A = verbatim replica of the r11 q13 (decimal partial); arm B = the
catalog q13 (long-cents partial). Alternated 3× in ONE session at 400×,
fresh DataFrames each rep (no shuffle reuse), values asserted identical.

Usage: python tools/exp_q13_cents.py [outdir=.benchdata/scaled400x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import load_table


def _q13_r11(spark, out):
    """Verbatim replica of the r11 q13 (commit 2e4f203)."""
    c = load_table(spark, out, "customer")
    o = load_table(spark, out, "orders")
    oa = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("psum"),
    )
    return c.join(oa, c.c_custkey == oa.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("pn"), F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce(F.col("psum"), F.lit(0.0)).alias("total_spent"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    qs = all_queries()
    spark = get_spark("exp_q13_cents")
    ref = sorted(map(tuple, _q13_r11(spark, out).collect()))
    got = sorted(map(tuple, qs["q13_left_join"].fn(spark, out).collect()))
    assert got == ref, "arms diverged"
    runs = {"A_decimal_partial": [], "B_cents_partial": []}
    for _ in range(3):
        spark.sparkContext.setJobDescription("q13 A: decimal partial (r11)")
        t0 = time.perf_counter()
        _q13_r11(spark, out).write.format("noop").mode("overwrite").save()
        runs["A_decimal_partial"].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription("q13 B: long-cents partial (r12)")
        t0 = time.perf_counter()
        qs["q13_left_join"].fn(spark, out).write.format("noop").mode("overwrite").save()
        runs["B_cents_partial"].append(round(time.perf_counter() - t0, 3))
    best = {k: min(v) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "outdir": out,
                "runs": runs,
                "best": best,
                "speedup_best": round(
                    best["A_decimal_partial"] / best["B_cents_partial"], 3
                ),
                "values_match": True,
            }
        )
    )


if __name__ == "__main__":
    main()
