"""q32_date_funcs decimal-fold decomposition (follow-on from the q108
finding: per-row DECIMAL arithmetic, not the scan, was 87-90% of q108's
wall — r11's q32 "scan floor" pin tested date-math variants but never the
decimal fold itself).

Arms, alternated 3× in ONE session at 400× (fresh DataFrames each rep so
no shuffle reuse):

  A stock      — q32 as shipped: dsum = per-row cast(double →
                 DECIMAL(18,2)) + decimal(28,2) accumulate over 60M rows.
  B double_sum — same plan with sum(double): NOT exact (order-sensitive),
                 measurement-only — isolates the decimal fold's share.
  C long_cents — floor(x*100+0.5) LONG quantization (exact for 2-decimal
                 money), salted LONG partials per (keys,
                 spark_partition_id()), decimal only at the ~|tasks|-row
                 combine, exact decimal→double at the end. Values must be
                 bit-identical to A.

Usage: python tools/exp_q32_decfold.py [outdir=.benchdata/scaled400x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import load_table


def _arms(spark, out):
    o = load_table(spark, out, "orders")
    keys = [F.year("o_orderdate").alias("o_year"), F.month("o_orderdate").alias("o_month")]

    stock = o.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )

    double_sum = o.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("revenue"),
    )

    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    partial = (
        o.select(*keys, cents.alias("c"), F.spark_partition_id().alias("p"))
        .groupBy("o_year", "o_month", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("sc"))
    )
    long_cents = partial.groupBy("o_year", "o_month").agg(
        F.sum("n").alias("n_orders"),
        (F.sum(F.col("sc").cast("decimal(38,0)")) / 100)
        .cast("double")
        .alias("revenue"),
    )
    return {"A_stock": stock, "B_double_sum": double_sum, "C_long_cents": long_cents}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    spark = get_spark("exp_q32_decfold")
    vs = _arms(spark, out)
    ref = sorted(map(tuple, vs["A_stock"].collect()))
    got = sorted(map(tuple, vs["C_long_cents"].collect()))
    assert got == ref, f"C diverged: {got[:3]} vs {ref[:3]}"
    runs = {k: [] for k in vs}
    for _ in range(3):
        for k in runs:
            df = _arms(spark, out)[k]
            spark.sparkContext.setJobDescription(f"q32 {k}")
            t0 = time.perf_counter()
            df.collect()
            runs[k].append(round(time.perf_counter() - t0, 3))
    best = {k: min(v) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "outdir": out,
                "runs": runs,
                "best": best,
                "decimal_fold_share": round(1 - best["B_double_sum"] / best["A_stock"], 3),
                "long_cents_speedup": round(best["A_stock"] / best["C_long_cents"], 3),
                "values_match": True,
            }
        )
    )


if __name__ == "__main__":
    main()
