"""Within-run A/B for the r12 decimal-fold wave (the q32/q108 finding:
per-row DECIMAL cast+accumulate — BigDecimal object arithmetic — dominates
these aggregates, not the scan).

For each target, arm A is a verbatim replica of the r11 implementation
(commit 2e4f203, per-row decimal fold) and arm B is the r12 catalog query
(exact BIGINT cents / 1e-4-unit LONG fold in codegen, decimal only at the
tiny combine). Arms alternate 3× in ONE session at 400×, DataFrames
rebuilt each rep (no shuffle-file reuse), values asserted identical.

Targets: q10_cube, q66_grouping_sets, q18_range_join, q76_conditional_agg,
q81_salted_join, q127_top_supplier. (q32/q13 have their own harnesses:
exp_q32_decfold.py / exp_q13_cents.py; q108 in exp_q108_floor.py.)

Usage: python tools/exp_decfold_wave.py [outdir=.benchdata/scaled400x]
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


def _q10_r11(spark, out):
    o = load_table(spark, out, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("prev"),
    )
    return base.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum("pn").alias("n"),
        F.sum("prev").cast("double").alias("revenue"),
    )


def _q66_r11(spark, out):
    o = load_table(spark, out, "orders")
    o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("prev"),
    ).createOrReplaceTempView("v_orders_gs_r11")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               sum(pn) AS n,
               CAST(sum(prev) AS DOUBLE) AS revenue
        FROM v_orders_gs_r11
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _q18_r11(spark, out):
    from wikipediaetl_spark.operators.relational import PRICE_BANDS

    o = load_table(spark, out, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def _q76_r11(spark, out):
    o = load_table(spark, out, "orders")
    return o.groupBy("o_custkey").agg(
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("urgent_spend"),
    )


def _q81_r11(spark, out):
    e = load_table(spark, out, "events")
    c = load_table(spark, out, "customer")
    n = load_table(spark, out, "nation")
    partial = (
        e.withColumn("salt", F.pmod(F.spark_partition_id().cast("bigint"), F.lit(8)))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pc"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
        )
    )
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_name"
    )
    return (
        partial.join(F.broadcast(dim), partial.user_id == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum("pc").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
    )


def _q127_r11(spark, out):
    li = load_table(spark, out, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, out, "supplier").select("s_suppkey", "s_name")
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
    return s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


REPLICAS = {
    "q10_cube": _q10_r11,
    "q66_grouping_sets": _q66_r11,
    "q18_range_join": _q18_r11,
    "q76_conditional_agg": _q76_r11,
    "q81_salted_join": _q81_r11,
    "q127_top_supplier": _q127_r11,
}


def _skey(t):
    return tuple((v is None, str(v)) for v in t)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    qs = all_queries()
    spark = get_spark("exp_decfold_wave")
    results = {}
    for name, replica in REPLICAS.items():
        ref = sorted(map(tuple, replica(spark, out).collect()), key=_skey)
        got = sorted(map(tuple, qs[name].fn(spark, out).collect()), key=_skey)
        assert got == ref, f"{name} diverged"
        a_runs, b_runs = [], []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"{name} A: decimal fold (r11)")
            t0 = time.perf_counter()
            replica(spark, out).write.format("noop").mode("overwrite").save()
            a_runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name} B: long fold (r12)")
            t0 = time.perf_counter()
            qs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
            b_runs.append(round(time.perf_counter() - t0, 3))
        results[name] = {
            "decimal_runs": a_runs,
            "long_runs": b_runs,
            "speedup_best": round(min(a_runs) / min(b_runs), 3),
            "values_match": True,
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"outdir": out, "results": results}))


if __name__ == "__main__":
    main()
