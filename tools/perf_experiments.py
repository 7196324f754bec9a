"""One-off perf experiments at the scaled fixture (not part of the test suite).

Usage: python tools/perf_experiments.py [scaled_dir=.benchdata/scaled100x]

Times variants of the worst-ratio BENCH_SCALE queries so plan changes are
measured, not guessed:
  q12: current plan vs partial-agg-below-join vs shuffled-hash-join conf
  q11: DECIMAL sum vs cents-packed BIGINT sum
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.operators.relational import dsum
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import load_table


def bench(label, thunk, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk().collect()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:7.3f}s")
    return best


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled100x"
    spark = get_spark(
        "perf_exp",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = all_queries()
    # warm
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()

    bench("q12 current", lambda: qs["q12_fact_fact_join"].fn(spark, out))

    def q12_preagg():
        li = load_table(spark, out, "lineitem")
        o = load_table(spark, out, "orders").filter(F.col("o_orderstatus") == "F")
        per_order = li.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("pn"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("prev"),
        )
        return (
            per_order.join(o, per_order.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum("pn").alias("n_lines"),
                F.sum("prev").alias("revenue"),
            )
        )

    bench("q12 preagg-below-join", q12_preagg)

    def q12_cents():
        li = load_table(spark, out, "lineitem")
        o = load_table(spark, out, "orders").filter(F.col("o_orderstatus") == "F")
        micros = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6 + F.lit(0.5)
        ).cast("long")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                (F.sum(micros) / 1e6).alias("revenue"),
            )
        )

    bench("q12 cents-packed sum", q12_cents)

    bench("q11 current", lambda: qs["q11_star_join"].fn(spark, out))

    def q11_cents():
        o = load_table(spark, out, "orders")
        c = load_table(spark, out, "customer")
        n = load_table(spark, out, "nation")
        r = load_table(spark, out, "region")
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                (F.sum(cents) / 100.0).alias("revenue"),
            )
        )

    bench("q11 cents-packed sum", q11_cents)


if __name__ == "__main__":
    main()
