"""q98 (TPC-H Q3) plan variant at 400x: per-orderkey pre-aggregation.

The stock r7 plan streams the 134M-row shipdate-filtered lineitem side
against the ~5.5M-row customer-orders SHUFFLE_HASH build and aggregates
AFTER the join. Variant: aggregate vu by l_orderkey BEFORE the join —
same-order lines are file-adjacent in the generated parquet, so the
map-side partial collapses ~4:1 before any bytes move, and the aggregate
output is already hash-partitioned on the join key, so the join reuses the
exchange (only the c-o build shuffles again).

Usage: python tools/exp_q98.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.relational import q98_shipping_priority


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def q98_preagg(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
    lig = (
        li.select(
            "l_orderkey",
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    + F.lit(0.5)).cast("long").alias("vu"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("vu").alias("svu"))
    )
    co = c.join(o, c.c_custkey == o.o_custkey).hint("shuffle_hash")
    return (
        lig.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            (F.col("svu").cast("decimal(38,0)") / 10000).cast("double")
            .alias("revenue"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q98", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    variants = {"q98_stock": q98_shipping_priority, "q98_preagg": q98_preagg}
    vals, runs = {}, {k: [] for k in variants}
    for k, fn in variants.items():
        _, vals[k] = t(fn, spark, out)           # warmup + value capture
    for _ in range(3):
        for k, fn in variants.items():
            runs[k].append(t(fn, spark, out)[0])
    print(json.dumps({
        **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
        "match": vals["q98_stock"] == vals["q98_preagg"],
    }, indent=1))


if __name__ == "__main__":
    main()
