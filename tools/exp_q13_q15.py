"""q13 (left join + agg) and q15 (anti join) pushdown variants at 400x.

- q13 stock left-joins 15k customers to 60M orders and aggregates AFTER the
  join, shuffling the fact at order grain. Variant: aggregate orders by
  o_custkey FIRST (map-side combine collapses 60M rows to <=15k partials),
  then LEFT-join customer to the aggregate — exact because (c_custkey,
  c_name) is functionally dependent on the join key and count(o_orderkey)
  == per-custkey count(*) (o_orderkey is never null).
- q15 stock anti-joins customer against raw 60M-row orders (the build side
  can't broadcast, so the fact shuffles). Variant: the anti-join only needs
  DISTINCT o_custkey — pre-distinct to <=15k keys, then the anti-join
  broadcasts.

Usage: python tools/exp_q13_q15.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.relational import (
    dsum,
    q13_left_join,
    q15_anti_join,
)


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def q13_preagg(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    oa = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("pn"),
        dsum(F.col("o_totalprice"), 2).alias("psum"),
    )
    return (
        c.join(oa, c.c_custkey == oa.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("pn"), F.lit(0).cast("long")).alias("n_orders"),
            F.coalesce(F.col("psum"), F.lit(0.0)).alias("total_spent"),
        )
    )


def q15_predistinct(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ok = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey").distinct()
    return c.join(ok, c.c_custkey == ok.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q13_q15", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    pairs = {
        "q13": (q13_left_join, q13_preagg),
        "q15": (q15_anti_join, q15_predistinct),
    }
    out_json = {}
    for name, (stock, variant) in pairs.items():
        _, v_stock = t(stock, spark, out)
        _, v_var = t(variant, spark, out)
        runs = {"stock": [], "variant": []}
        for _ in range(3):
            runs["stock"].append(t(stock, spark, out)[0])
            runs["variant"].append(t(variant, spark, out)[0])
        out_json[name] = {
            **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
            "values_match": v_stock == v_var,
        }
    print(json.dumps({**out_json, "factor": factor}))


if __name__ == "__main__":
    main()
