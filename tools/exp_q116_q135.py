"""Plan-variant experiments for the two worst remaining 400x TPC-H ratios.

q116 (Q4, 6.7x at 400x): the bloom path that won at 100x is out of its
regime at 400x (27M-key build > bloom maxNumItems), so the stock plan
shuffles the full 240M-row pruned lineitem probe. Variant A rewrites the
EXISTS as a per-orderkey max(l_shipdate) pre-aggregate: EXISTS(l.shipdate >
o.orderdate) == max_ship(orderkey) > o_orderdate, with the derived static
filter l_shipdate > window_start pushed to the scan (any witness line must
ship after the earliest windowed orderdate). The aggregate output is
already hash-partitioned on the join key, so the join reuses the exchange
and only the 3.8%-selectivity orders side shuffles.

q135 (Q12, 5.3x at 400x): the stock SHUFFLE_HASH plan still shuffles the
60M-row orders probe. Variant A pre-aggregates the ~2%-filtered lineitem
to (l_orderkey, l_shipmode, cnt) grain and broadcasts it (~5M rows at
400x), so orders never shuffles — scan + broadcast probe + 2-row partial
agg. Variant B keeps the shuffle but pre-aggregates the build.

Usage: python tools/exp_q116_q135.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.relational import q116_priority_checking
from wikipediaetl_spark.operators.tpch import q135_shipping_modes, _with_transport


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), len(rows), sorted(map(tuple, rows))


def q116_maxship(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority").hint("shuffle_hash")
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("max_ship") > F.col("o_orderdate")))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _q135_filtered(spark, sf_dir):
    return _with_transport(spark.read.parquet(f"{sf_dir}/lineitem.parquet")).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_receiptdate") < F.lit("1997-01-01").cast("date"))
    )


def q135_broadcast(spark, sf_dir):
    lig = (
        _q135_filtered(spark, sf_dir)
        .groupBy("l_orderkey", "l_shipmode")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(F.broadcast(lig), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, F.col("cnt")).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, F.col("cnt")).otherwise(0)).alias("low_line_count"),
        )
    )


def q135_preagg_shuffle(spark, sf_dir):
    lig = (
        _q135_filtered(spark, sf_dir)
        .groupBy("l_orderkey", "l_shipmode")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .hint("shuffle_hash")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lig.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, F.col("cnt")).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, F.col("cnt")).otherwise(0)).alias("low_line_count"),
        )
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q116_q135")
    res = {}

    s, n, v_stock = t(q116_priority_checking, spark, out)
    res["q116_stock"] = s
    s2, n2, v_max = t(q116_maxship, spark, out)
    res["q116_maxship"] = s2
    res["q116_match"] = v_stock == v_max
    # second runs (warm)
    res["q116_stock_2"] = t(q116_priority_checking, spark, out)[0]
    res["q116_maxship_2"] = t(q116_maxship, spark, out)[0]

    s, n, v_stock = t(q135_shipping_modes, spark, out)
    res["q135_stock"] = s
    s2, n2, v_b = t(q135_broadcast, spark, out)
    res["q135_broadcast"] = s2
    s3, n3, v_p = t(q135_preagg_shuffle, spark, out)
    res["q135_preagg"] = s3
    res["q135_match"] = v_stock == v_b == v_p
    res["q135_stock_2"] = t(q135_shipping_modes, spark, out)[0]
    res["q135_broadcast_2"] = t(q135_broadcast, spark, out)[0]
    res["q135_preagg_2"] = t(q135_preagg_shuffle, spark, out)[0]

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
