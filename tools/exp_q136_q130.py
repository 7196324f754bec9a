"""Same-session A/B for VERDICT r8 #3: q136 plan rewrite and q130 fixed-cost
decomposition at 400x.

Epochs on this box drift ~3x (BENCH_NOTES), so cross-run walls are not
citable — this experiment runs OLD and NEW q136 plans, the q130 stage
decomposition, and fresh DuckDB denominators inside ONE session with the
q01 canary recorded, exactly the methodology the r6-r8 plan waves used.

    python tools/exp_q136_q130.py [factor=400]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.operators.tpch import _partsupp, _t
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q136_old(spark, sf_dir):
    """r8 form: synthesized partsupp (full-fact (partkey,suppkey) groupBy)
    before the part filter — the plan the rewrite replaces."""
    ps = _partsupp(spark, sf_dir)
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 100.0).select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(excluded), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        f"scaled{factor}x",
    )
    spark = get_spark(
        "exp_q136_q130",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = all_queries()
    canary = best_of(lambda: qs["q01_pricing_summary"].fn(spark, BASE).collect(), 2)

    res: dict = {"factor": factor, "q01_canary_s": canary}
    # --- q136: old vs new plan, same session
    res["q136_old_s"] = best_of(lambda: q136_old(spark, out).toArrow())
    res["q136_new_s"] = best_of(
        lambda: qs["q136_parts_supplier_relationship"].fn(spark, out).toArrow()
    )
    # --- q130: wall + stage decomposition (each stage materialized alone)
    res["q130_s"] = best_of(lambda: qs["q130_sales_opportunity"].fn(spark, out).toArrow())
    c = _t(spark, out, "customer")
    res["q130_stage_avg_s"] = best_of(
        lambda: c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
        .collect()
    )
    o = (
        _t(spark, out, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    res["q130_stage_orders_distinct_s"] = best_of(lambda: o.count())
    res["q130_stage_noop_job_s"] = best_of(
        lambda: spark.range(1).collect()
    )  # pure scheduler floor

    # --- fresh DuckDB denominators (same process, same files)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')")
    for key, qname in (("q136", "q136_parts_supplier_relationship"), ("q130", "q130_sales_opportunity")):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(qs[qname].oracle).fetch_arrow_table()
            best = min(best, time.perf_counter() - t0)
        res[f"{key}_duckdb_s"] = round(best, 3)
    res["q136_old_ratio"] = round(res["q136_old_s"] / res["q136_duckdb_s"], 2)
    res["q136_new_ratio"] = round(res["q136_new_s"] / res["q136_duckdb_s"], 2)
    res["q130_ratio"] = round(res["q130_s"] / res["q130_duckdb_s"], 2)
    print(json.dumps(res, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
