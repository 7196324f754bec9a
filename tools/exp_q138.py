"""q138 (TPC-H Q21 shape) 400x adjudication — VERDICT r9 #3.

q138 has read 6.69x at 400x for two rounds with a sound single-pass
profile-aggregate plan (both correlated EXISTS collapsed into one
(orderkey, suppkey)-grain aggregate; lineitem scanned once). r8 claimed
the ratio is mostly DuckDB's page-cached denominator; this experiment
adjudicates WITHIN ONE SESSION:

- DuckDB oracle: per-rep timings (rep 1 = cold file cache relative to this
  process, reps 2-3 = warm) — the warm/cold denominator spread IS the
  page-cache artifact claim, measured not asserted;
- Spark stock q138: best-of-2 (rep 2 = warm JVM + OS cache, the honest
  same-treatment numerator);
- variant A (semi-reduce): lineitem semi-joined to the 'F'-status order
  keys BEFORE the grain aggregate — halves the aggregate's input (~48.6%
  of orders are 'F'-status); the semi-join shuffles on l_orderkey, the
  same key the aggregate needs, so EnsureRequirements inserts no second
  exchange (HashPartitioning(a) satisfies ClusteredDistribution([a,b]))
  and the l1-side f_orders join disappears;
- variant B: stock plan under Spark's runtime bloom-filter injection with
  the creation-side threshold raised to admit the 27M-key 'F'-orders
  build (the q116 lesson: default thresholds reject it).

Usage: python tools/exp_q138.py [factor=400] [outdir]
Writes BENCH_Q138_ADJUDICATION.json.
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
from wikipediaetl_spark.operators.tpch import _with_transport
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def q138_semireduce(spark, out):
    li = _with_transport(spark.read.parquet(f"{out}/lineitem.parquet")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_receiptdate") > F.col("l_commitdate")).alias("late"),
    )
    f_orders = (
        spark.read.parquet(f"{out}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li_f = li.join(
        f_orders.hint("shuffle_hash"),
        li.l_orderkey == f_orders.o_orderkey,
        "left_semi",
    )
    per_supp = li_f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("supp_late"),
        F.sum(F.col("late").cast("long")).alias("n_late_lines"),
    )
    profile = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("supp_late").alias("n_late_supps"),
    )
    l1 = (
        per_supp.filter(F.col("supp_late") == 1)
        .join(profile, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    s = spark.read.parquet(f"{out}/supplier.parquet").select("s_suppkey", "s_name")
    return (
        l1.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )


def _mat(df):
    try:
        df.toArrow()
    except Exception:
        df.collect()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    )
    qs = all_queries()
    oracle = qs["q138_waiting_suppliers"].oracle

    # DuckDB: per-rep timings in one process — rep-to-rep delta is the
    # OS-page-cache effect on the denominator
    duck_reps = []
    for _ in range(3):
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
            )
        t0 = time.perf_counter()
        con.execute(oracle).fetch_arrow_table()
        duck_reps.append(round(time.perf_counter() - t0, 3))
        con.close()
    print(f"## duckdb reps: {duck_reps}", file=sys.stderr, flush=True)

    spark = get_spark(
        "exp_q138",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.1").collect()  # warm JVM

    variants = {}

    def run(name, fn, reps=2):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _mat(fn())
            per.append(round(time.perf_counter() - t0, 3))
        variants[name] = {"reps": per, "best": min(per)}
        print(f"## {name}: {per}", file=sys.stderr, flush=True)

    run("stock", lambda: qs["q138_waiting_suppliers"].fn(spark, out))
    run("semireduce", lambda: q138_semireduce(spark, out))

    # variant B: runtime bloom with the build-side caps raised
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "4GB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", str(64_000_000)
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", str(1_073_741_824)
    )
    try:
        run("stock_bloom", lambda: qs["q138_waiting_suppliers"].fn(spark, out))
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    # correctness cross-check of the variant against stock
    a = sorted(map(tuple, q138_semireduce(spark, out).collect()))
    b = sorted(map(tuple, qs["q138_waiting_suppliers"].fn(spark, out).collect()))
    assert a == b, "semireduce variant diverges from stock"

    duck_warm = min(duck_reps[1:])
    payload = {
        "factor": factor,
        "duckdb_reps_s": duck_reps,
        "duckdb_cold_s": duck_reps[0],
        "duckdb_warm_s": duck_warm,
        "spark": variants,
        "ratio_stock_vs_warm": round(variants["stock"]["best"] / duck_warm, 2),
        "ratio_best_variant_vs_warm": round(
            min(v["best"] for v in variants.values()) / duck_warm, 2
        ),
        "variant_rows_match": True,
    }
    print(json.dumps(payload))
    with open(os.path.join(REPO, "BENCH_Q138_ADJUDICATION.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
