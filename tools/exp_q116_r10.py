"""q116 (TPC-H Q4) stock-plan wave at 400x — VERDICT r9 #4.

The rung (q170, 1.97x) covers the serving story; the STOCK plan read
6.38x because the left-semi shuffles the full 240M-row lineitem probe
against the 2.3M-row 3-month orders build (shuffle_hash), and the
maintained max-shipdate rewrite measured NEGATIVE per-query (r8). Two
plan levers that keep the stock one-shot contract:

- A (pushdown): the EXISTS witness needs l_shipdate > o_orderdate and
  every windowed order has o_orderdate >= window start, so the STATIC
  filter l_shipdate > '1997-01-01' is implied — it reaches the parquet
  scan and drops ~2/3 of the probe before anything else.
- B (broadcast flip + pushdown): broadcast the 2.3M-row orders window as
  the INNER-join build so lineitem never shuffles at all; the 240M scan
  reduces via the join, then a partial-distinct on (o_orderkey,
  o_orderpriority) — map-side combine caps the shuffle at the matched
  key set (<=2.3M rows), and the final priority count is 5 rows.
  (BroadcastHashJoin LeftSemi needs BuildRight = the probe side, so the
  semi form cannot broadcast the orders side — the inner+distinct
  rewrite is the broadcastable encoding of the same EXISTS.)

Usage: python tools/exp_q116_r10.py [factor=400] [outdir]
Writes BENCH_Q116_STOCK_WAVE.json.
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
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WIN_LO, WIN_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


def _orders_window(spark, out):
    return spark.read.parquet(f"{out}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit(WIN_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(WIN_HI).cast("timestamp"))
    )


def q116_pushdown(spark, out):
    o = _orders_window(spark, out)
    li = (
        spark.read.parquet(f"{out}/lineitem.parquet")
        .filter(F.col("l_shipdate") > F.lit(WIN_LO).cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
    )
    return (
        o.join(
            li.hint("shuffle_hash"),
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q116_broadcast_flip(spark, out):
    o = _orders_window(spark, out).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        spark.read.parquet(f"{out}/lineitem.parquet")
        .filter(F.col("l_shipdate") > F.lit(WIN_LO).cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
    )
    matched = (
        li.join(
            F.broadcast(o),
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
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
    oracle = qs["q116_priority_checking"].oracle

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
        "exp_q116",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.1").collect()

    variants = {}

    def run(name, fn, reps=2):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _mat(fn())
            per.append(round(time.perf_counter() - t0, 3))
        variants[name] = {"reps": per, "best": min(per)}
        print(f"## {name}: {per}", file=sys.stderr, flush=True)

    run("stock", lambda: qs["q116_priority_checking"].fn(spark, out))
    run("pushdown", lambda: q116_pushdown(spark, out))
    run("broadcast_flip", lambda: q116_broadcast_flip(spark, out))

    a = sorted(map(tuple, q116_pushdown(spark, out).collect()))
    b = sorted(map(tuple, q116_broadcast_flip(spark, out).collect()))
    c = sorted(map(tuple, qs["q116_priority_checking"].fn(spark, out).collect()))
    assert a == c and b == c, "variant diverges from stock"

    duck_warm = min(duck_reps[1:])
    payload = {
        "factor": factor,
        "duckdb_reps_s": duck_reps,
        "duckdb_warm_s": duck_warm,
        "spark": variants,
        "ratio_stock_vs_warm": round(variants["stock"]["best"] / duck_warm, 2),
        "ratio_best_variant_vs_warm": round(
            min(v["best"] for v in variants.values()) / duck_warm, 2
        ),
        "variant_rows_match": True,
    }
    print(json.dumps(payload))
    with open(os.path.join(REPO, "BENCH_Q116_STOCK_WAVE.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
