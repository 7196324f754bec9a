"""q12 shuffle-volume experiment matrix (VERDICT r4 #1).

One VARIANT per subprocess (codec/local-dir are static confs, fixed at
SparkEnv creation). Usage:
    python tools/exp_q12.py <variant> [scaled_dir]
    python tools/exp_q12.py all [scaled_dir]   # runs each variant in a child
Prints `variant best_s` lines.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "zstd_l1": {
        "spark.io.compression.codec": "zstd",
        "spark.io.compression.zstd.level": "1",
    },
    "advisory128": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024)
    },
    "parts64": {"spark.sql.shuffle.partitions": "64"},
    "parts128": {"spark.sql.shuffle.partitions": "128"},
    "shm": {"spark.local.dir": "/dev/shm/spark-exp"},
    "shm_zstd": {
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.io.compression.codec": "zstd",
    },
    "shm_lz4fast": {
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.shuffle.compress": "false",
    },
    "parts48": {"spark.sql.shuffle.partitions": "48"},
    "parts64_shm": {
        "spark.sql.shuffle.partitions": "64",
        "spark.local.dir": "/dev/shm/spark-exp",
    },
    "parts64_zstd": {
        "spark.sql.shuffle.partitions": "64",
        "spark.io.compression.codec": "zstd",
    },
    # single-process broadcast: no shuffle of the 240M-row probe at all —
    # the plan a cost model picks when broadcast cost (build × executors)
    # beats probe shuffle; in local mode executors = 1 JVM
    "bcast": {"__plan__": "bcast"},
    "bcast_parts64": {"__plan__": "bcast", "spark.sql.shuffle.partitions": "64"},
    "parts96": {"spark.sql.shuffle.partitions": "96"},
    "parts64_noaqe": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.enabled": "false",
    },
    "parts64_nocoal": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
    "parts64_shm_nocmp": {
        "spark.sql.shuffle.partitions": "64",
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "duckdb": {"__plan__": "duckdb"},
    "preagg": {"__plan__": "preagg"},
    "preagg64": {"__plan__": "preagg", "spark.sql.shuffle.partitions": "64"},
    "longsum": {"__plan__": "longsum"},
    "longsum64": {"__plan__": "longsum", "spark.sql.shuffle.partitions": "64"},
    "check_longsum": {"__plan__": "check_longsum"},
    "longsum96": {"__plan__": "longsum", "spark.sql.shuffle.partitions": "96"},
    "longsum64_mpb64": {
        "__plan__": "longsum",
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    },
    "longsum64_zstd": {
        "__plan__": "longsum",
        "spark.sql.shuffle.partitions": "64",
        "spark.io.compression.codec": "zstd",
        "spark.io.compression.zstd.level": "1",
    },
    "longsum64_mpb64_shm": {
        "__plan__": "longsum",
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
        "spark.local.dir": "/dev/shm/spark-exp",
    },
    "longsum32_mpb64": {
        "__plan__": "longsum",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    },
    # r11 residual (OPTIMIZATION_r11 "not yet" #1): AQE skew-split on the
    # shuffled-hash join. Defaults need a partition 5x median AND >256MB to
    # split; these lower the bar so any imbalance in the 240M-row probe /
    # 30M-row build partitions actually triggers OptimizeSkewedJoin.
    "skewtune": {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            64 * 1024 * 1024
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(32 * 1024 * 1024),
    },
    "skewtune_force": {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            32 * 1024 * 1024
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 * 1024 * 1024),
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    },
}


def q12_longsum(spark, out):
    """Stock join shape, but the revenue fold runs in int64: each term is
    quantized ONCE to exact 1e-4 units (the double's error ~1e-11 is far
    inside the 5e-7 rounding boundary, so round@4 == the oracle's decimal@6
    cast /100), partial sums stay long per (priority, input partition), and
    only the tiny final merge is decimal."""
    from pyspark.sql import functions as F

    from wikipediaetl_spark.sources import load_table

    li = load_table(spark, out, "lineitem")
    o = load_table(spark, out, "orders").filter(F.col("o_orderstatus") == "F")
    liv = li.select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("vu"),
    )
    j = liv.join(o.hint("shuffle_hash"), liv.l_orderkey == o.o_orderkey)
    inner = j.groupBy("o_orderpriority", F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("pn"), F.sum("vu").alias("pvu")
    )
    return inner.groupBy("o_orderpriority").agg(
        F.sum("pn").cast("long").alias("n_lines"),
        (F.sum(F.col("pvu").cast("decimal(38,0)")) / 10000)
        .cast("double")
        .alias("revenue"),
    )


def q12_preagg(spark, out):
    """Pre-aggregate lineitem at l_orderkey grain BELOW the join: the file
    is clustered by orderkey so the partial agg combines ~4:1 before the
    exchange, the exchange carries 60M (key, cnt, decimal-partial) rows
    instead of 240M (key, v) rows, and the join REUSES that exchange's
    hashpartitioning — one lineitem shuffle either way, a quarter the rows.
    Decimal(18,6) partials merge associatively → bit-identical revenue."""
    from pyspark.sql import functions as F

    from wikipediaetl_spark.sources import load_table

    li = load_table(spark, out, "lineitem")
    o = load_table(spark, out, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
        ).alias("pv"),
    )
    return (
        per_order.join(
            o.select("o_orderkey", "o_orderpriority").hint("shuffle_hash"),
            per_order.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").cast("long").alias("n_lines"),
            F.sum("pv").cast("double").alias("revenue"),
        )
    )


def q12_bcast(spark, out):
    from pyspark.sql import functions as F

    from wikipediaetl_spark.operators.relational import dsum
    from wikipediaetl_spark.sources import load_table

    li = load_table(spark, out, "lineitem")
    o = load_table(spark, out, "orders").filter(F.col("o_orderstatus") == "F")
    liv = li.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
    )
    return (
        liv.join(F.broadcast(o.select("o_orderkey", "o_orderpriority")),
                 liv.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("v"), 6).alias("revenue"),
        )
    )


def run_variant(name: str, out: str) -> None:
    from wikipediaetl_spark.catalog import all_queries
    from wikipediaetl_spark.session import get_spark

    if VARIANTS[name].get("__plan__") == "duckdb":
        import duckdb

        from wikipediaetl_spark.catalog import all_queries as _aq
        from wikipediaetl_spark.sources import TABLE_NAMES

        sql = _aq()["q12_fact_fact_join"].oracle
        best = float("inf")
        for _ in range(2):
            con = duckdb.connect()
            for t in TABLE_NAMES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
                )
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            best = min(best, time.perf_counter() - t0)
            con.close()
        print(f"RESULT {name} {best:.3f}", flush=True)
        return
    conf = {
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "24g",
    }
    conf.update({k: v for k, v in VARIANTS[name].items() if not k.startswith("__")})
    plan = VARIANTS[name].get("__plan__")
    spark = get_spark(f"exp_q12_{name}", extra_conf=conf)
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()  # warm
    if plan == "bcast":
        fn = lambda: q12_bcast(spark, out)
    elif plan == "preagg":
        fn = lambda: q12_preagg(spark, out)
    elif plan == "longsum":
        fn = lambda: q12_longsum(spark, out)
    elif plan == "check_longsum":
        a = sorted(map(tuple, q12_longsum(spark, out).collect()))
        b = sorted(map(tuple, qs["q12_fact_fact_join"].fn(spark, out).collect()))
        print(f"RESULT check_longsum {'MATCH' if a == b else 'MISMATCH'}", flush=True)
        if a != b:
            for x, y in zip(a, b):
                print(x, y, flush=True)
        return
    else:
        fn = lambda: qs["q12_fact_fact_join"].fn(spark, out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn().toArrow()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT {name} {best:.3f}", flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/scaled400x"
    if which != "all":
        run_variant(which, out)
        return
    for name in VARIANTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name, out],
            capture_output=True,
            text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"RESULT {name} FAILED\n{r.stderr[-500:]}", flush=True)


if __name__ == "__main__":
    main()
