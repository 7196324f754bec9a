"""q159/q144 token-pass experiment (VERDICT r4 #4): current two-explode
perdoc_logprob vs a (doc_id, tok) TERM-FREQUENCY-grain variant that explodes
the corpus ONCE, plus per-engine warm/cold walls for the denominator story.

Usage: python tools/exp_q159.py [variant] [scaled_dir]
Variants: current, tfgrain, duckdb, q160, q160duck
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def tfgrain_perdoc(spark, sf_dir):
    """ONE corpus explode: aggregate to (doc_id, tok) term frequencies,
    derive vocab counts AND per-doc scores from that grain."""
    from wikipediaetl_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c_dt"))
    full_counts = tf.groupBy("tok").agg(F.sum("c_dt").alias("cnt"))
    total_df = full_counts.agg(F.sum("cnt").alias("total"))
    vocab = full_counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(50_000)
    micro = lambda p: F.floor(F.log(p) * 1_000_000 + F.lit(0.5)).cast("long")
    lp = vocab.crossJoin(F.broadcast(total_df)).select(
        "tok", micro(F.col("cnt") * 1.0 / F.col("total")).alias("lp")
    )
    oov = total_df.select(
        micro(F.lit(1.0) / F.greatest(F.col("total"), F.lit(1))).alias("oov_lp")
    )
    return (
        tf.join(F.broadcast(lp), "tok", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").cast("long").alias("n_tokens"),
            F.sum(F.col("c_dt") * F.coalesce("lp", "oov_lp")).cast("long").alias(
                "sum_lp_micro"
            ),
        )
    )


def q159_from_perdoc(spark, sf_dir, perdoc):
    from pyspark.sql.window import Window as W

    from wikipediaetl_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = perdoc.join(d, "doc_id").select(
        "lang",
        "doc_id",
        "n_tokens",
        F.expr("CAST((-sum_lp_micro * 1000) DIV n_tokens AS BIGINT)").alias("nll_milli"),
    )
    w = W.partitionBy("lang").orderBy("nll_milli", "doc_id")
    buck = scored.withColumn("ppl_tercile", F.ntile(3).over(w))
    return buck.groupBy("lang", "ppl_tercile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("nll_milli").alias("min_nll_milli"),
        F.max("nll_milli").alias("max_nll_milli"),
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "current"
    out = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/scaled400x"
    if which in ("duckdb", "q160duck"):
        import duckdb

        from wikipediaetl_spark.catalog import all_queries
        from wikipediaetl_spark.sources import TABLE_NAMES

        qname = "q159_ccnet_buckets" if which == "duckdb" else "q160_outlier_zscore"
        sql = all_queries()[qname].oracle
        walls = []
        for rep in range(3):  # rep0 = cold-ish (fresh connection), then warm
            con = duckdb.connect()
            for t in TABLE_NAMES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
                )
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            walls.append(round(time.perf_counter() - t0, 3))
            con.close()
        print(f"RESULT {which} {walls}", flush=True)
        return

    from wikipediaetl_spark.catalog import all_queries
    from wikipediaetl_spark.session import get_spark

    spark = get_spark(
        f"exp_q159_{which}",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()
    if which == "current":
        fn = lambda: qs["q159_ccnet_buckets"].fn(spark, out)
    elif which == "q160":
        fn = lambda: qs["q160_outlier_zscore"].fn(spark, out)
    else:
        fn = lambda: q159_from_perdoc(spark, out, tfgrain_perdoc(spark, out))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().toArrow()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"RESULT {which} {walls}", flush=True)


if __name__ == "__main__":
    main()
