"""Focused 400x measurement of the q181 decontamination-ledger story (r9).

Over the replicated documents table (2M docs at 400x — replication is
semantically clean: replicas get fresh doc_ids, the benchmark stays the 50
base docs, and every replica of a contaminated doc is one more linearly-
grown contamination hit, exactly a production crawl's shape), measures the
quantities the maintained-ledger claim is made of:

  build_s     bootstrap: trigram postings + df rollup + count stats from
              90% of the corpus (one-time, the q174 bootstrap class)
  append_s    maintenance: batch postings APPEND + df/count merges through
              merge_batch_into_keyed_rollup — O(batch tokens + |tok grain|)
  serve_s     the full q86 contamination answer from the ledger
              (decontam_ledger_serve), best-of-3 — zero corpus
              re-tokenization
  spark_stock_s  q86's from-scratch Spark run, same session (the engine's
              own no-index cost)
  duckdb_s    the comparator's only index-less option: re-tokenize the
              corpus per audit (the full-recompute oracle)

The served result is exact-match asserted against the full recompute.
Writes BENCH_DECONTAM_SERVING.json. Usage: python tools/exp_q181.py [factor=400]
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

from tools.bench_bucketed import best_of
from tools.bench_scale import build_scaled, time_duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    build_scaled(out, factor)
    spark = get_spark(
        "exp_q181",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()  # warm
    canary = best_of(lambda: qs["q01_pricing_summary"].fn(spark, out))

    from wikipediaetl_spark.operators.layout import (
        _drop_table,
        merge_batch_into_keyed_rollup,
    )
    from wikipediaetl_spark.operators.pipeline_ops import (
        _trigram_occurrences,
        decontam_ledger_serve,
    )

    post_t, df_t, st_t = "exp_q181_post", "exp_q181_df", "exp_q181_stats"
    for t in (post_t, df_t, st_t, f"{df_t}_staging", f"{st_t}_staging"):
        _drop_table(spark, t)
    d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    n_docs = d.count()
    is_batch = F.pmod(F.col("doc_id") * 31 + 7, F.lit(10)) == 3

    t0 = time.perf_counter()
    base_post = _trigram_occurrences(d.filter(~is_batch)).distinct()
    base_post.write.bucketBy(8, "tok").sortBy("tok").saveAsTable(post_t)
    (
        spark.table(post_t)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.bucketBy(8, "tok")
        .sortBy("tok")
        .saveAsTable(df_t)
    )
    (
        d.filter(~is_batch)
        .select(F.lit(0).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .write.bucketBy(1, "k")
        .sortBy("k")
        .saveAsTable(st_t)
    )
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch_post = (
        _trigram_occurrences(d.filter(is_batch)).distinct().localCheckpoint(eager=True)
    )
    batch_post.write.mode("append").bucketBy(8, "tok").sortBy("tok").saveAsTable(
        post_t
    )
    merge_batch_into_keyed_rollup(
        spark,
        batch_post.groupBy("tok").agg(F.count(F.lit(1)).alias("df")),
        df_t,
        keys=["tok"],
        merge_aggs=[F.sum("df").alias("df")],
        bucket_key="tok",
        batch_id=1,
    )
    merge_batch_into_keyed_rollup(
        spark,
        d.filter(is_batch)
        .select(F.lit(0).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_docs")),
        st_t,
        keys=["k"],
        merge_aggs=[F.sum("n_docs").alias("n_docs")],
        bucket_key="k",
        n_buckets=1,
        batch_id=1,
    )
    append_s = time.perf_counter() - t0

    total = int(spark.table(st_t).collect()[0]["n_docs"])
    assert total == n_docs

    serve = lambda: decontam_ledger_serve(  # noqa: E731
        spark.table(post_t), spark.table(df_t), total
    )
    serve_rows = sorted(map(tuple, serve().collect()))
    serve_s = best_of(serve)

    t0 = time.perf_counter()
    stock_rows = sorted(map(tuple, qs["q86_decontamination"].fn(spark, out).collect()))
    spark_stock_s = time.perf_counter() - t0
    assert serve_rows == stock_rows, "served audit must match full recompute"

    oracle = qs["q181_decontam_ledger_maintenance"].oracle
    dd = time_duckdb(out, oracle)

    for t in (post_t, df_t, st_t):
        _drop_table(spark, t)
    res = {
        "factor": factor,
        "n_docs": n_docs,
        "q01_canary_s": round(canary, 3),
        "build_s": round(build_s, 1),
        "append_s": round(append_s, 1),
        "serve_spark_s": round(serve_s, 3),
        "spark_stock_s": round(spark_stock_s, 3),
        "duckdb_full_recompute_s": round(dd, 3),
        "serve_ratio": round(serve_s / dd, 2),
        "serve_exact_match": True,
        "note": "serve is the FULL corpus-wide audit from the ledger (no "
        "re-tokenization); stock rows are the same session's from-scratch "
        "q86; within-run triple",
    }
    print(json.dumps(res))
    with open(os.path.join(REPO, "BENCH_DECONTAM_SERVING.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("wrote BENCH_DECONTAM_SERVING.json")


if __name__ == "__main__":
    main()
