"""q185 serve-time measurement at scale: stock q183 (full corpus
re-tokenization per selection sweep) vs the DSIR serve from maintained
histogram + bucket-count layouts.

Same session, same-run DuckDB denominator (the q183 oracle over the same
scaled parquet). The build pays one full corpus tokenization (the same
work q183 does once — at steady state each ingest batch pays only ITS
tokens, measured separately as maint_s for a 10% batch); the serve is an
O(stored histograms) broadcast-join + doc-grain sum riding the doc_id
bucketing, with the globally-retroactive ratio recomputed O(buckets) from
the 64-row rollup. Writes BENCH_DSIR_SERVING.json.

Usage: python tools/exp_dsir_serving.py [factor=400]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    assert os.path.exists(os.path.join(out, "documents.parquet"))
    spark = get_spark(
        "dsir_serving",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    from wikipediaetl_spark.catalog import all_queries
    from wikipediaetl_spark.operators.layout import (
        _drop_table,
        merge_batch_into_keyed_rollup,
    )
    from wikipediaetl_spark.operators.pipeline_ops import _dsir_buckets, dsir_serve
    from wikipediaetl_spark.sources import load_table

    qs = all_queries()
    canary = best_of(
        lambda: qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.1").collect()
    )

    stock_fn = qs["q183_dsir_importance_selection"].fn
    stock_rows = sorted(map(tuple, stock_fn(spark, out).collect()))
    stock_s = best_of(lambda: stock_fn(spark, out).collect())

    ht, ct_t = "exp_q185_hist", "exp_q185_counts"
    for t in (ht, ct_t, f"{ct_t}_staging"):
        _drop_table(spark, t)
    d = load_table(spark, out, "documents")
    is_batch = F.pmod(F.col("doc_id") * 17 + 3, F.lit(10)) == 6

    def hist_of(docs):
        return (
            _dsir_buckets(docs)
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    def counts_of(docs):
        return _dsir_buckets(docs).groupBy("b").agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.count(F.lit(1)).cast("long").alias("cs"),
        )

    base, batch = d.filter(~is_batch), d.filter(is_batch)
    t0 = time.perf_counter()
    hist_of(base).write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(ht)
    counts_of(base).write.bucketBy(8, "b").sortBy("b").saveAsTable(ct_t)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    hist_of(batch).write.mode("append").bucketBy(8, "doc_id").sortBy(
        "doc_id"
    ).saveAsTable(ht)
    merge_batch_into_keyed_rollup(
        spark,
        counts_of(batch),
        ct_t,
        keys=["b"],
        merge_aggs=[
            F.sum("ct").cast("long").alias("ct"),
            F.sum("cs").cast("long").alias("cs"),
        ],
        bucket_key="b",
        batch_id=1,
    )
    maint_s = time.perf_counter() - t0

    def serve():
        return dsir_serve(spark.table(ht), spark.table(ct_t)).collect()

    serve_rows = sorted(map(tuple, serve()))
    assert serve_rows == stock_rows, "maintained layouts must match stock q183"
    serve_s = best_of(serve)
    for t in (ht, ct_t):
        _drop_table(spark, t)

    con = duckdb.connect()
    con.execute("SET threads TO %d" % (os.cpu_count() or 8))
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet')"
    )
    dd = best_of(
        lambda: con.execute(qs["q183_dsir_importance_selection"].oracle).fetchall()
    )

    payload = {
        "factor": factor,
        "q01_canary_s": round(canary, 3),
        "stock_spark_s": round(stock_s, 3),
        "serve_spark_s": round(serve_s, 3),
        "build_s": round(build_s, 1),
        "maint_batch_s": round(maint_s, 1),
        "duckdb_s": round(dd, 3),
        "stock_ratio": round(stock_s / dd, 2),
        "serve_ratio": round(serve_s / dd, 2),
        "serve_exact_match": True,
        "catalog_proof": "q185_dsir_layout_maintenance",
    }
    with open(os.path.join(REPO, "BENCH_DSIR_SERVING.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
