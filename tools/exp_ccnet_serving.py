"""q175 serve-time measurement at scale: stock q159 (three corpus passes)
vs the tercile serve from a prebuilt doc-grain feature layout.

Same session, same-run DuckDB denominator. The build pays one full corpus
scoring pass (the same work q144 does — at steady state each batch pays
only ITS tokens); the serve is an O(docs) window+agg over the
lang-bucketed feature table. Writes BENCH_CCNET_SERVING.json.

Usage: python tools/exp_ccnet_serving.py [factor=400]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import Window as W
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
        "ccnet_serving",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    from wikipediaetl_spark.catalog import all_queries
    from wikipediaetl_spark.operators.layout import _drop_table
    from wikipediaetl_spark.operators.text_analysis import (
        score_docs,
        unigram_lm,
    )
    from wikipediaetl_spark.sources import load_table

    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.1").collect()  # warm

    stock_fn = qs["q159_ccnet_buckets"].fn
    stock_rows = sorted(map(tuple, stock_fn(spark, out).collect()))
    stock_s = best_of(lambda: stock_fn(spark, out).collect())

    table = "exp_q175_doc_features"
    t0 = time.perf_counter()
    d = load_table(spark, out, "documents")
    lp, oov = unigram_lm(spark, out)
    _drop_table(spark, table)
    (
        score_docs(d, lp, oov)
        .join(d.select("doc_id", "lang"), "doc_id")
        .write.bucketBy(8, "lang")
        .sortBy("lang")
        .saveAsTable(table)
    )
    build_s = time.perf_counter() - t0

    def serve():
        feats = spark.table(table)
        scored = feats.select(
            "lang", "doc_id", "n_tokens",
            F.expr(
                "CAST((-sum_lp_micro * 1000) DIV n_tokens AS BIGINT)"
            ).alias("nll_milli"),
        )
        w = W.partitionBy("lang").orderBy("nll_milli", "doc_id")
        return (
            scored.withColumn("ppl_tercile", F.ntile(3).over(w))
            .groupBy("lang", "ppl_tercile")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.min("nll_milli").alias("min_nll_milli"),
                F.max("nll_milli").alias("max_nll_milli"),
            )
        )

    serve_rows = sorted(map(tuple, serve().collect()))
    assert serve_rows == stock_rows, "serving layout must match stock q159"
    serve_s = best_of(lambda: serve().collect())
    _drop_table(spark, table)

    con = duckdb.connect()
    con.execute("SET threads TO %d" % (os.cpu_count() or 8))
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{out}/{t}.parquet')")
    dd = best_of(lambda: con.execute(qs["q159_ccnet_buckets"].oracle).fetchall())

    payload = {
        "factor": factor,
        "stock_spark_s": round(stock_s, 3),
        "serve_spark_s": round(serve_s, 3),
        "build_s": round(build_s, 1),
        "duckdb_s": round(dd, 3),
        "stock_ratio": round(stock_s / dd, 2),
        "serve_ratio": round(serve_s / dd, 2),
        "serve_exact_match": True,
        "catalog_proof": "q175_ccnet_serving",
    }
    with open(os.path.join(REPO, "BENCH_CCNET_SERVING.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
