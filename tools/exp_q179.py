"""Focused 400x measurement of the q179 BM25 serving story (r9).

Over the replicated documents table (2M docs at 400x — replication is
semantically clean for BM25: scores are per-doc, df/N/L scale with the
corpus, no pair blowup), measures the three quantities the maintained-index
claim is made of:

  build_s     bootstrap: tokenize 90% of the corpus into the tok-bucketed
              postings + doclen layouts (one-time, the q174 bootstrap class)
  append_s    maintenance: fold the 10% batch in via pure append —
              O(batch tokens), the per-ingest cost
  serve_s     keyword top-10 from the layouts (bucket-pruned probe +
              doc-grain stats scan), best-of-3
  duckdb_s    the comparator's only option without an index: re-tokenize
              the whole corpus per query (the full-recompute oracle),
              best-of-2, same session

The serve result is exact-match asserted against the full recompute.
Writes BENCH_BM25_SERVING.json. Usage: python tools/exp_q179.py [factor=400]
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
        "exp_q179",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    qs = all_queries()
    qs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()  # warm
    canary = best_of(lambda: qs["q01_pricing_summary"].fn(spark, out))

    from wikipediaetl_spark.operators.layout import _drop_table
    from wikipediaetl_spark.operators.text_analysis import bm25_index_probe

    pt, lt = "exp_q179_postings", "exp_q179_doclen"
    d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    n_docs = d.count()
    is_batch = F.pmod(F.col("doc_id") * 23 + 1, F.lit(10)) == 4

    def postings(docs):
        # split ONCE into a materialized column, then size+explode reference
        # it — inlining split(text) into both re-splits the document per
        # emitted token (the _shingles hoist lesson; measured 7x on build)
        arr = docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("w")
        ).localCheckpoint(eager=False)
        toks = arr.select(
            "doc_id",
            F.size("w").cast("long").alias("dl"),
            F.explode("w").alias("tok"),
        )
        return toks.groupBy("tok", "doc_id", "dl").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )

    def doclen(docs):
        return docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("dl")
        )

    _drop_table(spark, pt)
    _drop_table(spark, lt)
    t0 = time.perf_counter()
    postings(d.filter(~is_batch)).write.bucketBy(8, "tok").sortBy("tok").saveAsTable(pt)
    doclen(d.filter(~is_batch)).write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(lt)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    postings(d.filter(is_batch)).write.mode("append").bucketBy(8, "tok").sortBy(
        "tok"
    ).saveAsTable(pt)
    doclen(d.filter(is_batch)).write.mode("append").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(lt)
    append_s = time.perf_counter() - t0

    serve = lambda: bm25_index_probe(spark.table(pt), spark.table(lt))  # noqa: E731
    serve_rows = sorted(map(tuple, serve().collect()))
    serve_s = best_of(serve)

    oracle = qs["q179_bm25_index_maintenance"].oracle
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet')"
    )
    oracle_rows = sorted(map(tuple, con.execute(oracle).fetchall()))
    assert serve_rows == oracle_rows, "served top-10 must match full recompute"
    con.close()
    dd = time_duckdb(out, oracle)

    _drop_table(spark, pt)
    _drop_table(spark, lt)
    res = {
        "factor": factor,
        "n_docs": n_docs,
        "q01_canary_s": round(canary, 3),
        "build_s": round(build_s, 1),
        "append_s": round(append_s, 1),
        "serve_spark_s": round(serve_s, 3),
        "duckdb_full_recompute_s": round(dd, 3),
        "serve_ratio": round(serve_s / dd, 2),
        "serve_exact_match": True,
        "note": "duckdb side has no index: the oracle re-tokenizes the "
        "corpus per query, which is exactly the cost the maintained "
        "postings layout removes; within-run pair",
    }
    print(json.dumps(res))
    with open(os.path.join(REPO, "BENCH_BM25_SERVING.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("wrote BENCH_BM25_SERVING.json")


if __name__ == "__main__":
    main()
