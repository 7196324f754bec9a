"""q67 TF-IDF variant at 400x: derive df FROM tf — one token pass, not two.

Stock q67 explodes the token stream TWICE: once for tf (groupBy lang,tok)
and once for df (groupBy tok, countDistinct lang). But df is fully
determined by the tf relation itself: tf holds exactly one row per
(lang, tok) pair that occurs, so df(tok) == count of tf rows for that tok,
and n_langs == countDistinct(lang) over tf. Both follow-up aggregates run
over the vocabulary-sized tf table (~|langs|x|vocab| rows) instead of the
full corpus token stream — the second 2M-doc explode+shuffle disappears
and the remaining plan is one token pass + two tiny aggregates.

MEASURED (r11 session 3, 400x, within-run): stock best 4.747 s
(5.21/4.75/5.04) vs variant best 4.694 s (4.87/4.69/4.70), values
identical — FLAT, rejected. The corpus explode is not the cost at this
fixture: the 400x-replicated vocabulary is small, map-side partials
collapse the token stream immediately, and both shapes are dominated by
the shared scan+split+tf-aggregate. Boundary: at an open real-corpus
vocabulary the df distinct-aggregate grain grows with |vocab|x|langs|
and the variant's argument returns.

Usage: python tools/exp_q67.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.text_analysis import q67_tfidf_top_terms


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def q67_df_from_tf(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df/n_langs from the vocab-sized tf relation — no second corpus pass
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_langs = tf.select(F.countDistinct("lang").alias("n_langs"))
    tfidf = F.floor(
        F.col("tf") * F.log(F.col("n_langs") * 1.0 / F.col("df")) * 1000000 + 0.5
    ) / 1000000.0
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_langs))
        .withColumn("tfidf", tfidf)
    )
    w = W.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("lang", "tok", "tf", "tfidf", "rnk")
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q67", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    variants = {"q67_stock": q67_tfidf_top_terms, "q67_df_from_tf": q67_df_from_tf}
    vals, runs = {}, {k: [] for k in variants}
    for k, fn in variants.items():
        _, vals[k] = t(fn, spark, out)           # warmup + value capture
    for _ in range(3):
        for k, fn in variants.items():
            runs[k].append(t(fn, spark, out)[0])
    keys = list(variants)
    print(json.dumps({
        **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
        "values_match": vals[keys[0]] == vals[keys[1]],
        "factor": factor,
    }))


if __name__ == "__main__":
    main()
