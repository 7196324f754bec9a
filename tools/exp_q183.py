"""q183 DSIR variant at 400x: derive the bucket-count table FROM the
per-doc histogram aggregate — one corpus token pass, not two.

Stock q183 scans+explodes the corpus TWICE: once for the (doc_id, b)
histogram and once for the 64-row (b, ct, cs) bucket counts. But lang is
functionally dependent on doc_id (one lang per document), so a histogram
grained (doc_id, lang, b) is row-identical to (doc_id, b) — and the
bucket counts are then exact BIGINT folds OVER that relation:
cs(b) = SUM(n), ct(b) = SUM(n WHERE lang='en'). The second
scan+split+explode disappears; ReuseExchange shares the histogram's
partial-aggregate exchange between the serve path and the counts fold.

This is the same hypothesis family as q67's df-from-tf (measured FLAT
this round: the corpus explode is not the cost at the 400x fixture) and
the r5 pair-grain q159 variant (measured 2-3x WORSE: pair-grain shuffle
dwarfs the explode saving) — run to close the token-stream family's
"second pass" residual at the measured bar rather than by analogy.

Usage: python tools/exp_q183.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.pipeline_ops import (
    _dsir_buckets,
    dsir_serve,
    q183_dsir_importance_selection,
)


def t(spark, label, fn, *args):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def q183_counts_from_hist(spark, sf_dir):
    # load_table so both A/B arms share the exact read path (ADVICE r11)
    from wikipediaetl_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = _dsir_buckets(d)
    # lang rides the histogram grain (functionally dependent on doc_id,
    # so the grain is unchanged); counts fold over the histogram result
    hist_l = toks.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    counts = hist_l.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum("n").cast("long").alias("cs"),
    )
    return dsir_serve(hist_l.select("doc_id", "b", "n"), counts)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    if len(sys.argv) > 2:
        # an explicit outdir decides the scale; re-derive the label from it
        # so the JSON's 'factor' field never mislabels the artifact (ADVICE
        # r11). Unparseable names fall back to the label-only CLI value.
        import re

        m = re.search(r"(\d+)x/?$", out)
        if m:
            factor = int(m.group(1))
    spark = get_spark("exp_q183", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
    })
    variants = {
        "q183_stock": q183_dsir_importance_selection,
        "q183_counts_from_hist": q183_counts_from_hist,
    }
    vals, runs = {}, {k: [] for k in variants}
    for k, fn in variants.items():
        _, vals[k] = t(spark, f"{k} warmup", fn, spark, out)
    for i in range(3):
        for k, fn in variants.items():
            runs[k].append(t(spark, f"{k} rep{i}", fn, spark, out)[0])
    keys = list(variants)
    print(json.dumps({
        **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
        "values_match": vals[keys[0]] == vals[keys[1]],
        "factor": factor,
    }))


if __name__ == "__main__":
    main()
