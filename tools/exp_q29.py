"""q29 JSON-extraction variants at 400x.

Stock q29 references k = get_json_object(props,'$.k') inside TWO aggregate
expressions (sum and max) directly under groupBy — if Catalyst doesn't CSE
across aggregate children, every row parses its JSON twice. Variants:

- project_first: materialize k in a Project below the aggregate (one parse
  per row by construction);
- from_json: parse the whole doc once into a struct<k:int> and extract;
- variant: Spark 4 try_parse_json -> variant_get (binary variant decode).

Usage: python tools/exp_q29.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.relational import q29_json_extract


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def _agg(grouped):
    return grouped.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("k") * 1.0 / F.count(F.lit(1))).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


def q29_project_first(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return _agg(e.select("event_type", k.alias("k")).groupBy("event_type"))


def q29_from_json(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = StructType([StructField("k", IntegerType())])
    k = F.from_json("props", schema).getField("k")
    return _agg(e.select("event_type", k.alias("k")).groupBy("event_type"))


def q29_variant(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return _agg(e.select("event_type", k.alias("k")).groupBy("event_type"))


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q29", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    variants = {
        "stock": q29_json_extract,
        "project_first": q29_project_first,
        "from_json": q29_from_json,
        "variant": q29_variant,
    }
    vals, runs = {}, {k: [] for k in variants}
    for k, fn in variants.items():
        _, vals[k] = t(fn, spark, out)           # warmup + value capture
    for _ in range(3):
        for k, fn in variants.items():
            runs[k].append(t(fn, spark, out)[0])
    print(json.dumps({
        **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
        "values_match": {k: vals[k] == vals["stock"] for k in variants},
        "factor": factor,
    }))


if __name__ == "__main__":
    main()
