"""Within-run A/B: literal-anchored prefilter gates for the per-row
Java-regex floor (VERDICT r11 #6, guide §4 — stay on the JVM, run less
regex).

Targets and variants (stock expression replicated inline as arm A;
arm B = the r12 module code):

- q88_pii_redaction: stock = concat(text, suffix) then two
  regexp_replace walks over the WHOLE string. Variant = redact body and
  suffix separately (exact: the boundary is a space neither pattern can
  match) with the body's regexes gated on contains('@') /
  contains-any-digit (exact: literal '@' and a digit are mandatory in
  the respective patterns). Gate hit-rate on the fixture body: 0%.
- q47_sanitize_filename: stock = regexp_extract basename +
  char-class regexp_replace + '\\.html$' regexp_replace. Variant =
  substring_index basename + char-class regex + endswith/substr strip
  (exact on any input; see sanitize_filename docstring) — 2 of 3
  regexes gone.

Each arm alternated 3× in ONE Spark session at the 400× fixture, timed
with the noop sink (guide §1.4); values asserted identical via an
order-insensitive xxhash64 checksum.

Usage: python tools/exp_regex_gate.py [outdir=.benchdata/scaled400x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import load_table


def _q88_stock(spark, out) -> DataFrame:
    """Verbatim replica of the r11 q88 expression (commit 2e4f203)."""
    d = load_table(spark, out, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, r"[a-zA-Z0-9._-]+@[a-zA-Z0-9.-]+", "[EMAIL]"),
        r"\+?[0-9][0-9-]{7,}",
        "[PHONE]",
    )
    return d.select("doc_id", redacted.alias("redacted"))


def _q47_stock(spark, out) -> DataFrame:
    """Verbatim replica of the r11 q47 expression chain."""
    d = load_table(spark, out, "documents")
    path = F.concat(
        F.lit("file:///raw html/Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" ("),
        F.col("lang"),
        F.lit(").html"),
    )
    base = F.regexp_extract(path, r"([^/]*)$", 1)
    safe = F.regexp_replace(base, r"[^a-zA-Z0-9._-]", "_")
    return d.select(
        "doc_id", F.regexp_replace(safe, r"\.html$", "").alias("file_name")
    )


def _checksum(df: DataFrame) -> int:
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0null")) for c in df.columns]
    # decimal sum: a long sum of 64-bit hashes overflows under ANSI
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/scaled400x"
    qs = all_queries()
    spark = get_spark("exp_regex_gate")
    results = {}
    for name, stock_fn in (
        ("q88_pii_redaction", _q88_stock),
        ("q47_sanitize_filename", _q47_stock),
    ):
        stock = stock_fn(spark, out)
        variant = qs[name].fn(spark, out)
        cs_a, cs_b = _checksum(stock), _checksum(variant)
        assert tuple(cs_a) == tuple(cs_b), f"{name}: values diverged {cs_a} vs {cs_b}"
        _noop(stock)  # warm both
        _noop(variant)
        a_runs, b_runs = [], []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"{name} A: stock regex chain")
            a_runs.append(round(_noop(stock), 3))
            spark.sparkContext.setJobDescription(f"{name} B: gated/builtin r12")
            b_runs.append(round(_noop(variant), 3))
        results[name] = {
            "stock_runs": a_runs,
            "variant_runs": b_runs,
            "speedup_best": round(min(a_runs) / min(b_runs), 3),
            "values_match": True,
            "rows": int(cs_a["n"]),
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"outdir": out, "results": results}))


if __name__ == "__main__":
    main()
