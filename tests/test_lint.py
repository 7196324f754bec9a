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
