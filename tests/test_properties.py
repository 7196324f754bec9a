"""Property-based tests (hypothesis) for the scalar function layer, plus
robustness checks on hostile inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wikipediaetl_spark.functions.urls import normalize_url, sanitize_filename

SETTINGS = settings(max_examples=30, deadline=None)

url_paths = st.text(
    alphabet="abcdefghij/_-.",
    min_size=0,
    max_size=20,
)
hosts = st.sampled_from(
    ["en.wikipedia.org", "EN.WIKIPEDIA.ORG", "Example.COM", "a.b.c"]
)


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "x string")
    return df.select(col_expr(F.col("x")).alias("y")).collect()[0].y


class TestNormalizeUrlProperties:
    @SETTINGS
    @given(host=hosts, path=url_paths)
    def test_idempotent(self, spark, host, path):
        """normalize(normalize(u)) == normalize(u) — canonical forms are
        fixed points (required for the seen-set to converge)."""
        url = f"https://{host}/{path}"
        once = _one(spark, normalize_url, url)
        twice = _one(spark, normalize_url, once)
        assert once == twice

    @SETTINGS
    @given(host=hosts, path=url_paths)
    def test_drops_query_and_fragment(self, spark, host, path):
        url = f"http://{host}/{path}?q=1&x=2#frag"
        got = _one(spark, normalize_url, url)
        assert "?" not in got and "#" not in got
        assert got.startswith("http://")
        assert host.lower() in got


class TestSanitizeFilenameProperties:
    @SETTINGS
    @given(name=st.text(min_size=0, max_size=30))
    def test_output_charset(self, spark, name):
        """Whatever goes in, the output is file-safe: only [a-zA-Z0-9._-]."""
        got = _one(spark, sanitize_filename, name)
        assert re.fullmatch(r"[a-zA-Z0-9._-]*", got), got

    @SETTINGS
    @given(name=st.from_regex(r"[a-zA-Z0-9_-]{1,12}", fullmatch=True))
    def test_safe_names_preserved(self, spark, name):
        """Already-safe basenames pass through unchanged (modulo .html
        stripping) — parity with utils.py:4-11."""
        got = _one(spark, sanitize_filename, f"/dir/{name}.html")
        assert got == name


def test_malformed_json_yields_null(spark):
    df = spark.createDataFrame(
        [("{",), ("not json",), ("",), (None,), ('{"k": 1}',)], "props string"
    )
    got = [r.k for r in df.select(F.get_json_object("props", "$.k").alias("k")).collect()]
    assert got == [None, None, None, None, "1"]


def test_jaccard_symmetric_and_bounded(spark):
    from wikipediaetl_spark.operators.dedup import _shingles, jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "z z z z z")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(_shingles(docs), 0.0).collect()}
    for (a, b), j in pairs.items():
        assert a < b  # canonical orientation: each unordered pair exactly once
        assert 0.0 <= j <= 1.0


def test_salted_join_equals_plain_on_skewed_data(spark):
    """The salting pattern must be result-identical on a pathologically
    skewed key distribution (90% of facts on one key)."""
    facts = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 3, float(i % 7)) for i in range(2000)],
        "fact_id long, key long, v double",
    )
    dim = spark.createDataFrame([(0, "hot"), (1, "a"), (2, "b")], "key long, name string")
    plain = {
        (r.name, r.n)
        for r in facts.join(dim, "key").groupBy("name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_salts = 8
    salted_f = facts.withColumn("salt", F.pmod(F.xxhash64("fact_id"), F.lit(n_salts)))
    salted_d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    salted = {
        (r.name, r.n)
        for r in salted_f.join(salted_d, ["key", "salt"])
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert plain == salted


@given(
    cents=st.integers(min_value=0, max_value=11_000_000),  # price ≤ 110,000.00
    disc_pct=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=500, deadline=None)
def test_q12_long_quantization_matches_decimal_cast(cents, disc_pct):
    """The q12 r5 rewrite's load-bearing identity: for 2+2-decimal money
    inputs, floor(e·(1−d)·1e4 + 0.5)·100 equals the micros of
    CAST(e·(1−d) AS DECIMAL(18,6)) — i.e. rounding the DOUBLE product at
    4 decimals and at 6 decimals agree, because the true product lies on
    the 1e-4 grid and the double's error (~1e-11 relative) never reaches
    the 5e-7 rounding boundary. Spark's decimal cast is modeled faithfully:
    BigDecimal.valueOf(double) takes the shortest repr (Python
    ``Decimal(repr(v))``) then setScale(6, HALF_UP)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    price = cents / 100.0  # the fixture's double-typed 2-decimal price
    disc = disc_pct / 100.0
    v = price * (1.0 - disc)
    micros_long = math.floor(v * 10000 + 0.5) * 100
    micros_dec = int(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        * 1_000_000
    )
    assert micros_long == micros_dec
