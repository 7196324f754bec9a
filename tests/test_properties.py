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


class TestStorageMergeProperties:
    """upsert_partitioned (layout.py, r6) against an in-memory reference
    model: any sequence of upsert/delete batches must leave the warehouse
    equal to a dict fold of the same batches — unique keys, latest write
    wins, deletes remove."""

    @settings(max_examples=6, deadline=None)
    @given(
        batches=st.lists(
            st.tuples(
                # upserts: key -> price tag for this batch
                st.dictionaries(st.integers(0, 30), st.integers(0, 999), max_size=8),
                # deletes
                st.sets(st.integers(0, 30), max_size=4),
            ),
            min_size=1,
            max_size=4,
        ),
        n_parts=st.sampled_from([1, 4, 7]),
    )
    def test_upsert_sequence_matches_dict_fold(self, spark, batches, n_parts):
        import tempfile
        import shutil as _sh

        from wikipediaetl_spark.operators.layout import (
            create_partitioned_table,
            read_partitioned,
            upsert_partitioned,
        )

        schema = "o_orderkey long, o_totalprice double"
        first_ups, first_dels = batches[0]
        model: dict[int, float] = {k: float(v) for k, v in first_ups.items()}
        for k in first_dels:
            model.pop(k, None)
        tmp = tempfile.mkdtemp(prefix="prop_upsert_")
        try:
            base = spark.createDataFrame(
                [(k, float(v)) for k, v in first_ups.items()], schema
            )
            create_partitioned_table(base, tmp, "o_orderkey", n_partitions=n_parts)
            if first_dels:
                upsert_partitioned(
                    spark,
                    tmp,
                    spark.createDataFrame([], schema),
                    "o_orderkey",
                    delete_keys=spark.createDataFrame(
                        [(k,) for k in first_dels], "o_orderkey long"
                    ),
                )
            for ups, dels in batches[1:]:
                changes = spark.createDataFrame(
                    [(k, float(v)) for k, v in ups.items()], schema
                )
                dk = (
                    spark.createDataFrame([(k,) for k in dels], "o_orderkey long")
                    if dels
                    else None
                )
                upsert_partitioned(spark, tmp, changes, "o_orderkey", delete_keys=dk)
                model.update({k: float(v) for k, v in ups.items()})
                for k in dels:
                    model.pop(k, None)
            got = {
                r.o_orderkey: r.o_totalprice
                for r in read_partitioned(spark, tmp).collect()
            }
            assert got == model
        finally:
            _sh.rmtree(tmp, ignore_errors=True)


def test_q160_grain_rewrite_matches_exact_integer_reference(spark, tmp_path):
    """The r6 value-grain q160 against an arbitrary-precision Python
    reference on adversarial data: values ON the half-cent rounding
    boundary, giant outliers (forcing wide M), constant groups (σ=0), and
    a singleton group. The reference computes d₀ = max{d ≥ 0 : n·d² ≤ M}
    with exact ints (math.isqrt), so any float drift in the engine's
    seed-and-adjust threshold would surface here."""
    import math
    import random

    from wikipediaetl_spark.operators.advanced import q160_outlier_zscore

    rng = random.Random(7)
    rows = []
    for g, spec in (("a", "uniform"), ("b", "boundary"), ("c", "const"), ("d", "single")):
        if spec == "uniform":
            vals = [round(rng.uniform(0, 500), 2) for _ in range(4000)]
            vals += [9_999_999.99] * 3  # giant outliers widen M past int64
        elif spec == "boundary":
            vals = [i + 0.005 for i in range(2000)]  # exactly on the grid edge
        elif spec == "const":
            vals = [123.45] * 1500
        else:
            vals = [42.0]
        rows += [(len(rows) + i, g, float(v)) for i, v in enumerate(vals)]
    spark.createDataFrame(rows, "event_id long, event_type string, value double").write.parquet(
        str(tmp_path / "events.parquet")
    )

    def ref(vals):
        cents = [math.floor(v * 100 + 0.5) for v in vals]
        n, s = len(cents), sum(cents)
        q = sum(c * c for c in cents)
        m = 9 * n * (n * q - s * s)
        d0 = math.isqrt(m // n) if m >= 0 else 0
        flags = sum(1 for c in cents if abs(n * c - s) > d0)
        return n, flags

    by_group: dict[str, list[float]] = {}
    for _, g, v in rows:
        by_group.setdefault(g, []).append(v)
    want = {g: ref(vs) for g, vs in by_group.items()}
    got = {
        r.event_type: (r.n, r.n_outliers)
        for r in q160_outlier_zscore(spark, str(tmp_path)).collect()
    }
    assert got == want
