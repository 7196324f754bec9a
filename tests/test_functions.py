"""Unit tests for the scalar/extraction function layer, using miniature HTML
fixtures replicating the structures the reference parses (SURVEY.md §5):
div#mw-normal-catlinks > ul > li > a (categorizer.py:92-99),
li#footer-info-lastmod (categorizer.py:110-116), script/style stripping
(converter.py:38-44), URL normalization (parser/app/main.py:16-40)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wikipediaetl_spark.functions.html import (
    extract_categories_expr,
    extract_last_edited_expr,
    extract_text_expr,
    parse_page_udf,
)
from wikipediaetl_spark.functions.urls import (
    is_domain,
    normalize_url,
    sanitize_filename,
    url_to_filename,
)

FULL_PAGE = (
    '<html><head><title>T</title><script>var a=1;</script></head><body>'
    '<div id="mw-normal-catlinks"><ul><li><a>History</a></li>'
    "<li><a>Science</a></li></ul></div>"
    "<p>Alpha beta gamma</p>"
    '<li id="footer-info-lastmod"> This page was last edited on 9 February 2024,'
    " at 10:00 (UTC).</li></body></html>"
)
NO_CATS = "<html><body><p>plain text</p></body></html>"
NO_DATE = '<html><body><div id="mw-normal-catlinks"><ul><li><a>X</a></li></ul></div></body></html>'
BAD_DATE = (
    '<html><body><li id="footer-info-lastmod">This page was last edited on '
    "NotADate 99999</li></body></html>"
)


def _df(spark, pages):
    return spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "id long, html string")


def test_extract_categories(spark):
    rows = (
        _df(spark, [FULL_PAGE, NO_CATS, NO_DATE])
        .select("id", extract_categories_expr(F.col("html")).alias("cats"))
        .orderBy("id")
        .collect()
    )
    assert rows[0].cats == ["History", "Science"]
    assert rows[1].cats == []  # missing div → [] (categorizer.py:95-96)
    assert rows[2].cats == ["X"]


def test_extract_last_edited(spark):
    rows = (
        _df(spark, [FULL_PAGE, NO_CATS, BAD_DATE])
        .select("id", extract_last_edited_expr(F.col("html")).alias("d"))
        .orderBy("id")
        .collect()
    )
    assert rows[0].d == dt.date(2024, 2, 9)
    assert rows[1].d is None  # absent footer → null (categorizer.py:119-122)
    assert rows[2].d is None  # unparseable → null


def test_extract_text_strips_nonvisible(spark):
    rows = (
        _df(spark, [FULL_PAGE])
        .select(extract_text_expr(F.col("html")).alias("t"))
        .collect()
    )
    text = rows[0].t
    assert "Alpha beta gamma" in text
    assert "var a=1" not in text  # script dropped
    assert "T" != text.split()[0] or "title" not in text.lower()  # head dropped
    assert "  " not in text  # whitespace collapsed


def test_udf_parser_agrees_with_expr_path(spark):
    """The structural (html.parser) UDF and the regexp expression path must
    agree on well-formed pages — the expr path is the hot path, the UDF is
    the messy-HTML fallback."""
    df = _df(spark, [FULL_PAGE, NO_CATS, NO_DATE]).withColumn(
        "parsed", parse_page_udf(F.col("html"))
    )
    rows = (
        df.select(
            "id",
            extract_categories_expr(F.col("html")).alias("cats_expr"),
            F.col("parsed.categories").alias("cats_udf"),
        )
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert list(r.cats_expr) == list(r.cats_udf)


def test_normalize_url(spark):
    cases = [
        # parity with parser/app/main.py:26-35
        ("HTTPS://EN.Wikipedia.ORG/wiki/Cat/", "https://en.wikipedia.org/wiki/Cat"),
        ("https://en.wikipedia.org/wiki/Cat?action=edit", "https://en.wikipedia.org/wiki/Cat"),
        ("https://en.wikipedia.org/wiki/Cat#History", "https://en.wikipedia.org/wiki/Cat"),
        ("http://en.wikipedia.org", "http://en.wikipedia.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_domain_filter(spark):
    df = spark.createDataFrame(
        [("https://en.wikipedia.org/wiki/A",), ("https://de.wikipedia.org/wiki/A",),
         ("https://example.com/en.wikipedia.org",)],
        "url string",
    )
    got = [r[0] for r in df.select(is_domain(F.col("url"))).collect()]
    assert got == [True, False, False]  # path must not fool the host check


def test_sanitize_filename(spark):
    cases = [
        ("file:///raw html/My Page (1).html", "My_Page__1_"),
        ("/a/b/Already_safe.html", "Already_safe"),
        ("no_slash.html", "no_slash"),
        ("/x/keep.txt", "keep.txt"),  # only .html is stripped
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "p string")
    got = [r.s for r in df.select(sanitize_filename(F.col("p")).alias("s")).collect()]
    assert got == [want for _, want in cases]


def test_url_to_filename(spark):
    df = spark.createDataFrame([("https://en.wikipedia.org/wiki/C?x=1&y=2",)], "u string")
    got = df.select(url_to_filename(F.col("u")).alias("f")).collect()[0].f
    assert got == "en.wikipedia.org_wiki_C_x_1_y_2"
