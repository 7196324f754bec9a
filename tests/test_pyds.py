"""Spark 4 Python DataSource (wikihtml) — registered-format corpus scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wikipediaetl_spark.sources.pyds import _plan_splits, register


def _write_corpus(tmp_path, n=7):
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(n):
        (d / f"page_{i}.html").write_text(
            f"<html><body>Page {i} " + ("x" * (100 * (i + 1))) + "</body></html>",
            encoding="utf-8",
        )
    (d / "ignore.txt").write_text("not html", encoding="utf-8")
    return str(d)


def test_wikihtml_read_roundtrip(spark, tmp_path):
    corpus = _write_corpus(tmp_path)
    register(spark)
    df = spark.read.format("wikihtml").load(corpus)
    rows = df.orderBy("path").collect()
    assert len(rows) == 7  # .txt filtered by suffix
    assert rows[0].content.startswith("<html>")
    assert rows[0].length == os.path.getsize(rows[0].path)
    # metadata-only projection works through the V2 source
    total = df.agg(F.sum("length").alias("b")).collect()[0].b
    assert total == sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".html")
    )


def test_wikihtml_parallel_splits(spark, tmp_path):
    corpus = _write_corpus(tmp_path, n=10)
    register(spark)
    df = (
        spark.read.format("wikihtml")
        .option("target_bytes", "600")  # force multiple splits
        .load(corpus)
    )
    n_parts = df.rdd.getNumPartitions()
    assert n_parts > 1
    assert df.count() == 10  # no row lost/duplicated across splits


def test_wikihtml_feeds_extraction_pipeline(spark, tmp_path):
    """The registered source composes with the §2.8 extraction expressions."""
    corpus = tmp_path / "pages"
    corpus.mkdir()
    (corpus / "a.html").write_text(
        '<html><a href="/wiki/Chess">Chess</a>'
        '[[Category:Games]]</html>',
        encoding="utf-8",
    )
    register(spark)
    from wikipediaetl_spark.functions.html import extract_links_expr

    df = spark.read.format("wikihtml").load(str(corpus))
    links = df.select(
        F.explode(
            extract_links_expr(F.col("content"), F.lit("https://en.wikipedia.org/"))
        ).alias("href")
    )
    assert [r.href for r in links.collect()] == ["https://en.wikipedia.org/wiki/Chess"]


def test_wikihtml_write_landing_sink(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "landing")
    src = spark.createDataFrame(
        [("p1.html", "<html>one</html>"), ("p2.html", "<html>two</html>")],
        "name string, content string",
    )
    src.write.format("wikihtml").mode("append").save(out)
    assert sorted(os.listdir(out)) == ["p1.html", "p2.html"]
    back = spark.read.format("wikihtml").load(out)
    assert back.count() == 2


def test_plan_splits_balanced_and_total(tmp_path):
    files = []
    for i, sz in enumerate([10, 200, 30, 400, 50, 60, 70]):
        p = tmp_path / f"f{i}.html"
        p.write_text("x" * sz)
        files.append(str(p))
    splits = _plan_splits(files, target_bytes=250)
    got = sorted(p for s in splits for p in s.files)
    assert got == sorted(files)  # exact partition of the listing
    for s in splits:
        assert len(s.files) >= 1
    assert len(splits) >= 3  # 820 bytes / 250 target


def test_wikihtml_streaming_incremental(spark, tmp_path):
    """readStream picks up only pages landed since the committed offset."""
    corpus = tmp_path / "inbox"
    corpus.mkdir()
    (corpus / "a.html").write_text("<html>a</html>", encoding="utf-8")
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        q = (
            spark.readStream.format("wikihtml")
            .load(str(corpus))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    first = spark.read.parquet(out)
    assert [os.path.basename(r.path) for r in first.collect()] == ["a.html"]

    (corpus / "b.html").write_text("<html>b</html>", encoding="utf-8")
    run_batch()
    second = spark.read.parquet(out)
    names = sorted(os.path.basename(r.path) for r in second.collect())
    assert names == ["a.html", "b.html"]  # a.html not re-emitted
