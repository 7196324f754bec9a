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


def test_wikihtml_write_sanitizes_traversal_names(spark, tmp_path):
    """ADVICE r2: an untrusted page title with separators / '..' must not
    escape the landing directory; an absolute name must not discard it."""
    register(spark)
    out = tmp_path / "landing2"
    escape_target = tmp_path / "outside.html"
    src = spark.createDataFrame(
        [
            ("../outside.html", "<html>escape</html>"),
            (str(escape_target), "<html>abs</html>"),
            ("sub/dir/page.html", "<html>nested</html>"),
        ],
        "name string, content string",
    )
    src.coalesce(1).write.format("wikihtml").mode("append").save(str(out))
    assert not escape_target.exists()
    written = sorted(os.listdir(out))
    # every file landed INSIDE the landing dir, with separators flattened
    assert written == sorted(
        {".._outside.html", str(escape_target).replace(os.sep, "_"), "sub_dir_page.html"}
    )
    for f in written:
        assert os.path.dirname(os.path.join(str(out), f)) == str(out)


def test_wikihtml_write_rejects_dot_names(spark, tmp_path):
    import pytest
    from wikipediaetl_spark.sources.pyds import _safe_name

    for bad in ("", ".", "..", "\x00"):
        with pytest.raises(ValueError):
            _safe_name(bad)
    assert _safe_name("a/b.html") == "a_b.html"
    assert _safe_name("/") == "_"  # separator flattened, harmless name


def test_wikihtml_write_no_temp_leftovers(spark, tmp_path):
    register(spark)
    out = tmp_path / "landing3"
    src = spark.createDataFrame(
        [("p.html", "<html>x</html>")], "name string, content string"
    )
    src.write.format("wikihtml").mode("append").save(str(out))
    assert os.listdir(out) == ["p.html"]  # temp files renamed away


def test_wikihtml_batch_scan_tolerates_vanished_files(tmp_path):
    """ADVICE r2: files archived between listing and read are skipped, not
    fatal (concurrently drained landing dir)."""
    from wikipediaetl_spark.sources.pyds import _FileSplit, _WikiHtmlReader

    d = tmp_path / "c"
    d.mkdir()
    keep = d / "keep.html"
    keep.write_text("<html>k</html>", encoding="utf-8")
    gone = d / "gone.html"
    gone.write_text("<html>g</html>", encoding="utf-8")
    reader = _WikiHtmlReader({"path": str(d)})
    split = _FileSplit(files=[str(keep), str(gone)])
    gone.unlink()
    rows = list(reader.read(split))
    assert [os.path.basename(r[0]) for r in rows] == ["keep.html"]
    # planning also skips vanished paths
    splits = _plan_splits([str(keep), str(gone)], target_bytes=1 << 20)
    assert [os.path.basename(p) for s in splits for p in s.files] == ["keep.html"]


def test_wikihtml_stream_offsets_nanosecond_rewrites(tmp_path):
    """ADVICE r2: a page rewritten within the same wall-clock second (same
    int-second mtime) must still be re-emitted — offsets track mtime_ns."""
    from wikipediaetl_spark.sources.pyds import _WikiHtmlStreamReader

    d = tmp_path / "inbox2"
    d.mkdir()
    p = d / "a.html"
    p.write_text("<html>v1</html>", encoding="utf-8")
    r = _WikiHtmlStreamReader({"path": str(d)})
    rows1, off1 = r.read(r.initialOffset())
    assert [x[3] for x in rows1] == ["<html>v1</html>"]
    # rewrite, then pin mtime to the SAME integer second but a newer ns
    st = os.stat(p)
    p.write_text("<html>v2</html>", encoding="utf-8")
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    rows2, off2 = r.read(off1)
    assert [x[3] for x in rows2] == ["<html>v2</html>"]
    rows3, _ = r.read(off2)
    assert list(rows3) == []  # unchanged file not re-emitted


def test_wikihtml_stream_batch_byte_cap(tmp_path):
    """max_batch_bytes defers excess fresh files to later batches without
    losing them (deferred files stay out of the committed offset)."""
    from wikipediaetl_spark.sources.pyds import _WikiHtmlStreamReader

    d = tmp_path / "inbox3"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.html").write_text("x" * 100, encoding="utf-8")
    r = _WikiHtmlStreamReader({"path": str(d), "max_batch_bytes": "150"})
    got = []
    off = r.initialOffset()
    for _ in range(10):
        rows, off = r.read(off)
        batch = [os.path.basename(x[0]) for x in rows]
        if not batch:
            break
        assert len(batch) <= 2  # 150-byte budget, 100-byte files, min 1
        got += batch
    assert sorted(got) == ["f0.html", "f1.html", "f2.html", "f3.html"]
