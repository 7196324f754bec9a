"""Table maintenance, corrupt-input handling, auto-broadcast behavior, and
the real-files wholetext categorizer run."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikipediaetl_spark.sources import load_table, read_wholetext
from wikipediaetl_spark.sources.maintenance import compact_parquet, incremental_files


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    p = str(tmp_path / "fragmented")
    d = load_table(spark, sf_dir, "documents")
    d.repartition(16).write.parquet(p)
    n_before = spark.read.parquet(p).select(F.input_file_name()).distinct().count()
    assert n_before >= 8
    n_after = compact_parquet(spark, p, target_partitions=2)
    assert n_after <= 2
    assert spark.read.parquet(p).count() == d.count()  # no rows lost


def test_incremental_files_only_new(spark, sf_dir, tmp_path):
    p = str(tmp_path / "landing")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    d.filter(F.col("doc_id") < 100).write.parquet(p + "/batch1")
    first = incremental_files(spark, p, None)
    manifest = first.select("file_path").distinct()
    manifest_rows = manifest.collect()  # freeze (simulates a stored manifest)
    d.filter(F.col("doc_id") >= 100).write.parquet(p + "/batch2")
    frozen = spark.createDataFrame(manifest_rows, "file_path string")
    new_rows = incremental_files(spark, p, frozen)
    assert new_rows.count() == d.filter(F.col("doc_id") >= 100).count()
    assert new_rows.filter(F.col("doc_id") < 100).count() == 0
    # idempotent: running again with the updated manifest yields nothing
    full_manifest = incremental_files(spark, p, None).select("file_path").distinct()
    assert incremental_files(spark, p, full_manifest).count() == 0


def test_corrupt_json_rows_quarantined(spark, tmp_path):
    """PERMISSIVE JSON parse routes bad rows to _corrupt_record instead of
    failing the job — the batch twin of the nack/DLQ error channel."""
    p = tmp_path / "messy.json"
    p.write_text('{"id": 1, "v": "ok"}\n{broken\n{"id": 2, "v": "fine"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = spark.read.schema(schema).json(str(p)).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r.id for r in good.collect()) == [1, 2]
        assert bad.count() == 1
    finally:
        df.unpersist()


def test_small_dim_auto_broadcasts(spark, sf_dir):
    """Catalyst must pick BroadcastHashJoin for a small dim without a hint
    (autoBroadcastJoinThreshold) — the default plan a user gets."""
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).join(n, c.c_nationkey == n.n_nationkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_wholetext_corpus_categorizer_run(spark, sf_dir, tmp_path):
    """Closest-to-reference run: write real .html files, scan with
    wholetext + provenance, parse with the structural UDF, and match the
    expression-path categories (categorizer.py end-to-end on actual files)."""
    from wikipediaetl_spark.functions.html import extract_categories_expr, parse_page_udf
    from wikipediaetl_spark.operators.etl import corpus

    c = corpus(spark, sf_dir).filter(F.col("doc_id") < 40).select("doc_id", "html")
    corpus_dir = tmp_path / "landing"
    corpus_dir.mkdir()
    for r in c.collect():  # test materialization only; pipeline writes use sinks
        (corpus_dir / f"Doc_{r.doc_id}.html").write_text(r.html)

    pages = read_wholetext(spark, str(corpus_dir))
    assert pages.count() == 40
    parsed = pages.withColumn("p", parse_page_udf(F.col("value"))).select(
        F.regexp_extract("file_path", r"Doc_(\d+)\.html", 1).cast("long").alias("doc_id"),
        F.col("p.categories").alias("cats_udf"),
    )
    expected = c.select(
        "doc_id", extract_categories_expr(F.col("html")).alias("cats_expr")
    )
    joined = parsed.join(expected, "doc_id")
    mismatches = joined.filter(F.col("cats_udf") != F.col("cats_expr")).count()
    assert mismatches == 0
