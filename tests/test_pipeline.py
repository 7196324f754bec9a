"""End-to-end pipeline (the reference's DAG) + error side-channel tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipediaetl_spark.pipeline import run_pipeline, split_valid_invalid


def test_run_pipeline_lands_all_outputs(spark, sf_dir, tmp_path):
    out = str(tmp_path / "warehouse_out")
    manifest = run_pipeline(spark, sf_dir, out)
    assert set(manifest) == {"pages", "categories", "page_categories", "html_texts"}
    assert manifest["pages"] == manifest["html_texts"] > 0
    assert manifest["page_categories"] >= manifest["pages"]  # ≥1 category/page
    # landed tables are readable and keyed
    pages = spark.read.parquet(f"{out}/pages")
    assert pages.select("page_id").distinct().count() == manifest["pages"]
    bridge = spark.read.parquet(f"{out}/page_categories")
    cats = spark.read.parquet(f"{out}/categories")
    assert bridge.join(cats, "category_id", "left_anti").count() == 0


def test_split_valid_invalid_partitions_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (3, ""), (4, "fine")], "id long, body string"
    )
    valid, errors = split_valid_invalid(
        df, F.col("body").isNotNull() & (F.length("body") > 0), "empty_body"
    )
    assert sorted(r.id for r in valid.collect()) == [1, 4]
    err_rows = errors.collect()
    assert sorted(r.id for r in err_rows) == [2, 3]
    assert all(r.error_reason == "empty_body" for r in err_rows)
    assert valid.count() + errors.count() == df.count()  # nothing silently lost


def test_manifest_observation_matches_readback(spark, sf_dir, tmp_path):
    """The Observation-based manifest (counts collected during the write
    pass) must equal a read-back count of every landed table — the property
    the old second-scan implementation had by construction."""
    from wikipediaetl_spark.pipeline import run_pipeline

    out = str(tmp_path / "obs_out")
    manifest = run_pipeline(spark, sf_dir, out)
    for name, n in manifest.items():
        assert spark.read.parquet(f"{out}/{name}").count() == n
