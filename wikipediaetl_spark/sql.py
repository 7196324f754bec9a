"""SQL entry surface: register the whole engine as temp views.

A reference user's consumption path is SQL over the normalized schema
(Superset on MySQL, README.md:23). ``bootstrap_sql`` reproduces that surface
on Spark: every fixture table, the synthesized corpus, and the categorizer
star schema become temp views, so ``spark.sql("SELECT ... FROM pages JOIN
page_categories ...")`` works exactly like querying the reference's MySQL —
but distributed, and against the same DataFrames the catalog queries use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from wikipediaetl_spark.operators.etl import categorizer_tables, corpus, q45_converter_output
from wikipediaetl_spark.sources import register_views


def bootstrap_sql(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register fixture + derived views; returns the view names."""
    register_views(spark, sf_dir)
    views = [("corpus", corpus(spark, sf_dir))]
    tables = categorizer_tables(spark, sf_dir)
    views += list(tables.items())
    views.append(("html_texts", q45_converter_output(spark, sf_dir)))
    for name, df in views:
        df.createOrReplaceTempView(name)
    from wikipediaetl_spark.sources import TABLE_NAMES

    return list(TABLE_NAMES) + [name for name, _ in views]
