"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's category
distribution, SURVEY.md §3.1) on sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB twin for each SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wikipediaetl_spark.catalog import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full categorizer
    pipeline → category distribution (ETL/tasks/categorizer.py end-to-end,
    README.md:23)."""
    from wikipediaetl_spark.operators.etl import q44_category_distribution

    return q44_category_distribution(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per SQL-expressible query; omitted keys
    (hash-family / float-accumulation operators) get rows-only checks."""
    return {
        name: qd.oracle for name, qd in sorted(all_queries().items()) if qd.oracle is not None
    }
