"""wikipediaetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference project ``alehakad/WikipediaETL``.

The reference is a Wikipedia crawler + Airflow/PySpark ETL (see SURVEY.md).
This package re-expresses its semantics Spark-first:

- ``session``    — SparkSession builder tuned for local[N] and cluster scale.
- ``sources``    — table loaders (parquet fixtures, wholetext HTML, JSON).
- ``functions``  — scalar/array column functions (URL, HTML, text analysis).
- ``operators``  — the query catalog: relational core, ETL pipelines,
                   dedup / similarity / text-quality operators.
- ``streaming``  — Structured Streaming rebuild of the crawler loop and
                   event-time windowed aggregations.
- ``plans``      — plan-inspection helpers (explain, shuffle counting).

Every catalog query is registered with an ANSI-SQL oracle twin where
expressible, so a DuckDB oracle can verify results on the same parquet files.
"""

__version__ = "0.1.0"
