"""End-to-end batch pipeline — the reference's Airflow DAG as one driver run.

Reference parity (SURVEY.md §3.1, ETL/dags/pipeline.py:25-93): the
``process_html`` DAG runs categorizer and converter in parallel task groups,
then archives processed files. Here the orchestration collapses into a plain
driver function over one shared corpus scan (operators/etl.process_corpus):
Spark's scheduler already parallelizes the two branches' jobs, and the
archival step is the set-based split from sources/formats.archive_processed.

Airflow control-flow machinery (per-task retries, XCom handoff,
upstream-failure propagation) lives in ``orchestration.py`` (``run_dag`` /
``process_html_dag``); cron scheduling still belongs to whatever invokes
the run (the reference's own schedule is None, ETL/dags/pipeline.py:28).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wikipediaetl_spark.operators.etl import process_corpus


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """Run both branches and land all outputs as parquet tables.

    Layout (mirrors the reference's sinks — MySQL tables → parquet dims,
    HDFS parquet → converter table):
      out_dir/pages, out_dir/categories, out_dir/page_categories,
      out_dir/html_texts  (converter.py:60-61 parity, mode=overwrite)

    Returns a row-count manifest (the reference returns the processed file
    list through XCom, pipeline.py:88-89 — the manifest is its accounting
    equivalent).
    """
    from pyspark.sql import Observation

    tables = process_corpus(spark, sf_dir)
    corpus_handle = tables.pop("_corpus")
    try:
        manifest: dict[str, int] = {}
        out_names = {
            "pages": "pages",
            "categories": "categories",
            "page_categories": "page_categories",
            "converter_output": "html_texts",
        }
        for key, out_name in out_names.items():
            df = tables[key]
            # manifest counts ride the WRITE pass via an Observation —
            # the old read-back count re-scanned every output table, a
            # second full pass per sink that a 100 TB landing zone cannot
            # afford (and Airflow's XCom accounting gets for free from
            # the task's own output)
            obs = Observation(f"rows_{out_name}")
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/{out_name}")
            manifest[out_name] = int(obs.get["n"])
        return manifest
    finally:
        corpus_handle.unpersist()


def split_valid_invalid(df, predicate, reason: str):
    """Side-output error channel: (valid_rows, error_rows+error_reason).

    Reference parity: the nack → dead-letter path (fetcher/app/main.py:
    110-114, queue_api.py:53-63) — rows failing a validity predicate leave
    the main flow into an error relation instead of killing the job. Chain
    with streaming/queries.retry_queue_step for delayed reprocessing.
    """
    valid = df.filter(predicate)
    errors = df.filter(~predicate | predicate.isNull()).withColumn(
        "error_reason", F.lit(reason)
    )
    return valid, errors
