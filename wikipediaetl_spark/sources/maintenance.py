"""Table-maintenance operators — the ops a long-lived landing zone needs.

The reference's landing zone is a flat directory that only ever grows
(fetcher/app/main.py:41-61) plus a post-run shutil move (pipeline.py:70-86).
At 100 TB the equivalent concerns are small-file compaction (crawler output
is millions of tiny files — the #1 practical Spark performance killer) and
incremental ingestion (process only what's new, idempotently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession, path: str, target_partitions: int, tmp_suffix: str = "__compacting"
) -> int:
    """Rewrite a parquet table into ``target_partitions`` files.

    Read → coalesce (no shuffle: merges input splits) → write to a side
    directory → swap. Returns the resulting file count. On object stores the
    swap is a manifest/rename commit; here it is a directory move.
    """
    import shutil

    df = spark.read.parquet(path)
    tmp = path + tmp_suffix
    df.coalesce(target_partitions).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    out = spark.read.parquet(path)
    return out.select(F.input_file_name()).distinct().count()


def incremental_files(spark: SparkSession, path: str, manifest: DataFrame | None) -> DataFrame:
    """Rows from files not yet recorded in ``manifest(file_path)``.

    The batch-side incremental-ingestion pattern (the streaming side is the
    file source's own offset log): attach provenance, anti-join the
    processed-file manifest, return only new-file rows. Callers append the
    new file list to the manifest after a successful run — same idempotent
    accounting as the reference's move-processed-files task
    (ETL/dags/pipeline.py:70-86), without moving anything.
    """
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(path)
        .withColumn("file_path", F.input_file_name())
    )
    if manifest is None:
        return df
    return df.join(manifest.select("file_path"), "file_path", "left_anti")
