"""Format readers/writers beyond parquet (SURVEY.md §2.1).

The reference reads wholetext HTML and writes MySQL/Mongo/Parquet; the
engine's source/sink matrix adds JSON and CSV (schema-explicit — never
inferSchema in production paths: a schema drift should fail loudly, not
silently retype a column) and a JDBC sink that mirrors the configuration the
reference builds but never uses (ETL/tasks/categorizer.py:82-87).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-on-read JSON scan. Explicit schema → no inference pass over
    the data (at 100 TB, inference is a full extra scan)."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partition-pruned landing table — the scalable successor to the
    reference's flat HTML directory (fetcher/app/main.py:41-61): downstream
    scans with a partition-column predicate read only matching directories."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    mode: str = "append",
) -> None:
    """Set-based JDBC sink — what the reference configured but then bypassed
    with row-at-a-time ORM inserts (categorizer.py:82-87 config vs :143-195
    N+1 loads). Executors write batches in parallel; no driver round-trips.
    Exercised live against embedded Apache Derby (on Spark's classpath) in
    test_write_jdbc_embedded_derby_roundtrip — write, readback, and append
    semantics; a server-grade DB (MySQL et al.) only changes url/driver.
    """
    df.write.mode(mode).jdbc(url, table, properties=properties or {})


def archive_processed(
    spark: SparkSession, landing_path: str, processed: DataFrame, archive_path: str
) -> tuple[DataFrame, DataFrame]:
    """File-archival semantics (ETL/dags/pipeline.py:70-86 ``move_files``):
    processed rows move from the landing table to the archive table.

    The reference shutil-moves HTML files after a successful run; the
    set-based equivalent is an anti-join split + two writes — remaining rows
    overwrite landing, processed rows append to archive. Returns (remaining,
    archived) DataFrames; caller commits with the writers above.
    """
    landing = spark.read.parquet(landing_path)
    key = processed.columns[0]
    remaining = landing.join(processed.select(key), key, "left_anti")
    archived = landing.join(processed.select(key), key, "left_semi")
    return remaining, archived


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — the other columnar format with pushdown/pruning; schema
    optional because ORC embeds one."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
