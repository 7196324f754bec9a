"""Parquet fixture table loaders.

The driver testdata is a TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` and ``embeddings`` (LLM-pipeline tables). Parquet scans are
Spark-native: columnar, vectorized, with predicate pushdown and column pruning
handled by Catalyst — the scan only materializes what downstream plans touch.

Reference parity: the reference reads its corpus with
``spark.read.text(path, wholetext=True)`` (ETL/tasks/categorizer.py:131,
ETL/tasks/converter.py:52); ``read_wholetext`` below is that operator. The
driver fixtures, however, are parquet — ``load_table`` is the engine's default
scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain ``spark.read.parquet`` so Catalyst keeps
    pushdown/pruning; no driver-side materialization.

    The ``events`` fixture stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader only accepts as long (legacy nanosAsLong conf);
    we convert to a proper TimestampType via integer division to micros —
    the same floor-truncation DuckDB applies when it reads nanos, so the
    oracle sees identical instants.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable in this session → assume it was set at build time
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Fixtures may store timestamps as parquet TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ. Normalize
    # to TimestampType so watermarks/windows work and literal comparisons keep
    # one type. The NTZ->LTZ cast and the collect-side LTZ->naive conversion
    # both use the session timezone, so wall-clock values round-trip exactly
    # and match DuckDB's naive reading of the same files.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread_if_starved(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition ``df`` to the session's core count IFF its scan is
    parallelism-starved — the adapter between compressed-input size and
    compute cost for explode-heavy text operators.

    Why: Spark sizes file splits by INPUT BYTES (``maxPartitionBytes`` with
    an ``openCostInBytes`` floor), which is the right model when compute is
    proportional to bytes read. A replicated/columnar text corpus can
    compress 100:1, so a 16 MB ``documents.parquet`` holding 2M rows scans
    as 4 tasks — and every downstream tokenize/explode stage then runs
    4-wide on a 32-core executor pool (profiled: q159's scoring stage spent
    32.5 s of task time in 4 tasks). One cheap hash shuffle on the unique
    key rebalances to full width; hash (not round-robin) partitioning
    avoids the deterministic-retry sort round-robin would add on the wide
    text column.

    At production scale this is a NO-OP by construction: the check compares
    the scan's planned partition count against ``defaultParallelism``, and
    a 100 TB corpus splits into thousands of partitions, so no shuffle is
    inserted. Only a starved scan (fewer planned partitions than cores)
    pays the rebalance."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        planned = df.rdd.getNumPartitions()  # planning only, no job
    except Exception:
        return df
    if planned >= target:
        return df
    return df.repartition(target, key)


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def read_wholetext(spark: SparkSession, path: str) -> DataFrame:
    """Wholetext corpus scan with file provenance.

    Reference parity: ``spark.read.text(dir, wholetext=True)`` +
    ``input_file_name()`` (ETL/tasks/categorizer.py:131, converter.py:52).
    One row per file: (file_path, value).
    """
    return (
        spark.read.text(path, wholetext=True)
        .withColumn("file_path", F.input_file_name())
        .select("file_path", "value")
    )
