"""Query catalog registry.

Each engine operator from SURVEY.md §2 is exposed as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, where the semantics are
SQL-expressible, an ANSI-SQL oracle twin that DuckDB runs on the same parquet
files. The driver hash-compares both sides (row-count + schema +
order-insensitive value-hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded identically on both sides
  (sum-of-double is order-sensitive in the last bits; rounding makes the
  hash stable across execution orders).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an engine query, optionally with its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import registers everything; local import avoids a cycle at module load.
    from wikipediaetl_spark.operators import (  # noqa: F401
        dedup,
        etl,
        multimodal,
        pipeline_ops,
        relational,
        relational_ext,
        similarity,
        text_analysis,
        tpch,
    )
    from wikipediaetl_spark.streaming import queries as streaming_queries  # noqa: F401

    return dict(_REGISTRY)
