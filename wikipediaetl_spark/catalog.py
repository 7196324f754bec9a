"""Query catalog registry.

Each engine operator from SURVEY.md §2 is exposed as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, where the semantics are
SQL-expressible, an ANSI-SQL oracle twin that DuckDB runs on the same parquet
files. The driver hash-compares both sides (row-count + schema +
order-insensitive value-hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded identically on both sides
  (sum-of-double is order-sensitive in the last bits; rounding makes the
  hash stable across execution orders);
- every registered query runs under a pinned UTC session timezone
  (``_pin_session``): the fixture's timestamp columns are NTZ parquet and
  the DuckDB oracle compares them naively, so any non-UTC Spark session
  timezone in the harness environment would shift literal casts /
  ``to_date`` around window boundaries. Pinning in the wrapper (not in each
  query) makes the whole catalog environment-portable by construction.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Runtime confs pinned before every registered query builds its plan. Spark
# resolves session-TZ-dependent expressions (timestamp literal casts,
# to_date on LTZ, NTZ<->LTZ coercions) at *action* time from the session
# conf, so setting these before plan construction also covers the driver's
# later .collect(). inferTimestampNTZ keeps the parquet read type (NTZ)
# identical across environments so comparisons never pass through an
# instant conversion at all.
_PINNED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def _pin_session(spark: SparkSession) -> None:
    for k, v in _PINNED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a static/unknown conf on some Spark build: best-effort


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
        @functools.wraps(fn)
        def pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = QueryDef(name=name, fn=pinned, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import registers everything; local import avoids a cycle at module load.
    from wikipediaetl_spark.operators import (  # noqa: F401
        advanced,
        dedup,
        etl,
        layout,
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
