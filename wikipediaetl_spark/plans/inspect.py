"""Plan inspection helpers.

The engine has no optimizer of its own — Catalyst is the optimizer
(SURVEY.md §4). These helpers make plan *assertions* possible: tests verify
that filters reach the parquet scan, that dimension joins broadcast, and
that a query doesn't shuffle more than its algebra requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints to stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_ops(df: DataFrame) -> list[str]:
    """Physical operator names in the executed plan, e.g. to assert
    BroadcastHashJoin vs SortMergeJoin."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = []
    for line in plan.splitlines():
        name = line.lstrip("+-*( )0123456789").split("(")[0].strip()
        if name:
            ops.append(name)
    return ops


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale metric
    that matters most; joins/aggs should reuse partitioning when possible."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (empty string if the
    scan has none) — asserts predicate pushdown actually happened."""
    text = explain_str(df, "formatted")
    return "\n".join(line.strip() for line in text.splitlines() if "PushedFilters" in line)
