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


def lint_plan(df: DataFrame) -> list[str]:
    """Plan linting: scan the physical plan for scale anti-patterns.

    Rules (each finding is a human-readable warning string):
    - CARTESIAN: a CartesianProduct/BroadcastNestedLoopJoin over two large
      sides (any non-broadcast nested loop) — O(n*m) blow-up risk.
    - PYTHON_ROW_UDF: BatchEvalPython = row-at-a-time Python UDF in the plan;
      ArrowEvalPython/mapInPandas are the vectorized replacements.
    - MANY_EXCHANGES: more than 4 shuffle exchanges — check for missed
      partitioning reuse or missing broadcasts.
    - UNPARTITIONED_WINDOW: a Window with an empty partition spec runs on a
      single task.
    The linter reads the executed plan, so AQE rewrites are reflected.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("CARTESIAN: CartesianProduct in plan — O(n*m) join without keys")
    if "BatchEvalPython" in plan:
        findings.append(
            "PYTHON_ROW_UDF: row-at-a-time Python UDF (BatchEvalPython) — use pandas_udf/Arrow"
        )
    n_ex = count_exchanges(df)
    if n_ex > 4:
        findings.append(f"MANY_EXCHANGES: {n_ex} shuffles — look for partitioning reuse")
    if "Window" in plan and "windowspecdefinition()" in plan.replace(" ", ""):
        findings.append("UNPARTITIONED_WINDOW: global window — single-task bottleneck")
    return findings
