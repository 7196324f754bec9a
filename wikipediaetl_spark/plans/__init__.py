from .inspect import (
    count_exchanges,
    explain_str,
    lint_plan,
    physical_ops,
    pushed_filters,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "lint_plan",
    "physical_ops",
    "pushed_filters",
]
