"""Dev entry point: ``python -m wikipediaetl_spark [sf_dir] [query ...]``.

Reference parity: the standalone module mains (SURVEY.md §3.3,
ETL/tasks/categorizer.py:198-205 / converter.py:69-73 — the latter broken in
the reference; this one works). With no query names, runs the flagship
category distribution and prints it; with names, runs those catalog queries.
"""

from __future__ import annotations

import sys

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    names = argv[2:] or ["q44_category_distribution"]
    spark = get_spark("wikipediaetl_spark_cli")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}; known: {', '.join(sorted(qs))}", file=sys.stderr)
            return 2
        print(f"=== {name} ===")
        qs[name].fn(spark, sf_dir).show(20, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
