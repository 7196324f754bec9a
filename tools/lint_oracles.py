"""Lint catalog oracle SQL for driver-hash type hazards (VERDICT r3 #2).

The external driver hashes result values through Arrow, where DuckDB's bare
``sum(<integer>)`` surfaces as HUGEINT → decimal128(38,0) while Spark emits
int64 — the values compare equal in Python but the exact hash diverges
(q111/q135 were driver-red three rounds for exactly this). This lint infers
each oracle's output types with DuckDB itself (zero-row views, no data read)
and FAILS on any column typed HUGEINT / UHUGEINT / DECIMAL(38,0): every such
column must carry an explicit ``CAST(... AS BIGINT)`` (or an intentional
decimal with nonzero scale).

Usage: python tools/lint_oracles.py   (exit 1 on any finding)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.sources import TABLE_NAMES


def main() -> int:
    con = duckdb.connect()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    checked = 0
    for name, qd in sorted(all_queries().items()):
        if qd.oracle is None:
            continue
        checked += 1
        try:
            rel = con.sql(qd.oracle)
            cols, types = rel.columns, rel.types
        except Exception as e:
            print(f"LINT-ERR {name}: cannot infer types: {e}")
            bad += 1
            continue
        for col, typ in zip(cols, types):
            ts = str(typ)
            if ts in ("HUGEINT", "UHUGEINT") or ts == "DECIMAL(38,0)":
                print(
                    f"FAIL {name}: column `{col}` is {ts} — wrap the aggregate "
                    f"in CAST(... AS BIGINT) (arrow decimal128(38,0) vs spark "
                    f"int64 diverges in the driver's exact hash)"
                )
                bad += 1
    print(f"\nlinted {checked} oracles, {bad} finding(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
