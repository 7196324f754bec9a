"""Local differential check: Spark queries vs DuckDB oracles (driver mimic).

Usage: python tools/check_oracle.py [--vanilla] [--json OUT.json] [sf_dir] [query ...]
Compares row count, column names, and an order-insensitive canonicalized
value multiset for every catalog query that has an oracle. ``--json`` writes
a per-query result artifact (the in-repo audit trail for queries outside the
external driver's verification window — VERDICT r1, next-round #2).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--vanilla"]
    vanilla = "--vanilla" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    qs = all_queries()
    if vanilla:
        # mimic the external driver: a bare session without engine configs
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("vanilla").getOrCreate()
    else:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, qd in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = qd.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"status": "FAIL", "detail": "spark raised"}
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            n_rows_only += 1
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            continue
        try:
            res = con.execute(qd.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised: {e}")
            n_fail += 1
            results[name] = {"status": "FAIL", "detail": f"duckdb raised: {e}"}
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc = canon_rows(scols, [tuple(r) for r in srows])
            oc = canon_rows(ocols, orows)
            if sc != oc:
                diff_s = [r for r in sc if r not in set(oc)][:3]
                diff_o = [r for r in oc if r not in set(sc)][:3]
                problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            results[name] = {"status": "FAIL", "detail": "; ".join(problems)}
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
            results[name] = {"status": "PASS", "rows": len(srows)}
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json as _json

        payload = {
            "sf_dir": sf_dir,
            "vanilla": vanilla,
            "summary": {"pass": n_pass, "fail": n_fail, "rows_only": n_rows_only},
            "queries": results,
        }
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
