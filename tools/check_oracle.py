"""Local differential check: Spark queries vs DuckDB oracles (driver mimic).

Usage: python tools/check_oracle.py [--vanilla] [--legacy] [--json OUT.json] [sf_dir] [query ...]
Compares row count, column names, a TYPED canonical schema, and an
order-insensitive canonicalized value multiset for every catalog query that
has an oracle. ``--json`` writes a per-query result artifact (the in-repo
audit trail for queries outside the external driver's verification window).

Typed mode (default, VERDICT r3 #2): the oracle result is fetched through
Arrow so type-level divergences the driver sees are visible locally —
DuckDB's bare ``sum(int)`` is HUGEINT → arrow decimal128(38,0), which the
external driver's exact hash distinguishes from Spark's int64 even when the
Python values compare equal (this is exactly how q111/q135 stayed green in
the old selfcheck while driver-red for three rounds). Each column type is
mapped to a canonical family — int-family, float-family, decimal(scale) —
and compared between the Spark result schema and the oracle's Arrow schema.
Floats canonicalize by exact repr (bit-parity), not 9 significant digits.
``--legacy`` restores the old value-only 9-sig-digit comparison.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.sources import TABLE_NAMES

LEGACY = False


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}" if LEGACY else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # preserve scale: Decimal('1.20') != Decimal('1.2') under exact hash
        return str(v) if not LEGACY else canon(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def _spark_type_family(dt_obj) -> str:
    """Canonical type family for a Spark DataType (driver-hash-relevant)."""
    from pyspark.sql import types as T

    if isinstance(dt_obj, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt_obj, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt_obj, T.DecimalType):
        return f"decimal({dt_obj.scale})"
    if isinstance(dt_obj, T.BooleanType):
        return "bool"
    if isinstance(dt_obj, T.StringType):
        return "str"
    if isinstance(dt_obj, T.DateType):
        return "date"
    if isinstance(dt_obj, T.TimestampType):
        return "timestamp"
    if isinstance(dt_obj, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt_obj, T.BinaryType):
        return "binary"
    if isinstance(dt_obj, T.ArrayType):
        return f"list<{_spark_type_family(dt_obj.elementType)}>"
    if isinstance(dt_obj, T.MapType):
        return "map"
    if isinstance(dt_obj, T.StructType):
        return "struct"
    return dt_obj.simpleString()


def _arrow_type_family(at) -> str:
    """Canonical type family for a pyarrow DataType (oracle side)."""
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return f"decimal({at.scale})"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "str"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{_arrow_type_family(at.value_type)}>"
    if pa.types.is_map(at):
        return "map"
    if pa.types.is_struct(at):
        return "struct"
    return str(at)


def typed_schema_mismatches(sdf, arrow_tbl) -> list[str]:
    """Compare Spark result schema vs oracle Arrow schema by canonical family.

    Precision differences within the same decimal scale are allowed (the
    driver passes q01-style sum(decimal) where Spark emits decimal(22,2) vs
    DuckDB decimal(38,2)); int-family vs decimal-family is NOT (q111/q135)."""
    sfam = {f.name: _spark_type_family(f.dataType) for f in sdf.schema.fields}
    ofam = {f.name: _arrow_type_family(f.type) for f in arrow_tbl.schema}
    probs = []
    for col in sorted(set(sfam) & set(ofam)):
        if sfam[col] != ofam[col]:
            probs.append(f"type[{col}] spark={sfam[col]} oracle={ofam[col]}")
    return probs


def main() -> int:
    global LEGACY
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    LEGACY = "--legacy" in argv
    args = [a for a in argv if a not in ("--vanilla", "--legacy")]
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
            atbl = res.fetch_arrow_table()
            ocols = atbl.column_names
            orows = [
                tuple(col[i].as_py() for col in atbl.columns)
                for i in range(atbl.num_rows)
            ]
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
        if not LEGACY and not problems:
            problems.extend(typed_schema_mismatches(sdf, atbl))
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
