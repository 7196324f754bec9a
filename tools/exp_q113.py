"""q113 SQL-subquery variant at 400x: join-strategy hints on the derived plan.

Stock q113's POINT is that Catalyst decorrelates three subquery forms (IN,
correlated EXISTS, scalar) into joins on its own. At 400x the derived
physical plan picks sort-merge for both semi-joins, which sorts the 60M-row
orders side twice (once on o_custkey for the IN, once on o_orderkey for the
EXISTS). The hinted variant keeps the identical SQL shape — same three
subqueries, still optimizer-decorrelated — but supplies join-strategy hints:
BROADCAST for the ~acctbal-filtered customer key set (a few hundred
thousand keys, far under the driver HashedRelation pain threshold measured
on q12/q98) and SHUFFLE_HASH for the l_quantity>=49-filtered lineitem side
(~4% selectivity), so orders streams unsorted through both probes.

MEASURED (r11 session 3, 400x, within-run): stock best 5.669 s
(5.98/5.67/6.84) vs hinted best 5.533 s (5.56/7.85/5.53), values
identical — FLAT, rejected. Final-plan check (executed,
isFinalPlan=true): AQE already broadcasts the customer IN side unaided;
the EXISTS side stays SortMergeJoin in the final plan, and forcing it
to SHUFFLE_HASH is exactly what measured flat — the o_orderkey sort is
not where the wall goes; the cost is the two fact scans plus the
decorrelated dual-pass itself.

Usage: python tools/exp_q113.py [factor=400] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipediaetl_spark.session import get_spark
from wikipediaetl_spark.operators.relational_ext import q113_sql_subqueries


def t(fn, *args):
    t0 = time.time()
    rows = fn(*args).collect()
    return round(time.time() - t0, 3), sorted(map(tuple, rows))


def q113_hinted(spark, sf_dir):
    for tbl in ("orders", "customer", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").createOrReplaceTempView(
            f"v113h_{tbl}"
        )
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c), SHUFFLE_HASH(l) */ o_orderkey, o_totalprice
        FROM v113h_orders o
        WHERE o_custkey IN (SELECT c_custkey FROM v113h_customer c
                            WHERE c_acctbal > 9000)
          AND EXISTS (SELECT 1 FROM v113h_lineitem l WHERE l_orderkey = o.o_orderkey
                      AND l_quantity >= 49)
          AND o_totalprice > (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                     / count(*)
                              FROM v113h_orders i)
        """
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else f".benchdata/scaled{factor}x"
    spark = get_spark("exp_q113", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    })
    variants = {"q113_stock": q113_sql_subqueries, "q113_hinted": q113_hinted}
    vals, runs = {}, {k: [] for k in variants}
    for k, fn in variants.items():
        _, vals[k] = t(fn, spark, out)           # warmup + value capture
    for _ in range(3):
        for k, fn in variants.items():
            runs[k].append(t(fn, spark, out)[0])
    keys = list(variants)
    print(json.dumps({
        **{k: {"best": min(v), "runs": v} for k, v in runs.items()},
        "values_match": vals[keys[0]] == vals[keys[1]],
        "factor": factor,
    }))


if __name__ == "__main__":
    main()
