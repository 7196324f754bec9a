"""Within-run A/B: adaptive pointer-doubling + fused stability check in
connected_components (VERDICT r11 #2 — the only code-caused r11 headline
regression).

r11's loop (replicated verbatim as arm A below) ran the hop join every
round AND checked stability by joining the new and old checkpoints, so
shallow graphs paid two extra joins per round for a deep-chain guarantee
they don't need (q83 driver bench 0.986 → 1.337 s). r12 (arm B =
the library function):
  * the first ``hop_start`` rounds propagate only — a propagation fixed
    point is already full convergence (docstring proof sketch); shallow
    graphs never pay the hop;
  * the previous label rides the propagation aggregate (tagged own row),
    so the stability check is a filter over ONE checkpoint, not a join of
    two.

Arms alternated 3× inside ONE Spark session over the SAME localCheckpointed
q53 pair list; labelings asserted identical each rep. Measured at the
driver's own scale (sf0.1 — the cc cost here is per-round driver-loop
fixed overhead, not data volume, which is exactly what the headline bench
pays).

MEASURED r12 (sf0.1, within-run best/best): see OPTIMIZATION_r12.md.

Usage: python tools/exp_cc_adaptive.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikipediaetl_spark.operators.dedup import q53_shingle_neardup
from wikipediaetl_spark.operators.relational_ext import connected_components
from wikipediaetl_spark.session import get_spark


def _cc_r11(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Verbatim replica of the r11 loop (commit 2e4f203): hop join every
    round, stability via a join of the new and old label checkpoints."""
    spark = pairs.sparkSession
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    prev_wsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_rounds):
            neighbor_labels = edges.join(labels, edges.dst == labels.node).select(
                F.col("src").alias("node"), "label"
            )
            propagated = (
                labels.select("node", "label")
                .unionByName(neighbor_labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            hop = propagated.select(
                F.col("node").alias("label"), F.col("label").alias("label2")
            )
            new_labels = (
                propagated.join(hop, "label", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("label2", F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            stable = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .isEmpty()
            )
            labels = new_labels
            if stable:
                break
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.codegen.wholeStage", prev_wsc)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_cc_adaptive")
    pairs = (
        q53_shingle_neardup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)  # shared input: time the cc loop only
    )

    def run(fn):
        t0 = time.perf_counter()
        rows = sorted(map(tuple, fn(pairs).collect()))
        return time.perf_counter() - t0, rows

    # warmup both arms once
    _, ref = run(_cc_r11)
    run(connected_components)
    a_runs, b_runs = [], []
    for _ in range(3):
        spark.sparkContext.setJobDescription("cc A: r11 loop (always-double, join check)")
        ta, va = run(_cc_r11)
        spark.sparkContext.setJobDescription("cc B: r12 adaptive (fused check)")
        tb, vb = run(connected_components)
        assert va == ref and vb == ref, "arms diverged"
        a_runs.append(round(ta, 3))
        b_runs.append(round(tb, 3))
    out = {
        "sf_dir": sf_dir,
        "r11_loop_runs": a_runs,
        "r12_adaptive_runs": b_runs,
        "speedup_best": round(min(a_runs) / min(b_runs), 3),
        "values_match": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
