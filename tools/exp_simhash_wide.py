"""Wide-fingerprint SimHash candidate-stage measurement (VERDICT r7 #5).

q152 (32-bit fp, 4×8-bit bands) vs q169 (64-bit fp, 4×16-bit bands) at the
replicated-scale documents table: the claim to verify is that widening the
bands shrinks the banded candidate stage (equi-join on (band_idx,
band_bits)) by ~2^8 on diffuse corpora, because mean bucket occupancy is
n/2^band_bits.

Counts are taken at the DISTINCT-FINGERPRINT level (both shipped pipelines
group identical fingerprints into posting lists before the self-join), so
fixture replication — which makes every replica an exact dup of its base,
collapsing into the same fp-group — does not quadratically inflate the
numbers the way a doc-level pair count would (the q83 caveat in
bench_scale.py). Reported per width:

  n_docs, n_distinct_fps            corpus + collapse factor
  n_candidate_fp_pairs              distinct fp pairs sharing >= 1 band
                                    (the quadratic stage this is about)
  n_surviving_fp_pairs              candidates passing hamming <= 3
  candidate_stage_s                 wall for fps + banding + candidate count

Usage: python tools/exp_simhash_wide.py [factor=400] [scaled_dir]
Writes BENCH_SIMHASH_WIDE.json; conclusions pinned in q169's docstring.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikipediaetl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fps(spark, docs, bits: int):
    """Distinct-fingerprint table for the given width, as band columns
    (16-bit for 64, 8-bit for 32 — matching q169/q152's band layouts)."""
    import wikipediaetl_spark.operators.dedup as dd

    toks = dd._tokens(docs)
    hashed = toks.select(
        "doc_id", F.md5(F.concat(F.lit("sh|"), F.col("tok"))).alias("h")
    )
    votes = hashed.groupBy("doc_id").agg(
        *[F.expr(dd._simhash_vote_sql(i, "h")).alias(f"v{i}") for i in range(bits)]
    )
    band_bits = bits // 4
    return votes.select(
        "doc_id",
        *[
            F.expr(dd._simhash_wide_band_sql(k, band_bits)).alias(f"b{k}")
            for k in range(4)
        ],
    )


def measure(spark, docs, bits: int) -> dict:
    t0 = time.perf_counter()
    fps = _fps(spark, docs, bits)
    groups = fps.groupBy("b0", "b1", "b2", "b3").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).persist()
    n_fps = groups.count()
    banded = groups.select(
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("band_idx"), F.col(f"b{k}").alias("band_bits"))
                for k in range(4)
            ])
        ).alias("band"),
    ).select("b0", "b1", "b2", "b3", "band.band_idx", "band.band_bits")
    a = banded.select(
        *[F.col(f"b{k}").alias(f"b{k}_a") for k in range(4)], "band_idx", "band_bits"
    )
    b = banded.select(
        *[F.col(f"b{k}").alias(f"b{k}_b") for k in range(4)], "band_idx", "band_bits"
    )
    fp_a = F.struct(*[F.col(f"b{k}_a") for k in range(4)])
    fp_b = F.struct(*[F.col(f"b{k}_b") for k in range(4)])
    ham = sum(
        F.bit_count(F.col(f"b{k}_a").bitwiseXOR(F.col(f"b{k}_b"))) for k in range(4)
    )
    cand = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(fp_a < fp_b)
        .select(*[f"b{k}_a" for k in range(4)], *[f"b{k}_b" for k in range(4)])
        .distinct()
        .withColumn("hamming", ham)
        .persist()
    )
    n_cand = cand.count()
    n_pairs = cand.filter(F.col("hamming") <= 3).count()
    wall = time.perf_counter() - t0
    groups.unpersist()
    cand.unpersist()
    return {
        "bits": bits,
        "n_distinct_fps": n_fps,
        "n_candidate_fp_pairs": n_cand,
        "n_surviving_fp_pairs": n_pairs,
        "candidate_stage_s": round(wall, 2),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    scaled = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    )
    spark = get_spark(
        "exp_simhash_wide",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    docs = spark.read.parquet(os.path.join(scaled, "documents.parquet"))
    n_docs = docs.count()
    out = {"factor": factor, "n_docs": n_docs, "widths": []}
    for bits in (32, 64):
        res = measure(spark, docs, bits)
        out["widths"].append(res)
        print(json.dumps(res))
    w32, w64 = out["widths"]
    if w64["n_candidate_fp_pairs"]:
        out["candidate_drop"] = round(
            w32["n_candidate_fp_pairs"] / w64["n_candidate_fp_pairs"], 1
        )
    with open(os.path.join(REPO, "BENCH_SIMHASH_WIDE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SIMHASH_WIDE.json")


if __name__ == "__main__":
    main()
