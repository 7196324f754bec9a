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


# --------------------------------------------------------------- diffuse mode
# VERDICT r8 #7: the fixture corpus has only ~3.9k distinct fingerprints, so
# the advertised 2^8 bucket-occupancy shrink of 16-bit bands cannot appear on
# it (mean occupancy is <1 for BOTH widths there). This mode synthesizes the
# regime the wide variant exists for: n distinct fps >> 2^16, via a corpus of
# docs whose tokens are unique high-entropy hashes (15 per doc, odd so no
# vote ties; each fp bit is then an unbiased coin and fps spread over the
# full space — exactly the diffuse-corpus assumption in q169's docstring).
#
# The 32-bit candidate stage is reported ANALYTICALLY (per-band sum of
# C(m,2) over measured bucket occupancies — exact per band, an upper bound
# on the cross-band distinct union): materializing it is the failure the
# finding quantifies (~10^9-10^10 pairs). The 64-bit stage is both analytic
# AND materialized through the real q169 join, so the analytic method is
# validated against a measured count where measuring is feasible.


def _synth_hashed(spark, n_docs: int, toks_per_doc: int = 15):
    """(doc_id, h) token-hash rows for a synthetic high-entropy corpus —
    the same distribution md5(tok) yields on real text whose tokens are
    globally unique."""
    return (
        spark.range(n_docs)
        .toDF("doc_id")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(toks_per_doc - 1))).alias("j"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(":", F.col("doc_id"), F.col("j"), F.lit("synth"))
            ).alias("h"),
        )
    )


def _fps_from_hashed(hashed, bits: int):
    import wikipediaetl_spark.operators.dedup as dd

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


def measure_diffuse(spark, hashed, bits: int, materialize: bool) -> dict:
    t0 = time.perf_counter()
    fps = _fps_from_hashed(hashed, bits)
    groups = (
        fps.groupBy("b0", "b1", "b2", "b3")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .persist()
    )
    n_fps = groups.count()
    # per-band occupancy + analytic pair count: for band k, bucket sizes m
    # over DISTINCT fps; pairs_k = sum m*(m-1)/2 (exact for that band)
    per_band = []
    analytic_pairs = 0
    for k in range(4):
        occ = (
            groups.groupBy(F.col(f"b{k}").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.count(F.lit(1)).alias("buckets_used"),
                F.max("m").alias("max_occ"),
                (F.sum(F.col("m") * (F.col("m") - 1)) / 2).alias("pairs"),
            )
            .collect()[0]
        )
        per_band.append(
            {
                "band": k,
                "buckets_used": occ["buckets_used"],
                "mean_occ": round(n_fps / occ["buckets_used"], 2),
                "max_occ": occ["max_occ"],
                "pairs": int(occ["pairs"]),
            }
        )
        analytic_pairs += int(occ["pairs"])
    out = {
        "bits": bits,
        "n_distinct_fps": n_fps,
        "per_band": per_band,
        "analytic_candidate_pairs": analytic_pairs,
        "analytic_note": "sum over bands of C(m,2) on measured bucket "
        "occupancies; exact per band, upper bound on the distinct union",
    }
    if materialize:
        banded = groups.select(
            "b0",
            "b1",
            "b2",
            "b3",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("band_idx"),
                            F.col(f"b{k}").alias("band_bits"),
                        )
                        for k in range(4)
                    ]
                )
            ).alias("band"),
        ).select("b0", "b1", "b2", "b3", "band.band_idx", "band.band_bits")
        a = banded.select(
            *[F.col(f"b{k}").alias(f"b{k}_a") for k in range(4)],
            "band_idx",
            "band_bits",
        )
        b = banded.select(
            *[F.col(f"b{k}").alias(f"b{k}_b") for k in range(4)],
            "band_idx",
            "band_bits",
        )
        fp_a = F.struct(*[F.col(f"b{k}_a") for k in range(4)])
        fp_b = F.struct(*[F.col(f"b{k}_b") for k in range(4)])
        ham = sum(
            F.bit_count(F.col(f"b{k}_a").bitwiseXOR(F.col(f"b{k}_b")))
            for k in range(4)
        )
        cand = (
            a.join(b, ["band_idx", "band_bits"])
            .filter(fp_a < fp_b)
            .select(*[f"b{k}_a" for k in range(4)], *[f"b{k}_b" for k in range(4)])
            .distinct()
            .withColumn("hamming", ham)
            .persist()
        )
        out["measured_candidate_fp_pairs"] = cand.count()
        out["measured_surviving_fp_pairs"] = cand.filter(F.col("hamming") <= 3).count()
        cand.unpersist()
    out["wall_s"] = round(time.perf_counter() - t0, 2)
    groups.unpersist()
    return out


def main_diffuse(n_docs: int) -> None:
    spark = get_spark(
        "exp_simhash_diffuse",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    hashed = _synth_hashed(spark, n_docs).persist()
    hashed.count()
    diffuse = {"n_docs": n_docs, "toks_per_doc": 15, "widths": []}
    for bits, materialize in ((32, False), (64, True)):
        res = measure_diffuse(spark, hashed, bits, materialize)
        diffuse["widths"].append(res)
        print(json.dumps(res))
    w32, w64 = diffuse["widths"]
    if w64["analytic_candidate_pairs"]:
        diffuse["candidate_drop_analytic"] = round(
            w32["analytic_candidate_pairs"] / w64["analytic_candidate_pairs"], 1
        )
    path = os.path.join(REPO, "BENCH_SIMHASH_WIDE.json")
    with open(path) as f:
        existing = json.load(f)
    existing["diffuse"] = diffuse
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("updated BENCH_SIMHASH_WIDE.json (diffuse section)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--diffuse":
        main_diffuse(int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000)
    else:
        main()
