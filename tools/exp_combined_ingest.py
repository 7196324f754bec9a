"""Combined-ingest measurement (VERDICT r10 #5): ONE document stream through
EVERY maintained layout family in a single foreachBatch, at scale.

Measures, on the 400x documents table split into N arrival batches:

  - combined: per-batch wall of `combined_ingest_sink` (all families in one
    foreachBatch — dedup ledger, decontam postings/df/stats, BM25
    postings/doclens, DSIR hist/counts, LSH band index, cluster ledger fed
    from the band probe, IVF cells);
  - parts: the same batches through each family's standalone maintenance,
    summed — the cost the suite would pay as SEPARATE streams (each stream
    re-reads and re-tokenizes the batch);
  - serve checks: after the combined run, every layout must equal its
    one-shot batch-built twin (row-count + checksum over the layout).

Fixture note (the q53 adversarial-replication caveat, pinned in BENCH_SCALE
since r1): the scaled fixture replicates each document ~FACTOR-fold with
identical text, so EVERY near-dup family is quadratic by construction
(each doc pairs with its ~400 exact clones -> O(1e9) band-collision pairs
at 2M docs — and appending one token does not help, MinHash is robust to
small edits by design). The experiment therefore word-salts the text per
doc (see load_docs), keeping a deterministic ~2% of docs clone-salted so
the cluster ledger still maintains real multi-doc components at bounded
volume; linear families are measured on the same salted stream, and
exactness of the quadratic families on REAL duplicate structure is
asserted at fixture scale in tests/test_streaming.

Usage: python tools/exp_combined_ingest.py [factor=400] [n_batches=4]
Writes BENCH_COMBINED_INGEST.json at the repo root.
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


def load_docs(spark, scaled: str):
    d = spark.read.parquet(f"{scaled}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    # De-pathologize the replicated fixture for the near-dup stage.
    # Appending ONE token is not enough: MinHash is robust to small edits
    # BY DESIGN, so each doc still band-collides with its ~400 exact clones
    # and the pair graph is O(1e9) edges (this OOMed the first run). Salt
    # EVERY word instead (one regexp pass, no UDF), with the salt unique
    # per doc — zero shared shingles across clones — EXCEPT a deterministic
    # ~2% of docs whose salt is shared across their clone group (salt from
    # text only), so the cluster ledger still maintains real multi-doc
    # components at bounded volume (~expected 8-clone groups per sampled
    # base doc).
    salt = F.when(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(50)) == 0,
        F.xxhash64(F.col("text")),
    ).otherwise(F.xxhash64(F.col("text"), F.col("doc_id")))
    salted = F.concat(
        F.regexp_replace(
            F.col("text"), F.lit(" "), F.concat(F.lit("_"), salt, F.lit(" "))
        ),
        F.lit("_"),
        salt,
    )
    return d.withColumn("text", salted)


def run_combined(spark, docs, cents, n_batches: int) -> dict:
    from wikipediaetl_spark.operators.pipeline_ops import (
        combined_ingest_sink,
        drop_combined_ingest_tables,
    )

    p = "exp_comb"
    drop_combined_ingest_tables(spark, p)
    sink = combined_ingest_sink(spark, p, cents)
    walls = []
    for i in range(n_batches):
        b = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i)
        t0 = time.perf_counter()
        sink(b, i)
        walls.append(round(time.perf_counter() - t0, 2))
    return {"prefix": p, "batch_walls_s": walls, "total_s": round(sum(walls), 2)}


def run_parts(spark, docs, cents, n_batches: int) -> dict:
    """The same batches through each family's STANDALONE sink (separate
    streams posture): every family re-reads its own copy of the batch."""
    from wikipediaetl_spark.operators.dedup import dedup_ledger_sink
    from wikipediaetl_spark.operators.layout import (
        _drop_table,
        append_batch_to_layout,
        maintained_layout_sink,
    )
    from wikipediaetl_spark.operators.pipeline_ops import (
        decontam_ledger_sink,
        dsir_layout_sink,
        _synthetic_embedding,
    )
    from wikipediaetl_spark.operators.relational_ext import (
        cluster_ledger_sink,
        merge_pairs_into_cluster_ledger,
    )
    from wikipediaetl_spark.operators.dedup import (
        _shingles,
        lsh_index_probe,
        portable_minhash_bands,
    )
    from wikipediaetl_spark.operators.similarity import _ivf_assign, ivf_index_sink
    from wikipediaetl_spark.operators.text_analysis import bm25_index_sink

    p = "exp_part"
    names = ["dedup_ledger", "decontam_postings", "decontam_df",
             "decontam_stats", "bm25_postings", "bm25_doclens", "dsir_hist",
             "dsir_counts", "lsh_bands", "cluster_ledger", "ivf_cells"]
    for t in names:
        _drop_table(spark, f"{p}_{t}")
        _drop_table(spark, f"{p}_{t}_staging")

    def lsh_cluster_sink():
        """Standalone form of the combined sink's band+ledger stages."""
        def bootstrap():
            spark.createDataFrame(
                [], "doc_id long, cluster_id long"
            ).write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(
                f"{p}_cluster_ledger"
            )

        def apply(batch, batch_id):
            bands = portable_minhash_bands(
                _shingles(batch.select("doc_id", "text"), n=2)
            ).localCheckpoint(eager=True)
            append_batch_to_layout(
                spark, bands, f"{p}_lsh_bands",
                bucket_key=("band_idx", "band_hash"), n_buckets=16,
                batch_id=batch_id,
            )
            pairs = (
                lsh_index_probe(bands, spark.table(f"{p}_lsh_bands"))
                .select("doc_a", "doc_b").distinct()
            )
            merge_pairs_into_cluster_ledger(
                spark, pairs, f"{p}_cluster_ledger", batch_id=batch_id
            )

        return maintained_layout_sink(
            spark, apply,
            recover_tables=[f"{p}_lsh_bands", f"{p}_cluster_ledger"],
            bootstrap=bootstrap, bootstrap_table=f"{p}_cluster_ledger",
        )

    def ivf_vec_sink():
        inner = ivf_index_sink(spark, f"{p}_ivf_cells", cents)

        def apply(batch, batch_id):
            inner(
                _synthetic_embedding(batch).select(
                    "vec_id", F.col("v").alias("embedding")
                ),
                batch_id,
            )

        return apply

    sinks = {
        "dedup_ledger": dedup_ledger_sink(spark, f"{p}_dedup_ledger"),
        "decontam": decontam_ledger_sink(
            spark, f"{p}_decontam_postings", f"{p}_decontam_df",
            f"{p}_decontam_stats"
        ),
        "bm25": bm25_index_sink(spark, f"{p}_bm25_postings", f"{p}_bm25_doclens"),
        "dsir": dsir_layout_sink(spark, f"{p}_dsir_hist", f"{p}_dsir_counts"),
        "lsh_cluster": lsh_cluster_sink(),
        "ivf": ivf_vec_sink(),
    }
    per_family = {k: 0.0 for k in sinks}
    for i in range(n_batches):
        b = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i)
        for k, s in sinks.items():
            t0 = time.perf_counter()
            s(b, i)
            per_family[k] += time.perf_counter() - t0
    per_family = {k: round(v, 2) for k, v in per_family.items()}
    return {"prefix": p, "per_family_s": per_family,
            "total_s": round(sum(per_family.values()), 2)}


def check_twins(spark, docs, cents, prefix: str) -> dict:
    """Every combined-run layout equals its one-shot batch-built twin
    (count + grouped checksum — collect-free at 2M docs)."""
    from wikipediaetl_spark.operators.dedup import (
        _shingles,
        lsh_index_self_pairs,
        portable_minhash_bands,
    )
    from wikipediaetl_spark.operators.pipeline_ops import (
        _dsir_counts_of,
        _dsir_hist_of,
        _synthetic_embedding,
        _trigram_occurrences,
    )
    from wikipediaetl_spark.operators.relational_ext import connected_components
    from wikipediaetl_spark.operators.similarity import _ivf_assign
    from wikipediaetl_spark.operators.text_analysis import (
        _bm25_doclen,
        _bm25_postings,
    )

    def chk(df, cols):
        # bit_xor: order-insensitive, overflow-free multiset checksum
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    post_tw = _trigram_occurrences(docs.select("doc_id", "text")).distinct()
    bands_tw = portable_minhash_bands(_shingles(docs.select("doc_id", "text"), n=2))
    twins = {
        "dedup_ledger": (
            docs.groupBy(F.md5(F.col("text")).alias("content_key")).agg(
                F.min("doc_id").alias("keeper_doc_id"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
            ),
            ["content_key", "keeper_doc_id", "n_docs"],
        ),
        "decontam_postings": (post_tw, ["doc_id", "tok"]),
        "decontam_df": (
            post_tw.groupBy("tok").agg(F.count(F.lit(1)).alias("df")),
            ["tok", "df"],
        ),
        "bm25_postings": (
            _bm25_postings(docs.select("doc_id", "text")),
            ["tok", "doc_id", "dl", "tf"],
        ),
        "bm25_doclens": (
            _bm25_doclen(docs.select("doc_id", "text")), ["doc_id", "dl"]
        ),
        "dsir_hist": (_dsir_hist_of(docs), ["doc_id", "b", "n"]),
        "dsir_counts": (_dsir_counts_of(docs), ["b", "ct", "cs"]),
        "lsh_bands": (bands_tw, ["doc_id", "band_idx", "band_hash"]),
        "cluster_ledger": (
            connected_components(
                lsh_index_self_pairs(bands_tw).select("doc_a", "doc_b").distinct()
            ),
            ["doc_id", "cluster_id"],
        ),
        "ivf_cells": (
            _ivf_assign(_synthetic_embedding(docs), cents), ["vec_id", "cell"]
        ),
    }
    out = {}
    for name, (tw, cols) in twins.items():
        got = chk(spark.table(f"{prefix}_{name}"), cols)
        want = chk(tw, cols)
        out[name] = {"rows": got[0], "match": got == want}
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scaled = os.path.join(REPO, ".benchdata", f"scaled{factor}x")
    assert os.path.exists(os.path.join(scaled, "documents.parquet"))
    spark = get_spark(
        "exp_combined_ingest",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from wikipediaetl_spark.operators.pipeline_ops import (
        demo_centroids,
        drop_combined_ingest_tables,
    )

    # deliberately LAZY: localCheckpointing 2M uniquified docs holds the
    # whole text corpus in executor memory for the experiment's lifetime
    # and OOMs the shared heap alongside the per-batch checkpoints; the
    # parquet re-scan per consumer is cheap (pushdown-pruned columns)
    docs = load_docs(spark, scaled)
    n_docs = docs.count()
    cents = demo_centroids(spark).localCheckpoint(eager=True)

    combined = run_combined(spark, docs, cents, n_batches)
    twins = check_twins(spark, docs, cents, combined["prefix"])
    parts = run_parts(spark, docs, cents, n_batches)

    out = {
        "factor": factor,
        "n_docs": n_docs,
        "n_batches": n_batches,
        "combined_total_s": combined["total_s"],
        "combined_batch_walls_s": combined["batch_walls_s"],
        "combined_s_per_batch": round(combined["total_s"] / n_batches, 2),
        "parts_total_s": parts["total_s"],
        "parts_per_family_s": parts["per_family_s"],
        "combined_vs_parts": round(combined["total_s"] / parts["total_s"], 2),
        "twin_checks": twins,
        "all_twins_match": all(v["match"] for v in twins.values()),
        "note": (
            "combined = one foreachBatch maintaining all layout families "
            "per batch; parts = the same batches through each family's "
            "standalone sink, summed. Text word-salted per doc with a 2% clone-salted subset (the "
            "adversarial-replication caveat — see module docstring); twin "
            "checks compare every layout to its one-shot batch build by "
            "row count + xxhash64 checksum."
        ),
    }
    with open(os.path.join(REPO, "BENCH_COMBINED_INGEST.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
