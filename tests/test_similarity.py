"""Similarity-search invariants: native cosine vs numpy, ANN recall vs the
exact brute-force top-k, LSH bucket determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from wikipediaetl_spark.operators.similarity import (
    cosine_expr,
    hyperplane_signs,
    ivf_centroids,
    q57_cosine_topk,
    q58_ivf_ann,
)
from wikipediaetl_spark.sources import load_table


def test_cosine_expr_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(10)
    a = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b = a.select(F.col("vec_id").alias("vec_id2"), F.col("v").alias("v2"))
    got = (
        a.crossJoin(b)
        .filter(F.col("vec_id") < F.col("vec_id2"))
        .select("vec_id", "vec_id2", cosine_expr(F.col("v"), F.col("v2")).alias("cos"))
        .collect()
    )
    vecs = {r.vec_id: np.array(r.v) for r in a.collect()}
    for r in got:
        x, y = vecs[r.vec_id], vecs[r.vec_id2]
        want = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
        assert abs(r.cos - want) < 1e-9


def test_ivf_centroids_unit_norm(spark, sf_dir):
    cents = ivf_centroids(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
        )
    ).collect()
    assert len(cents) == 10
    for r in cents:
        assert abs(np.linalg.norm(np.array(r.centroid)) - 1.0) < 1e-9


def test_ivf_recall_vs_exact(spark, sf_dir):
    """Probing 3 of 10 cells must recover a reasonable fraction of the exact
    top-5 (labels are weak clusters in the fixture, so demand ≥20% recall
    and correct per-query result shape)."""
    exact = {
        (r.query_id, r.neighbor_id) for r in q57_cosine_topk(spark, sf_dir).collect()
    }
    approx_rows = q58_ivf_ann(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall too low: {recall}"
    per_query = {}
    for r in approx_rows:
        per_query.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in per_query.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_lsh_buckets_deterministic(spark, sf_dir):
    e = (
        load_table(spark, sf_dir, "embeddings")
        .limit(50)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    b1 = sorted(
        (r.vec_id, r.b)
        for r in e.select("vec_id", hyperplane_signs(F.col("v"), 8, 64).alias("b")).collect()
    )
    b2 = sorted(
        (r.vec_id, r.b)
        for r in e.select("vec_id", hyperplane_signs(F.col("v"), 8, 64).alias("b")).collect()
    )
    assert b1 == b2
    assert all(0 <= b < 256 for _, b in b1)


def test_blas_path_matches_expression_path(spark, sf_dir):
    """The mapInPandas/numpy scorer and the native-expression scorer must
    agree on the full top-k result (same rounding grid)."""
    from wikipediaetl_spark.operators.similarity import q57_cosine_topk, q91_cosine_topk_blas

    expr_path = {
        (r.query_id, r.neighbor_id, r.rnk, round(r.cos_sim, 5))
        for r in q57_cosine_topk(spark, sf_dir).collect()
    }
    blas_path = {
        (r.query_id, r.neighbor_id, r.rnk, round(r.cos_sim, 5))
        for r in q91_cosine_topk_blas(spark, sf_dir).collect()
    }
    assert expr_path == blas_path


def test_pq_ann_recall_vs_exact(spark, sf_dir):
    """PQ ADC shortlist (40 of ~500 candidates) + exact re-rank must recover
    most of the exact top-5; re-ranked scores are exact cosines, so every
    returned (query, neighbor) that IS in the exact top-5 must carry the
    identical cos_sim."""
    from wikipediaetl_spark.operators.similarity import q143_pq_ann

    exact_rows = q57_cosine_topk(spark, sf_dir).collect()
    exact = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact_rows}
    approx_rows = q143_pq_ann(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id): r.cos_sim for r in approx_rows}
    assert len(approx) == len(exact)  # 5 per query, same query set
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.5, f"PQ recall too low: {recall}"
    for key in hits:
        assert exact[key] == approx[key]  # re-rank is exact, not approximate


def test_pq_codebooks_deterministic(spark, sf_dir):
    """Codebook training must be bit-reproducible: same sorted sample in →
    identical centroids out (the property that makes encode stable across
    retries/stragglers)."""
    import numpy as np
    from wikipediaetl_spark.operators.similarity import pq_codebooks

    rng_free = np.arange(256 * 64, dtype=np.float64).reshape(256, 64) % 17 / 17.0
    b1 = pq_codebooks(rng_free.copy())
    b2 = pq_codebooks(rng_free.copy())
    assert (b1 == b2).all()
    assert b1.shape == (8, 16, 8)


def test_rrf_fusion_is_exact_integer_combination(spark, sf_dir):
    """q182's fused score must equal ⌊10⁶/(60+lex)⌋ + ⌊10⁶/(60+sem)⌋
    recomputed from the returned source ranks, and the rank order must be
    (score desc, doc_id asc)."""
    from wikipediaetl_spark.operators.similarity import q182_rrf_hybrid_search

    rows = q182_rrf_hybrid_search(spark, sf_dir).collect()
    assert rows, "fusion returned nothing on the fixture"
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    prev = None
    for r in rows:
        expect = 0
        if r.lex_rnk is not None:
            expect += 1_000_000 // (60 + r.lex_rnk)
        if r.sem_rnk is not None:
            expect += 1_000_000 // (60 + r.sem_rnk)
        assert r.rrf_micro == expect, (r.doc_id, r.rrf_micro, expect)
        assert r.lex_rnk is not None or r.sem_rnk is not None
        if prev is not None:
            assert (prev.rrf_micro, prev.doc_id) > (r.rrf_micro, -1) and (
                prev.rrf_micro > r.rrf_micro
                or (prev.rrf_micro == r.rrf_micro and prev.doc_id < r.doc_id)
            )
        prev = r


def test_q186_served_hybrid_matches_full_recompute(spark, sf_dir):
    """q186's maintained-index serve (bootstrap 90% -> append 10% ->
    bucket-pruned probe + fusion) must reproduce q182's batch hybrid
    answer exactly — the maintenance contract, retrieval edition."""
    from wikipediaetl_spark.operators.similarity import (
        q182_rrf_hybrid_search,
        q186_hybrid_index_serving,
    )

    served = sorted(map(tuple, q186_hybrid_index_serving(spark, sf_dir).collect()))
    full = sorted(map(tuple, q182_rrf_hybrid_search(spark, sf_dir).collect()))
    assert served == full and len(served) > 0


def test_q187_hybrid_ivf_recall_vs_exact_fusion(spark, sf_dir):
    """q187 serves the semantic list from the maintained IVF index (top-3
    probed cells) instead of q182's exact corpus scan — the q58-vs-q57
    recall contract applied to the FUSED result: the approximate fusion's
    top-10 must overlap the exact fusion's top-10 substantially, and the
    lexical contributions must be identical (the lexical side is exact in
    both — only the semantic list is approximated)."""
    from wikipediaetl_spark.operators.similarity import (
        q182_rrf_hybrid_search,
        q187_hybrid_ivf_serving,
    )

    exact = {r["doc_id"]: r for r in q182_rrf_hybrid_search(spark, sf_dir).collect()}
    approx = {r["doc_id"]: r for r in q187_hybrid_ivf_serving(spark, sf_dir).collect()}
    assert len(approx) == 10
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"fused top-10 overlap too low: {overlap}"
    # lexical ranks agree wherever a doc appears in both fused lists
    for doc_id in set(exact) & set(approx):
        assert exact[doc_id]["lex_rnk"] == approx[doc_id]["lex_rnk"]
