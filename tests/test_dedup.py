"""Dedup operator invariants: LSH candidate recall vs exact Jaccard, SimHash
determinism and Hamming locality, exact-dedup key uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipediaetl_spark.operators.dedup import (
    _shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    q50_exact_dedup,
    q55_simhash,
)


def _near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [
        (0, base),
        (1, base),  # exact dup
        (2, base.replace("lazy", "sleepy")),  # near dup
        (3, "completely different words about spark catalyst optimizer plans"),
        (4, "another unrelated document mentioning minhash banding techniques"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_unique_keys(spark, sf_dir):
    df = q50_exact_dedup(spark, sf_dir)
    assert df.count() == df.select("norm_text").distinct().count()


def test_jaccard_exact_values(spark):
    d = _near_dup_docs(spark)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(_shingles(d, 2), threshold=0.0).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs
    assert 0.5 < pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs  # no shared bigrams


def test_minhash_lsh_recall_on_near_dups(spark):
    """LSH banding (16 hashes, 4×4) must recover pairs with very high
    Jaccard: P(miss) = (1-s^4)^4 ≈ 0.002 at s=0.9 — identical and one-word-
    edit docs must be candidates."""
    d = _near_dup_docs(spark)
    sh = _shingles(d, 2)
    cands = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(minhash_signatures(sh)).collect()
    }
    assert (0, 1) in cands
    assert (0, 2) in cands


def test_minhash_signature_deterministic(spark):
    d = _near_dup_docs(spark)
    s1 = sorted(minhash_signatures(_shingles(d, 2)).collect())
    s2 = sorted(minhash_signatures(_shingles(d, 2)).collect())
    assert s1 == s2


def test_simhash_hamming_locality(spark, sf_dir):
    """Hamming pairs include every identical-text pair, and the full
    fingerprint set is deterministic across runs."""
    out1 = q55_simhash(spark, sf_dir)
    rows1 = sorted((r.doc_a, r.doc_b, r.hamming) for r in out1.collect())
    rows2 = sorted((r.doc_a, r.doc_b, r.hamming) for r in q55_simhash(spark, sf_dir).collect())
    assert rows1 == rows2
    for _, _, h in rows1:
        assert 0 <= h <= 6
