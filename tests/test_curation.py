"""Crafted-corpus behavior tests for the curation-pipeline operators: known
inputs with hand-computed expected outputs, written as real parquet so the
operators run their full load-table path."""

from __future__ import annotations

import pytest

from wikipediaetl_spark.catalog import all_queries

# 40 tokens, 36 distinct, contains stopwords -> passes every Gopher gate
_QUALITY_BASE = (
    "the quick brown fox jumps over a lazy dog while seventeen engineers "
    "review of spark plans to find shuffle boundaries and broadcast hints "
    "during morning standup before coffee arrives at nine thirty sharp "
    "every single tuesday"
)
_QUALITY_ALT = _QUALITY_BASE.replace("tuesday", "thursday").replace("fox", "owl")
_QUALITY_THIRD = _QUALITY_BASE.replace("tuesday", "friday").replace("dog", "cat")
# a distinctive tail shared ONLY by the bench doc and its corpus copy: its
# trigrams have df=2, surviving the hot-shingle cap, so the contamination
# overlap is comfortably >= 5 distinct kept trigrams
_CONTAM_TEXT = _QUALITY_BASE + " zanzibar quorum nimbus fractal ember cobalt meadow drift"


def _write_documents(spark, tmp_path, rows):
    path = str(tmp_path / "crafted")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).write.parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("curation")
    rows = [
        # benchmark side (doc_id < 50)
        (10, "en", "bench", _CONTAM_TEXT),
        # corpus: doc 100 is an exact copy of bench doc 10 -> contaminated
        (100, "en", "web", _CONTAM_TEXT),
        # docs 101/102 are exact duplicates of each other -> dedup keeps 101
        (101, "en", "web", _QUALITY_ALT),
        (102, "en", "web", _QUALITY_ALT),
        # doc 103 fails the length gate (3 tokens)
        (103, "en", "web", "too short doc"),
        # doc 104 is clean, unique, quality
        (104, "en", "web", _QUALITY_THIRD),
    ]
    return _write_documents(spark, tmp, rows)


def test_capstone_funnel_hand_computed(spark, crafted_dir):
    """q148 on a corpus with one contaminated doc, one exact-dup pair, and
    one low-quality doc: every funnel stage count is checkable by hand."""
    rows = all_queries()["q148_pipeline_capstone"].fn(spark, crafted_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.lang == "en"
    assert r.n_docs == 5          # 100..104
    assert r.n_quality == 4       # 103 fails the 30-token floor
    assert r.n_unique == 3        # 102 collapses into 101
    assert r.n_final == 2         # 100 is contaminated (copy of bench 10)
    expected_tokens = len(_QUALITY_ALT.split()) + len(_QUALITY_THIRD.split())
    assert r.tokens_final == expected_tokens  # docs 101 + 104 survive


def test_duplicate_spans_cover_exactly_the_shared_run(spark, tmp_path):
    """q141: two docs sharing one 10-token sentence (unique elsewhere) must
    report exactly those 10 positions as duplicated; a fully unique doc
    reports zero."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "en", "w", shared + " one two three four five six seven eight nine ten"),
        (2, "en", "w", "uno dos tres cuatro cinco seis siete ocho nueve diez " + shared),
        (3, "en", "w", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    ]
    path = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in all_queries()["q141_duplicate_spans"].fn(spark, path).collect()}
    assert out[1].n_dup_tokens == 10
    assert out[2].n_dup_tokens == 10
    assert out[3].n_dup_tokens == 0
    assert out[1].n_tokens == 20 and out[1].dup_fraction == 0.5


def test_perplexity_prefers_frequent_tokens(spark, tmp_path):
    """q144: under a corpus-trained unigram LM, a document of corpus-frequent
    tokens must score strictly lower perplexity than a document of
    corpus-rare tokens."""
    common = "data " * 50
    rows = [
        (1, "en", "w", (common.strip())),
        (2, "en", "w", ("data spark table " * 17).strip()),
        (3, "en", "w", "xylophone quixotic zephyr obelisk labyrinth mnemonic"),
    ]
    path = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in all_queries()["q144_unigram_perplexity"].fn(spark, path).collect()}
    assert out[1].perplexity < out[2].perplexity < out[3].perplexity


def test_content_hash_sample_is_content_keyed(spark, tmp_path):
    """q151: identical texts under different doc_ids make the same keep/drop
    decision (content-keyed), and the decision is stable across runs."""
    import hashlib

    from wikipediaetl_spark.operators.pipeline_ops import q151_content_hash_sample

    texts = [f"document number {i} with some filler words" for i in range(40)]
    rows = [(i, "en", "web", texts[i]) for i in range(40)]
    # same texts, re-numbered ids: the sampled multiset of texts must match
    rows_renum = [(1000 + i, "en", "web", texts[i]) for i in range(40)]
    p1 = _write_documents(spark, tmp_path / "a", rows)
    p2 = _write_documents(spark, tmp_path / "b", rows_renum)
    s1 = q151_content_hash_sample(spark, p1).collect()
    s2 = q151_content_hash_sample(spark, p2).collect()
    assert [(r.lang, r.n_sampled) for r in s1] == [(r.lang, r.n_sampled) for r in s2]
    # cross-check the decision rule against a python md5 reference
    expect = sum(
        1 for t in texts if hashlib.md5(("s1|" + t).encode()).hexdigest()[:4] < "2900"
    )
    assert s1[0].n_sampled == expect


def test_q181_ledger_matches_full_recompute(spark, sf_dir):
    """q181's maintained postings+df ledger (bootstrap 90% -> append 10%
    batch postings -> merge df/count partials -> serve) must reproduce
    q86's full-recompute contamination result exactly — the maintenance
    contract applied to the decontamination family. Also pins the global-
    statistic rule: the df cap is applied at serve time from the maintained
    rollup, so the post-append n_docs matches the full corpus count."""
    from wikipediaetl_spark.operators.pipeline_ops import (
        q86_decontamination,
        q181_decontam_ledger_maintenance,
    )

    inc = sorted(map(tuple, q181_decontam_ledger_maintenance(spark, sf_dir).collect()))
    full = sorted(map(tuple, q86_decontamination(spark, sf_dir).collect()))
    assert inc == full and len(inc) > 0
