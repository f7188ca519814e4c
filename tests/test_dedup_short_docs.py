"""Fuzzy dedup must survive real corpora: empty and <k-token documents
previously crashed shingles() with INVALID_PARAMETER_VALUE.START
(sequence(1, size-k+1) descends through 0 → slice start 0).

Reference semantics: a doc shorter than the shingle width simply has no
shingles (it can never be a fuzzy-dup candidate); it must not abort the
job.
"""

from __future__ import annotations

from ureplicator_spark.operators import dedup as DD


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, ""),  # empty doc → 1 empty token after split
        (4, "hi there"),  # 2 tokens < k=3
        (5, "one"),  # 1 token
        (6, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_shingles_skips_short_docs(spark):
    sh = DD.shingles(_docs(spark)).collect()
    ids = {r.doc_id for r in sh}
    assert ids == {1, 2, 6}
    # 9-token doc → 7 distinct 3-gram shingles
    assert sum(1 for r in sh if r.doc_id == 1) == 7


def test_minhash_excludes_short_docs_without_crashing(spark):
    wide = DD.minhash_wide(_docs(spark))
    rows = wide.collect()
    assert {r.doc_id for r in rows} == {1, 2, 6}
    by_id = {r.doc_id: r for r in rows}
    # identical docs → identical signatures
    assert tuple(by_id[1])[1:] == tuple(by_id[6])[1:]


def test_lsh_pairs_on_corpus_with_short_docs(spark):
    pairs = DD.lsh_candidate_pairs(_docs(spark)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 6) in got  # exact dups always collide
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for a, b in got)
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs}
    assert est[(1, 6)] == 1.0


def test_ngram_jaccard_on_corpus_with_short_docs(spark):
    pairs = DD.ngram_jaccard_pairs(_docs(spark)).collect()
    j = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert j[(1, 6)] == 1.0
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for (a, b) in j)
