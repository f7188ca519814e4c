"""BPE vocabulary learning: engine output hash-gated against an
oblivious pure-Python reference (the same discipline as the PQ
codebooks vs NumPy) — the merge loop is non-SQL-expressible, so this
file IS its correctness gate."""

from __future__ import annotations

import re
from collections import Counter

from ureplicator_spark.operators.bpe import (
    END_OF_WORD,
    bpe_segment_stats,
    learn_bpe_merges,
    segment_with_merges,
)


def _ref_word_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                c[w] += 1
    return c


def _ref_merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping replacement — the reference scan."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return tuple(out)


def _ref_learn(texts: list[str], num_merges: int):
    """Oblivious BPE (Sennrich '16): argmax adjacent pair by count,
    ties broken (count DESC, left ASC, right ASC)."""
    words = {
        tuple(w) + (END_OF_WORD,): n for w, n in _ref_word_counts(texts).items()
    }
    merges = []
    for step in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, left + right, cnt))
        words = {
            _ref_merge_word(s, left, right): n for s, n in words.items()
        }
    return merges


def _spark_merges(df, k):
    return [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in learn_bpe_merges(df, k).orderBy("step").collect()
    ]


def test_bpe_matches_oblivious_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert _spark_merges(docs, 10) == _ref_learn(texts, 10)


def test_bpe_overlap_and_tie_semantics(spark):
    # "aaa" forces the overlap rule: merging (a,a) must yield [aa, a],
    # and the deterministic tie-break must pick the lexicographically
    # first pair among equals.
    texts = ["aaa aaa bb bb", "aaa cc bb"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = _spark_merges(df, 6)
    assert got == _ref_learn(texts, 6)
    # counting phase counts overlapping pairs (2 per "aaa", standard
    # BPE), while the REWRITE is non-overlapping — pinned by the next
    # round's (aa, a</w>) merge existing at all
    aa = [m for m in got if (m[1], m[2]) == ("a", "a")]
    assert aa and aa[0][4] == 6
    assert any((m[1], m[2]) == ("aa", "a</w>") for m in got)


def test_bpe_driver_and_distributed_loops_agree(spark, sf_dir, monkeypatch):
    """The r13 vocab-size cutover: the driver-side merge loop (the
    default at fixture vocab sizes) and the distributed per-iteration
    Spark loop must produce the identical merge table — same pairs,
    same counts, same order."""
    from ureplicator_spark.operators import bpe as B

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    default_path = _spark_merges(docs, 8)
    monkeypatch.setattr(B, "BPE_DRIVER_VOCAB_MAX", 0)  # force distributed
    distributed = _spark_merges(docs, 8)
    assert default_path == distributed


def test_bpe_stops_when_pairs_exhausted(spark):
    # single-letter words collapse to one symbol after the first merge
    df = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    got = _spark_merges(df, 5)
    # only merge possible: (a, </w>); then every word is one symbol
    assert got == [(1, "a", END_OF_WORD, "a" + END_OF_WORD, 3)]


def test_segmentation_matches_reference_application(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    merges = _ref_learn(texts, 8)
    rules = [(m[1], m[2]) for m in merges]
    words = sorted(_ref_word_counts(texts))
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: tuple(r["syms"])
        for r in segment_with_merges(wdf, rules).collect()
    }
    for w in words:
        syms = tuple(w) + (END_OF_WORD,)
        for left, right in rules:
            syms = _ref_merge_word(syms, left, right)
        assert got[w] == syms, w


def test_segment_stats_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = bpe_segment_stats(docs, 8).collect()
    assert rows
    texts = docs.select("lang", "text").collect()
    by_lang: dict[str, int] = {}
    for r in texts:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + len(
            [w for w in re.split(r"\s+", r["text"].lower()) if w]
        )
    for r in rows:
        assert r["n_tokens"] == by_lang[r["lang"]]
        assert 0 < r["avg_syms_per_word"] <= r["avg_chars_per_word"]
        assert 0 < r["compression"] <= 1.0
