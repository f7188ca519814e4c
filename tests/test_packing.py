"""Sequence packing: the two-phase distributed prefix sum must match
an oblivious single-scan reference for any token-count shape, conserve
tokens exactly, continue across a streaming token_offset, and confine
any single-partition exchange to the bucket-total table (never the
corpus)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ureplicator_spark.operators.packing import pack_sequences
from ureplicator_spark.operators.text import doc_token_offsets
from ureplicator_spark.plans.inspect import plan_string


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_offsets_match_oblivious_scan(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {
        r["doc_id"]: (r["n_tokens"], r["start"], r["end"])
        for r in doc_token_offsets(docs).collect()
    }
    # oblivious: count tokens in Python, running-sum in doc_id order
    texts = sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    )
    acc, want = 0, {}
    for did, text in texts:
        n = len(text) - len(text.replace(" ", "")) + 1
        want[did] = (n, acc, acc + n)
        acc += n
    assert got == want


def test_token_offset_continues_the_cumsum(spark, sf_dir):
    """The streaming-continuation contract: starting the running total
    at K shifts every interval by exactly K."""
    docs = _docs(spark, sf_dir).limit(50)
    base = {r["doc_id"]: (r["start"], r["end"]) for r in doc_token_offsets(docs).collect()}
    moved = {
        r["doc_id"]: (r["start"], r["end"])
        for r in doc_token_offsets(docs, token_offset=1000).collect()
    }
    assert moved == {d: (s + 1000, e + 1000) for d, (s, e) in base.items()}


def test_packing_conserves_tokens_and_fills_capacity(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cap = 256
    rows = pack_sequences(docs, capacity=cap).collect()
    total = sum(
        len(t) - len(t.replace(" ", "")) + 1
        for t in (r["text"] for r in docs.select("text").collect())
    )
    assert sum(r["seq_tokens"] for r in rows) == total
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    assert all(r["seq_tokens"] == cap for r in rows[:-1])
    assert 0 < rows[-1]["seq_tokens"] <= cap
    # a fragment-counted doc is one that crosses either boundary; a
    # sequence holds at most 2 boundary fragments by construction
    assert all(0 <= r["n_fragments"] <= min(2, r["n_docs"]) for r in rows)


def test_single_partition_exchange_only_on_bucket_table(spark, sf_dir):
    """The scale contract: the corpus-sized cumsum must run as
    bucket-partitioned windows; the only permissible SinglePartition
    exchange is the bucket-TOTAL window (corpus/4096 rows)."""
    plan = plan_string(pack_sequences(_docs(spark, sf_dir)), mode="simple")
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 1, plan
    assert re.search(r"Exchange hashpartitioning\(bucket", plan), plan


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=2, max_value=16),
)
def test_property_matches_python_reference(spark, counts, cap):
    """Random corpora: packing equals a pure-Python concatenate-and-
    chunk over the same word counts (doc i gets counts[i]+1 tokens —
    the +1 is the separator formula on n-space text)."""
    rows = [(i, " ".join(["w"] * (c + 1))) for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = [tuple(r) for r in pack_sequences(docs, capacity=cap).collect()]

    acc, spans = 0, []
    for i, c in enumerate(counts):
        n = c + 1
        spans.append((i, acc, acc + n))
        acc += n
    expect: dict[int, list[int]] = {}
    for _i, s, e in spans:
        for sid in range(s // cap, (e - 1) // cap + 1):
            st_, en = max(s, sid * cap), min(e, (sid + 1) * cap)
            frag = 1 if (s < sid * cap or e > (sid + 1) * cap) else 0
            agg = expect.setdefault(sid, [0, 0, 0])
            agg[0] += 1
            agg[1] += frag
            agg[2] += en - st_
    want = [(sid, *expect[sid]) for sid in sorted(expect)]
    assert got == want
