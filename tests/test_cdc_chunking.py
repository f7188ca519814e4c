"""Content-defined chunking: the vectorized Gear CDC is pinned
boundary-for-boundary against an oblivious per-byte Python reference
(with the reset-at-chunk-start semantics the docstring claims), plus
the partitioning invariant and the shift-resilience property that is
CDC's reason to exist."""

from __future__ import annotations

import pytest
import hashlib

from ureplicator_spark.operators.multimodal import (
    CDC_MASK_BITS,
    CDC_MAX_SIZE,
    CDC_MIN_SIZE,
    _gear_table,
    cdc_chunk_dedup,
    cdc_chunk_payloads,
    documents_as_media,
)

GEAR = _gear_table()


def _ref_chunks(payload: bytes, min_size=CDC_MIN_SIZE, mask_bits=CDC_MASK_BITS, max_size=CDC_MAX_SIZE):
    """Oblivious per-byte scan: h resets to 0 at every chunk start."""
    mask = (1 << mask_bits) - 1
    out, start, h = [], 0, 0
    i = 0
    n = len(payload)
    while i < n:
        h = ((h << 1) + GEAR[payload[i]]) & 0xFFFF
        length = i - start + 1
        if (length >= min_size and (h & mask) == 0) or length == max_size:
            out.append((start, length))
            start = i + 1
            h = 0
        i += 1
    if start < n:
        out.append((start, n - start))
    return out


def _pseudo_bytes(n: int, seed: str) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


@pytest.mark.slow
def test_cdc_matches_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = documents_as_media(docs)
    got: dict[int, list[tuple[int, int]]] = {}
    for r in cdc_chunk_payloads(media).orderBy("media_id", "chunk_idx").collect():
        got.setdefault(r["media_id"], []).append((r["start"], r["length"]))
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    for mid, text in texts.items():
        assert got[mid] == _ref_chunks(text.encode("utf-8")), mid


def test_cdc_chunks_partition_payload_and_hashes_are_content(spark):
    payload = _pseudo_bytes(4096, "partition")
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    rows = cdc_chunk_payloads(df).orderBy("chunk_idx").collect()
    pos = 0
    for r in rows:
        assert r["start"] == pos
        assert CDC_MIN_SIZE <= r["length"] <= CDC_MAX_SIZE or r["start"] + r["length"] == len(payload)
        assert r["chunk_hash"] == hashlib.md5(payload[r["start"] : r["start"] + r["length"]]).hexdigest()
        pos += r["length"]
    assert pos == len(payload)


def test_cdc_boundaries_realign_after_prefix_insertion(spark):
    base = _pseudo_bytes(4096, "shift")
    shifted = b"xyz" + base  # 3-byte insertion at the front
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "media_id long, payload binary"
    )
    rows = cdc_chunk_payloads(df).collect()
    h1 = {r["chunk_hash"] for r in rows if r["media_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["media_id"] == 2}
    # fixed-size chunking would share ~nothing; CDC re-aligns after the
    # first content-defined cut, so the overwhelming majority of chunk
    # hashes survive the insertion
    shared = h1 & h2
    assert len(shared) >= int(0.8 * len(h1))


def test_cdc_dedup_counts_duplicate_chunks(spark):
    a = _pseudo_bytes(2048, "dup")
    b = _pseudo_bytes(512, "other") + a  # b embeds all of a after an offset
    df = spark.createDataFrame([(1, a), (2, b), (3, _pseudo_bytes(512, "uniq"))],
                               "media_id long, payload binary")
    out = {r["chunk_hash"]: r for r in cdc_chunk_dedup(df).collect()}
    assert out, "embedded copy must produce shared chunks"
    for r in out.values():
        assert r["n_media"] >= 2
        assert r["dedupable_bytes"] == (r["n_occur"] - 1) * r["chunk_bytes"]


def test_cdc_short_payloads_are_single_whole_chunks(spark):
    """Payloads shorter than the 16-byte Gear window (including
    1-byte) must come back as exactly one whole-payload chunk — the
    vectorized scan's shift loop only has n terms there (regression:
    it used to broadcast-error on n < 16)."""
    import hashlib

    cases = [(1, b"x"), (2, b"ab"), (3, _pseudo_bytes(15, "short")),
             (4, _pseudo_bytes(16, "edge")), (5, _pseudo_bytes(17, "over"))]
    df = spark.createDataFrame(cases, "media_id long, payload binary")
    rows = {r["media_id"]: r for r in cdc_chunk_payloads(df).collect()}
    for mid, payload in cases:
        r = rows[mid]
        assert (r["chunk_idx"], r["start"], r["length"]) == (0, 0, len(payload))
        assert r["chunk_hash"] == hashlib.md5(payload).hexdigest()
        # and the per-byte reference agrees
        assert _ref_chunks(payload) == [(0, len(payload))]
