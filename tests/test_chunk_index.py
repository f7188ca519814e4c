"""Persisted CDC chunk index: append≡rebuild, probe equals an
oblivious recompute, and byte-identical payloads reach containment
exactly 1.0."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ureplicator_spark.caching import pin_scope
from ureplicator_spark.operators.multimodal import documents_as_media
from ureplicator_spark.sources.chunk_index import (
    append_to_chunk_index,
    build_chunk_index,
    incremental_payload_dedup,
)


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="chunk_index_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_media(docs)


@pytest.mark.slow
def test_append_equals_single_build(spark, sf_dir, tmp_root):
    media = _media(spark, sf_dir)
    a = media.filter("media_id % 2 = 0")
    b = media.filter("media_id % 2 = 1")
    build_chunk_index(a, tmp_root + "/inc")
    append_to_chunk_index(b, tmp_root + "/inc")
    build_chunk_index(media, tmp_root + "/full")
    inc = {
        tuple(r)
        for r in spark.read.parquet(tmp_root + "/inc/chunks").collect()
    }
    full = {
        tuple(r)
        for r in spark.read.parquet(tmp_root + "/full/chunks").collect()
    }
    assert inc == full


@pytest.mark.slow
def test_probe_matches_oblivious_recompute(spark, sf_dir, tmp_root):
    media = _media(spark, sf_dir)
    corpus = media.filter("media_id % 10 < 8")
    batch = media.filter("media_id % 10 >= 8")
    build_chunk_index(corpus, tmp_root)
    with pin_scope():
        got = {
            (r["new_media"], r["corpus_media"]): (
                r["shared_chunks"],
                r["shared_bytes"],
                r["containment"],
            )
            for r in incremental_payload_dedup(spark, tmp_root, batch).collect()
        }
    # oblivious: chunk EVERYTHING in one pass, intersect hash sets
    from ureplicator_spark.operators.multimodal import cdc_chunk_payloads

    rows = cdc_chunk_payloads(media).collect()
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # HALF_UP like Spark's F.round — Python round() is banker's
    # rounding and diverges on exact ties at the 7th decimal
    from decimal import ROUND_HALF_UP, Decimal

    def _round6(num: int, den: int) -> float:
        return float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    new_ids = {r["media_id"] for r in batch.select("media_id").collect()}
    expect = {}
    for nid in new_ids:
        nch = by_media.get(nid, [])
        tot = sum(c["length"] for c in nch)
        for cid, cch in by_media.items():
            if cid == nid or cid in new_ids:
                continue
            corpus_hashes = {c["chunk_hash"] for c in cch}
            shared = [c for c in nch if c["chunk_hash"] in corpus_hashes]
            if shared:
                sb = sum(c["length"] for c in shared)
                expect[(nid, cid)] = (len(shared), sb, _round6(sb, tot))
    assert got == expect


@pytest.mark.slow
def test_exact_copy_has_containment_one(spark, sf_dir, tmp_root):
    media = _media(spark, sf_dir)
    corpus = media.filter("media_id < 100")
    build_chunk_index(corpus, tmp_root)
    # re-submit payload 7 under a new id: byte-identical chunks
    batch = corpus.filter("media_id = 7").selectExpr(
        "media_id + 100000 AS media_id", "payload"
    )
    with pin_scope():
        rows = incremental_payload_dedup(spark, tmp_root, batch).collect()
    hit = [r for r in rows if r["corpus_media"] == 7]
    assert hit and hit[0]["containment"] == 1.0


@pytest.mark.slow
def test_probe_scan_is_bucket_pruned(spark, sf_dir, tmp_root):
    """The index scan must prune at the partition level to the
    batch's bucket ids — the chunk-index analog of the lexical
    index's tb pruning — and never read unrelated buckets."""
    import re

    from ureplicator_spark.plans.inspect import plan_string

    media = _media(spark, sf_dir)
    build_chunk_index(media.filter("media_id < 400"), tmp_root)
    with pin_scope():
        probe = incremental_payload_dedup(
            spark, tmp_root, media.filter("media_id >= 400")
        )
        plan = plan_string(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*bucket[^\]]*)\]", plan)
    assert m, f"no bucket partition filter in plan:\n{plan}"


@pytest.mark.slow
def test_compaction_preserves_probe_and_shrinks_files(spark, sf_dir, tmp_root):
    """append×N → compact → identical index rows + identical probe
    output, with strictly fewer data files per compacted bucket (the
    small-file rewrite the append-only store needs at scale)."""
    import os

    from ureplicator_spark.sources.chunk_index import (
        compact_chunk_index,
        read_chunk_index,
    )

    media = _media(spark, sf_dir)
    root = tmp_root + "/c"
    build_chunk_index(media.filter("media_id % 4 = 0"), root)
    for k in (1, 2, 3):
        append_to_chunk_index(media.filter(f"media_id % 4 = {k}"), root)

    def files_per_bucket():
        out = {}
        base = root + "/chunks"
        for b in os.listdir(base):
            if b.startswith("bucket="):
                out[b] = len(
                    [f for f in os.listdir(f"{base}/{b}") if not f.startswith(("_", "."))]
                )
        return out

    probe = media.filter("media_id < 50")
    before_rows = {tuple(r) for r in read_chunk_index(spark, root).collect()}
    with pin_scope():
        before_pairs = {
            tuple(r) for r in incremental_payload_dedup(spark, root, probe).collect()
        }
    before_files = files_per_bucket()

    done = compact_chunk_index(spark, root, target_bytes=128 * 1024 * 1024)
    assert done, "multi-append buckets should exceed the 1-file target"

    after_files = files_per_bucket()
    for bucket, n_before, n_after in done:
        assert after_files[f"bucket={bucket}"] == n_after < n_before
    assert {tuple(r) for r in read_chunk_index(spark, root).collect()} == before_rows
    with pin_scope():
        assert {
            tuple(r) for r in incremental_payload_dedup(spark, root, probe).collect()
        } == before_pairs

    # idempotent: a second pass finds nothing to shrink
    assert compact_chunk_index(spark, root, target_bytes=128 * 1024 * 1024) == []
