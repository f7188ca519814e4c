"""Persisted perceptual-fingerprint index — incremental media dedup.

A 100 TB media corpus ingests daily batches; re-hashing the corpus per
batch is the cost this index removes. Fingerprints (64-bit dHash /
acoustic energy-delta hash) are PER-ITEM local state — no global
order, no corpus statistic — so the index both builds once per
snapshot AND appends exactly (append ≡ rebuild, the
winnow_fingerprints discipline), and its standing size is 16 bytes an
item however large the payloads are.

Layout:

    <root>/dhash/     (media_id, dhash)  image difference hashes
    <root>/audiofp/   (media_id, dhash)  acoustic energy-delta hashes

The probe is the banding pigeonhole join from
``operators/multimodal.dhash_near_pairs``: batch fingerprints (small)
band-join the persisted section — bucket-local work, never
batch × corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.fsutil import fs_exists
from ureplicator_spark.operators.multimodal import (
    audio_fingerprint,
    image_dhash,
)

_SECTIONS = {"dhash": image_dhash, "audiofp": audio_fingerprint}


def build_media_index(media: DataFrame, root: str, mode: str = "overwrite") -> None:
    """One corpus pass per fingerprint kind: hash every payload
    (map-only mapInPandas), persist the 16-byte-per-item hash rows.
    ``mode='append'`` folds a batch in — per-item local state, so the
    appended index equals a full rebuild over old ∪ batch."""
    for section, hasher in _SECTIONS.items():
        hasher(media).write.mode(mode).parquet(f"{root}/{section}")


def append_to_media_index(batch_media: DataFrame, root: str) -> None:
    """Post-ingest step: fingerprint the (deduped) batch and append."""
    build_media_index(batch_media, root, mode="append")


def index_fingerprints(spark: SparkSession, root: str, kind: str = "dhash") -> DataFrame:
    """The persisted (media_id, dhash) rows for ``kind``. Fails loudly
    when absent."""
    if kind not in _SECTIONS:
        raise ValueError(f"unknown fingerprint kind {kind!r}")
    path = f"{root}/{kind}"
    if not fs_exists(spark, path):
        raise FileNotFoundError(
            f"{path}: {kind} section missing — build with "
            "build_media_index(media, root)"
        )
    return spark.read.parquet(path)


def incremental_media_dedup(
    spark: SparkSession,
    root: str,
    batch_media: DataFrame,
    kind: str = "dhash",
    max_hamming: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """Flag batch payloads perceptually near an INDEXED item without
    re-hashing the corpus: hash the batch (it is small), band both
    sides, equi-join on (band, band-value) — the pigeonhole guarantees
    every pair within ``max_hamming`` shares a band — then verify with
    the exact XOR popcount. Returns (new_media, corpus_media, hamming).

    Scale shape: the corpus side is the standing 16-byte-per-item hash
    table (band values derive in the scan projection); candidates are
    bucket-sized; nothing batch × corpus. Equal to running the
    from-scratch near-pair operator over corpus ∪ batch and keeping
    the cross pairs — pinned in tests."""
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"pigeonhole needs n_bands >= max_hamming+1 "
            f"({n_bands} < {max_hamming + 1})"
        )
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    hasher = _SECTIONS[kind]

    def banded(hashes: DataFrame, side: str) -> DataFrame:
        return hashes.select(
            F.col("media_id").alias(f"{side}_media"),
            F.col("dhash").alias(f"{side}_hash"),
            F.explode(F.array(*[F.lit(b) for b in range(n_bands)])).alias("band"),
        ).select(
            f"{side}_media",
            f"{side}_hash",
            "band",
            F.expr(f"shiftright({side}_hash, band * {band_bits}) & {mask}").alias("bv"),
        )

    batch = banded(hasher(batch_media), "new")
    corpus = banded(index_fingerprints(spark, root, kind), "corpus")
    cand = (
        batch.join(corpus, ["band", "bv"])
        .filter(F.col("new_media") != F.col("corpus_media"))
        .select("new_media", "corpus_media", "new_hash", "corpus_hash")
        .distinct()
    )
    return (
        cand.select(
            "new_media",
            "corpus_media",
            F.bit_count(F.col("new_hash").bitwiseXOR(F.col("corpus_hash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("new_media", "corpus_media")
    )
