"""Persisted perceptual-fingerprint index — incremental media dedup.

A 100 TB media corpus ingests daily batches; re-hashing the corpus per
batch is the cost this index removes. Fingerprints (64-bit dHash /
acoustic energy-delta hash) are PER-ITEM local state — no global
order, no corpus statistic — so the index both builds once per
snapshot AND appends exactly (append ≡ rebuild, the
winnow_fingerprints discipline), and its standing size is 16 bytes an
item however large the payloads are.

Layout:

    <root>/dhash/     (media_id, dhash)      image difference hashes
    <root>/audiofp/   (media_id, dhash)      acoustic energy-delta hashes
    <root>/framesig/  (media_id, frame_idx, fhash)  per-frame dHashes
    <root>/framegram/ (media_id, gram)       distinct 4-frame shingles

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
    frame_shingles,
    image_dhash,
    video_frame_hashes,
)

# 64-bit whole-payload fingerprint kinds (the Hamming-banded probe)
_SECTIONS = {"dhash": image_dhash, "audiofp": audio_fingerprint}
# shot-level sections: per-frame hash sequence + its distinct shingle
# set (the equi-join probe) — all four are per-item local state, so
# every section appends exactly (append == rebuild)
_FRAME_SECTIONS = {
    "framesig": video_frame_hashes,
    "framegram": lambda media: frame_shingles(video_frame_hashes(media)),
}


def build_media_index(media: DataFrame, root: str, mode: str = "overwrite") -> None:
    """ONE corpus payload pass for every fingerprint kind: the fused
    ``all_fingerprints`` mapInPandas emits dhash + audiofp + framesig
    rows from a single Arrow round-trip (same kernels as the
    standalone hashers — value-identical, pinned in tests), the
    persisted hash rows are split into sections JVM-side, and the
    framegram section derives from the already-computed framesig rows
    instead of re-hashing every payload a fourth time. Previously each
    section re-shipped the whole corpus across the JVM/Python boundary
    (4 payload passes); payloads now cross once (r12 optimization —
    the guide's 'move heavy bytes once', applied to the Arrow
    boundary). ``mode='append'`` folds a batch in — per-item local
    state, so the appended index equals a full rebuild over
    old ∪ batch."""
    from ureplicator_spark.operators.multimodal import (
        FP_KIND_AUDIO,
        FP_KIND_DHASH,
        FP_KIND_FRAME,
        all_fingerprints,
    )

    fused = all_fingerprints(media).persist()
    try:
        # Materialize the fused Arrow pass ONCE before fanning out the
        # section writes: concurrent first-touch would run the payload
        # hash pass per thread instead of filling the cache once.
        fused.count()
        framesig = fused.filter(F.col("kind") == FP_KIND_FRAME).select(
            "media_id", "frame_idx", F.col("fp").alias("fhash")
        )
        # The four section writes are independent jobs over the cached
        # fused rows targeting disjoint directories — run them from a
        # small driver pool so each write's commit/stage tail
        # back-fills the others' idle cores (guide §2.6; the minhash
        # build-chain precedent). framegram derives from the cached
        # framesig ROWS, not the framesig file, so ordering is free.
        from concurrent.futures import ThreadPoolExecutor

        def _w(df, name):
            df.write.mode(mode).parquet(f"{root}/{name}")

        jobs = [
            (fused.filter(F.col("kind") == FP_KIND_DHASH).select(
                "media_id", F.col("fp").alias("dhash")), "dhash"),
            (fused.filter(F.col("kind") == FP_KIND_AUDIO).select(
                "media_id", F.col("fp").alias("dhash")), "audiofp"),
            (framesig, "framesig"),
            (frame_shingles(framesig), "framegram"),
        ]
        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = [pool.submit(_w, df, name) for df, name in jobs]
            for f in futures:
                f.result()
    finally:
        fused.unpersist()


def append_to_media_index(batch_media: DataFrame, root: str) -> None:
    """Post-ingest step: fingerprint the (deduped) batch and append."""
    build_media_index(batch_media, root, mode="append")


def index_fingerprints(spark: SparkSession, root: str, kind: str = "dhash") -> DataFrame:
    """The persisted rows for ``kind``. Fails loudly when absent."""
    if kind not in _SECTIONS and kind not in _FRAME_SECTIONS:
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
    if kind not in _SECTIONS:
        raise ValueError(
            f"kind {kind!r} is not a 64-bit banded fingerprint; "
            "shot-level probes use incremental_frame_dedup"
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


def incremental_frame_dedup(
    spark: SparkSession,
    root: str,
    batch_media: DataFrame,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Shot-level overlap of a NEW payload batch against the persisted
    frame-shingle section: (new_media, corpus_media, shared_shingles,
    n_new, n_corpus, overlap) — the re-cut-clip lifecycle twin of
    :func:`incremental_media_dedup`. The batch is frame-hashed and
    shingled locally (it is small); the corpus side is the standing
    ``framegram`` rows, probed by a shingle-keyed equi-join — never
    batch × corpus, and the corpus payloads are never re-read.
    Corpus shingles held by more than ``max_df`` items are dropped
    before the probe (stop-shingles, mirroring
    frame_shingle_near_pairs): the standing section is the unbounded
    side, and one hot shingle there would fan every batch probe out
    to its full posting list. Self-pairs are excluded so re-probing
    after an append stays clean; corpus-side shingle counts aggregate
    only the candidate items' rows (pair-bounded) and stay UNCAPPED —
    the true signature size is the containment denominator."""
    from ureplicator_spark.caching import pin
    from ureplicator_spark.functions import round6f
    from ureplicator_spark.operators.multimodal import (
        frame_shingles,
        video_frame_hashes,
    )

    new_grams = pin(frame_shingles(video_frame_hashes(batch_media)))
    corpus = index_fingerprints(spark, root, "framegram")
    # hot-gram anti-join, not a df window: the aggregate is map-side
    # combinable and its output (grams with df > max_df) is at most
    # |section|/max_df rows — AQE broadcasts it, so the cap adds no
    # exchange to the probe branch.
    hot = (
        corpus.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("gram")
    )
    corpus_capped = corpus.join(hot, "gram", "left_anti")
    shared = (
        new_grams.alias("n")
        .join(
            corpus_capped.alias("c"),
            (F.col("n.gram") == F.col("c.gram"))
            & (F.col("n.media_id") != F.col("c.media_id")),
        )
        .groupBy(
            F.col("n.media_id").alias("new_media"),
            F.col("c.media_id").alias("corpus_media"),
        )
        .agg(F.count("*").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )
    n_new = new_grams.groupBy(F.col("media_id").alias("new_media")).agg(
        F.count("*").alias("n_new")
    )
    cand_corpus = shared.select(
        F.col("corpus_media").alias("media_id")
    ).distinct()
    n_corpus = (
        corpus.join(cand_corpus, "media_id")
        .groupBy(F.col("media_id").alias("corpus_media"))
        .agg(F.count("*").alias("n_corpus"))
    )
    return (
        shared.join(n_new, "new_media")
        .join(n_corpus, "corpus_media")
        .select(
            "new_media",
            "corpus_media",
            "shared_shingles",
            "n_new",
            "n_corpus",
            round6f(
                F.col("shared_shingles") / F.least(F.col("n_new"), F.col("n_corpus"))
            ).alias("overlap"),
        )
        .orderBy("new_media", "corpus_media")
    )


def delete_from_media_index(
    spark: SparkSession, root: str, media_ids: list[int]
) -> dict:
    """Right-to-be-forgotten for the perceptual-fingerprint index:
    every section (whole-payload dHash / acoustic hash, per-frame
    hash sequences, frame shingles) is member-specific content-derived
    data. The sections are deliberately bytes-per-item small and
    unpartitioned, so each is a filtered full rewrite
    (rewrite_plain_without — survivors checkpointed before the
    overwrite). Fingerprints are per-item local state: the deleted
    index equals a fresh build over the surviving items row-for-row,
    and a repeated delete no-ops."""
    from ureplicator_spark.sources.rewrite import rewrite_plain_without

    ids = [int(i) for i in media_ids]
    removed = {
        section: rewrite_plain_without(
            spark, f"{root}/{section}", "media_id", ids
        )
        for section in list(_SECTIONS) + list(_FRAME_SECTIONS)
    }
    return {"rows_removed": removed}
