"""Persisted MinHash-LSH signature index — incremental dedup at scale.

`operators/dedup.lsh_candidate_pairs` shingles and signs the whole
corpus per query run. A production pipeline ingests daily batches into
a 100 TB corpus; re-signing the corpus per batch is the cost this
index removes: signatures are built ONCE per corpus snapshot and
persisted, then each new batch is signed (it is small), banded, and
joined against ONLY the matching band partitions.

Layout:

    <root>/signatures/              (doc_id, m0..m{K-1}) wide rows
    <root>/bands/band=<b>/          (doc_id, band_hash) banded rows
    <root>/shingle_arrays/          (doc_id, toks, s) rarest-first
                                    distinct-shingle arrays (optional)

The band table is partitioned by band id so an incremental probe scans
the band directories with partition pruning; the join key is
(band, band_hash), the same bucket-local topology as the in-query LSH
pass — never all-pairs. Appending a deduped batch's signatures keeps
the index current (`append_to_minhash_index`), the same
snapshot-then-append discipline as `ivf_index.py`.

The optional ``shingle_arrays`` section serves the prefix-filter
family (containment + PPJoin) the same way: the shingle→global-count→
sort build runs once per corpus snapshot instead of per query. Unlike
signatures, the rarest-first ORDER is a whole-corpus property (global
shingle counts move under appends, and PPJoin's completeness proof
requires one total order shared by every doc), so appends INVALIDATE
the section — `index_shingle_arrays` then fails loudly until
`refresh_shingle_arrays` rebuilds it from the full corpus.

Hash portability: signatures come from `operators/dedup.minhash_wide`
(shuffle-free array fold), so index contents equal what the oracle
computes over the same documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.caching import pin
from ureplicator_spark.fsutil import delete_recursive, fs_exists
from ureplicator_spark.operators.dedup import (
    N_BANDS,
    N_MINHASH,
    banded_signatures,
    minhash_wide,
    pairs_from_signatures,
    shingle_docarr,
)

_banded = banded_signatures  # shared with operators/dedup (one banding impl)


def build_minhash_index(
    documents: DataFrame,
    root: str,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
    mode: str = "overwrite",
    shingle_arrays: bool = False,
) -> None:
    """One corpus pass: persist wide signatures + band-partitioned
    banding rows. The signature build itself is shuffle-free (array
    fold); the only exchange is the band-partitioned write. With
    ``shingle_arrays=True`` also persists the rarest-first distinct-
    shingle array table that the containment/PPJoin probes read
    (snapshot builds only — appends never write this section, they
    invalidate it)."""
    wide = minhash_wide(documents, n_hashes).persist()

    def _sig_chain() -> None:
        from ureplicator_spark.fsutil import (
            cluster_for_partitioned_write,
            derived_files_per_partition,
        )

        wide.write.mode(mode).parquet(root + "/signatures")
        # clustered by band: one file per band directory instead of
        # one per (task, band) — guide §6, the chunk-index measurement;
        # file count per band size-derived (1 at local SFs)
        cluster_for_partitioned_write(
            _banded(wide, n_bands, n_hashes), "band", "doc_id",
            derived_files_per_partition(documents, n_bands),
        ).write.mode(mode).partitionBy("band").parquet(root + "/bands")

    if not (shingle_arrays and mode != "append"):
        _sig_chain()
        wide.unpersist()
        return

    # Full snapshot build: six section jobs with a three-chain
    # dependency DAG — (signatures → bands → pairs), (shingle_arrays →
    # kmv), (winnow) — run as concurrent driver threads so each
    # chain's stage tails back-fill the others' idle cores (guide
    # §2.6: a single local/cluster job rarely saturates the executors
    # through its stage barriers; independent jobs overlap for free).
    # Writes target disjoint section directories; chains only share
    # the persisted `wide`, whose first materialization is
    # thread-safe. Measured at sf0.1: 5.8 s warm / ~17 s cold
    # sequential → bounded by the longest chain.
    from concurrent.futures import ThreadPoolExecutor

    from ureplicator_spark.caching import pin_scope

    spark = documents.sparkSession

    # Each chain runs under its OWN pin scope: pin_scope is
    # thread-local, so pins the section builders create inside a pool
    # thread would otherwise escape the caller's scope and leak past
    # the build (caught by test_api.py's cache-hygiene gauge). The
    # pinned intermediates are build-internal — every section is on
    # parquet when the chain returns — so releasing at chain end is
    # exactly the invocation-scoped contract.
    def _pairs_chain() -> None:
        with pin_scope():
            _sig_chain()
            refresh_pairs(spark, root)

    def _shingle_chain() -> None:
        with pin_scope():
            refresh_shingle_arrays(documents, root)
            refresh_kmv_synopses(documents, root)

    def _winnow_chain() -> None:
        with pin_scope():
            refresh_winnow_fingerprints(documents, root)

    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(c)
                for c in (_pairs_chain, _shingle_chain, _winnow_chain)
            ]
            for f in futures:
                f.result()
    finally:
        wide.unpersist()


def refresh_shingle_arrays(documents: DataFrame, root: str) -> None:
    """(Re)build the ``shingle_arrays`` section from the FULL corpus —
    the post-append step that restores the one-total-order invariant
    the prefix-filter probes require."""
    shingle_docarr(documents).write.mode("overwrite").parquet(
        root + "/shingle_arrays"
    )


def refresh_winnow_fingerprints(documents: DataFrame, root: str) -> None:
    """(Re)build the ``winnow_fingerprints`` section: each document's
    winnowed local fingerprints (Schleimer SIGMOD'03 — the MOSS
    overlap-detection primitive), persisted once per corpus snapshot
    so the per-doc stats and the shared-fingerprint pair probes skip
    the md5+window-fold chain entirely. Unlike shingle_arrays, the
    fingerprints are PER-DOC local state (no global order, no corpus
    statistic), so appends extend the section exactly like signatures
    — append ≡ rebuild, pinned in tests."""
    from ureplicator_spark.operators.text import winnow_fingerprints

    winnow_fingerprints(documents).write.mode("overwrite").parquet(
        root + "/winnow_fingerprints"
    )


def append_winnow_fingerprints(batch_documents: DataFrame, root: str) -> None:
    """Fold a batch's fingerprints into the standing section — per-doc
    local state, so appending the batch's rows IS the full rebuild
    over old ∪ batch (no invalidation, no corpus re-scan)."""
    from ureplicator_spark.operators.text import winnow_fingerprints

    winnow_fingerprints(batch_documents).write.mode("append").parquet(
        root + "/winnow_fingerprints"
    )


def index_winnow_fingerprints(spark: SparkSession, root: str) -> DataFrame:
    """The persisted (doc_id, n_kgrams, fingerprints) winnowing table.
    Fails loudly when absent."""
    path = root + "/winnow_fingerprints"
    if not fs_exists(spark, path):
        raise FileNotFoundError(
            f"{path}: winnow_fingerprints section missing — build with "
            "refresh_winnow_fingerprints(documents, root) or "
            "append_winnow_fingerprints(batch, root)"
        )
    return spark.read.parquet(path)


def refresh_kmv_synopses(documents: DataFrame, root: str) -> None:
    """(Re)build the per-source KMV synopsis section from the CURRENT
    shingle arrays + the corpus' (doc_id, source) mapping. KMV
    synopses are the canonical mergeable sketch (k smallest distinct
    hashes per source — Beyer SIGMOD'07), G×k rows total, so a
    standing copy turns every cross-source overlap estimate into a
    synopsis-rows-only query; the sketch members equal what an oracle
    computes from scratch because they derive from the same md5 over
    the same distinct shingles."""
    from ureplicator_spark.operators.sketch import kmv_registers

    spark = documents.sparkSession
    sh = index_shingle_arrays(spark, root).select(
        "doc_id", F.explode("toks").alias("shingle")
    )
    keyed = sh.join(documents.select("doc_id", "source"), "doc_id").select(
        "source", "shingle"
    )
    kmv_registers(keyed, "source", "shingle").write.mode("overwrite").parquet(
        root + "/kmv_synopses"
    )


def index_kmv_synopses(spark: SparkSession, root: str) -> DataFrame:
    """The persisted per-source KMV synopses (source, h, r). Fails
    loudly when absent."""
    path = root + "/kmv_synopses"
    if not fs_exists(spark, path):
        raise FileNotFoundError(
            f"{path}: kmv_synopses section missing — build with "
            "refresh_kmv_synopses(documents, root) or "
            "merge_kmv_synopses(batch, root)"
        )
    return spark.read.parquet(path)


def merge_kmv_synopses(batch_documents: DataFrame, root: str) -> None:
    """Fold a BATCH into the standing synopses by the KMV merge
    property (Beyer SIGMOD'07): the k smallest distinct hashes of
    A ∪ B are all among top-k(A) ∪ top-k(B) — every element of the
    union's top-k belongs to one side's top-k — so merging the stored
    synopsis with the batch's synopsis and re-ranking yields EXACTLY
    the synopsis a full rebuild would (equivalence pinned in
    tests/test_operators_extra.py). This makes the KMV section the
    append-MAINTAINABLE kind: per-append cost is O(batch shingles +
    G·k synopsis rows), never a corpus re-scan — the defining virtue
    of a mergeable sketch."""
    from pyspark.sql import Window

    from ureplicator_spark.operators.dedup import shingles
    from ureplicator_spark.operators.sketch import KMV_K, kmv_registers

    spark = batch_documents.sparkSession
    keyed = (
        shingles(batch_documents)
        .join(batch_documents.select("doc_id", "source"), "doc_id")
        .select("source", F.col("shingle"))
    )
    batch_regs = kmv_registers(keyed, "source", "shingle", KMV_K)
    merged = (
        index_kmv_synopses(spark, root)
        .select("source", "h")
        .unionByName(batch_regs.select("source", "h"))
        .groupBy("source", "h")
        .agg(F.lit(1).alias("_one"))
        .select("source", "h")
    )
    w = Window.partitionBy("source").orderBy("h")
    topk = (
        merged.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_K)
        # G·k rows: checkpoint so the overwrite below never reads the
        # directory it is replacing
        .localCheckpoint()
    )
    topk.write.mode("overwrite").parquet(root + "/kmv_synopses")
    from ureplicator_spark.caching import release_checkpoint

    release_checkpoint(topk)


def refresh_pairs(spark: SparkSession, root: str) -> None:
    """(Re)materialize the corpus candidate-pair table from the
    CURRENT signatures/bands — the near-dup pair set IS the primary
    output of a dedup index build, and at least five downstream views
    (the pair listing, the threshold sweep, the cross-signal audit and
    the cluster rollups) consume the same rows, so a snapshot build
    pays the band self-join once and probes read parquet. Runs off the
    persisted sections, so it composes with append (append sigs →
    refresh_pairs) without re-shingling anything."""
    index_lsh_pairs(spark, root).write.mode("overwrite").parquet(
        root + "/pairs"
    )


def append_to_minhash_index(
    documents: DataFrame,
    root: str,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> None:
    """Add a (deduped) batch's signatures to the index — the daily
    post-ingest step. Append-only for signatures/bands; the
    shingle_arrays section (if present) is DELETED, not appended:
    batch-local global counts would order the new arrays differently
    from the old ones, silently breaking PPJoin completeness — a loud
    missing-section error on the next probe is the honest failure."""
    spark = documents.sparkSession
    build_minhash_index(documents, root, n_bands, n_hashes, mode="append")
    for section in ("shingle_arrays", "pairs"):
        # snapshot-scoped: arrays because the rarest-first global
        # order moves with counts, pairs because the new batch's cross
        # pairs are absent — a loud missing-section error beats
        # silently stale results (refresh_pairs restores pairs from
        # the appended sections; refresh_shingle_arrays needs the full
        # corpus)
        if fs_exists(spark, root + "/" + section):
            delete_recursive(spark, root + "/" + section)
    # the KMV section is MERGEABLE, not snapshot-scoped: fold the
    # batch's synopsis in (exact, O(batch) — see merge_kmv_synopses)
    if fs_exists(spark, root + "/kmv_synopses"):
        merge_kmv_synopses(documents, root)
    # winnowing fingerprints are PER-DOC local state: appending the
    # batch's rows equals a full rebuild over old ∪ batch
    if fs_exists(spark, root + "/winnow_fingerprints"):
        append_winnow_fingerprints(documents, root)


def index_lsh_pairs(
    spark: SparkSession,
    root: str,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """Corpus near-dup candidate pairs + estimated Jaccard served from
    the PERSISTED index — byte-identical to
    ``operators/dedup.lsh_candidate_pairs`` over the same corpus (same
    signatures, same banding, same rounding) but the shingle→K-hash
    build is amortized into the index: a probe pays only the
    band-partitioned self-join and K column compares per candidate."""
    return pairs_from_signatures(
        spark.read.parquet(root + "/signatures"),
        spark.read.parquet(root + "/bands"),
        n_hashes,
    )


def index_pairs(spark: SparkSession, root: str) -> DataFrame:
    """The MATERIALIZED corpus candidate-pair table (doc_a, doc_b,
    est_jaccard) — the snapshot build's primary output, shared by
    every pair-consuming view. Fails loudly when absent/invalidated;
    `refresh_pairs` rebuilds it from the (possibly appended)
    signature sections without re-shingling."""
    path = root + "/pairs"
    if not fs_exists(spark, path):
        raise FileNotFoundError(
            f"{path}: pairs section missing or invalidated by an append — "
            "rebuild with refresh_pairs(spark, root)"
        )
    return spark.read.parquet(path)


def index_shingle_arrays(spark: SparkSession, root: str) -> DataFrame:
    """The persisted rarest-first (doc_id, toks, s) array table for the
    containment/PPJoin probes. Fails loudly when the section is absent
    or was invalidated by an append (see module docstring)."""
    path = root + "/shingle_arrays"
    if not fs_exists(spark, path):
        raise FileNotFoundError(
            f"{path}: shingle_arrays section missing or invalidated by an "
            "append — rebuild with refresh_shingle_arrays(full_corpus, root)"
        )
    return spark.read.parquet(path)


def incremental_dedup(
    spark: SparkSession,
    root: str,
    new_documents: DataFrame,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against the persisted corpus
    index: (new_doc, corpus_doc, est_jaccard).

    The batch is signed locally (small), banded, and joined against
    the band table on (band, band_hash) — bucket-local, partition-
    pruned on band, and the corpus signature table is touched only for
    the candidates' Jaccard estimate. The corpus is NEVER re-shingled.
    Self-pairs (a doc already indexed under the same id) are excluded
    so re-running over an appended index stays clean."""
    idx_bands = spark.read.parquet(root + "/bands")
    idx_wide = spark.read.parquet(root + "/signatures")

    wide_new = pin(minhash_wide(new_documents, n_hashes))
    banded_new = _banded(wide_new, n_bands, n_hashes)

    cand = (
        banded_new.alias("n")
        .join(
            idx_bands.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_hash") == F.col("c.band_hash"))
            & (F.col("n.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"), F.col("c.doc_id").alias("corpus_doc")
        )
        .distinct()
    )
    wn = wide_new.select(
        F.col("doc_id").alias("new_doc"),
        *[F.col(f"m{s}").alias(f"a{s}") for s in range(n_hashes)],
    )
    wc = idx_wide.select(
        F.col("doc_id").alias("corpus_doc"),
        *[F.col(f"m{s}").alias(f"b{s}") for s in range(n_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        for s in range(n_hashes)
    )
    # no forced broadcast: the batch is usually small (AQE broadcasts
    # it at runtime) but nothing guarantees it — a forced hint would
    # OOM on a backfill-sized batch
    return (
        cand.join(wn, "new_doc")
        .join(wc, "corpus_doc")
        .select(
            "new_doc",
            "corpus_doc",
            F.round(matches / F.lit(float(n_hashes)), 6).alias("est_jaccard"),
        )
        .orderBy("new_doc", "corpus_doc")
    )


def delete_from_minhash_index(
    spark: SparkSession, root: str, doc_ids: list[int]
) -> dict:
    """Right-to-be-forgotten for the standing dedup index: signatures,
    band rows, shingle arrays and winnowing fingerprints are per-doc
    content derivatives (the shingle array in particular is close to
    a bag-of-ngrams of the text) — all are removed by rewrite. The
    materialized ``pairs`` section references deleted docs on EITHER
    side, so it filters on both columns. Returns per-section removal
    counts.

    Honest limits: the per-source KMV register/synopsis sections are
    AGGREGATED sketches — a min-hash register set is not decrementable
    per member (a deleted doc's shingle may or may not be the register
    survivor another doc also produced). When those sections exist the
    result carries ``kmv_requires_rebuild=True`` and the caller must
    re-run ``refresh_kmv_synopses`` over the surviving corpus —
    stated loudly instead of leaving the synopses silently stale
    (the non-decrementable-sketch rule, sources/rewrite.py)."""
    from ureplicator_spark.caching import release_checkpoint
    from ureplicator_spark.sources.rewrite import (
        rewrite_partitioned_without,
        rewrite_plain_without,
    )

    ids = [int(i) for i in doc_ids]
    out: dict = {"rows_removed": {}}
    for section in ("signatures", "shingle_arrays", "winnow_fingerprints"):
        out["rows_removed"][section] = rewrite_plain_without(
            spark, f"{root}/{section}", "doc_id", ids
        )
    rewritten, removed = rewrite_partitioned_without(
        spark, root + "/bands", "band", "doc_id", ids
    )
    out["band_partitions_rewritten"] = rewritten
    out["removed_dirs"] = removed

    pairs_path = root + "/pairs"
    if fs_exists(spark, pairs_path):
        pairs = spark.read.parquet(pairs_path)
        doomed = pairs.filter(
            F.col("doc_a").isin(ids) | F.col("doc_b").isin(ids)
        ).count()
        if doomed:
            survivors = pairs.filter(
                ~(F.col("doc_a").isin(ids) | F.col("doc_b").isin(ids))
            ).localCheckpoint()
            survivors.write.mode("overwrite").parquet(pairs_path)
            release_checkpoint(survivors)
        out["rows_removed"]["pairs"] = doomed

    out["kmv_requires_rebuild"] = fs_exists(spark, root + "/kmv_synopses")
    return out
