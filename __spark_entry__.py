"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented SURVEY.md §2 operator.
``oracle_sql()`` — DuckDB-equivalent SQL per query for the hash gate.

Implementations live in ``ureplicator_spark/``; this file only adapts
the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ureplicator_spark.queries import QUERIES  # noqa: E402

# Registry order is the NATURAL (implementation) order of QUERIES,
# except that queries that were never driver-checked, or whose
# implementation or oracle SQL changed since their last driver
# hash-check, are hoisted to the front so the next driver window
# (first ~50 entries) verifies them. The full registry is ALSO gated
# locally every round by tests/test_oracle_parity.py against DuckDB at
# sf0.001 and sf0.01, so the driver window is a sample, not the only
# correctness gate.
_CHANGED_SINCE_LAST_CHECK = [
    # r9 NEW queries: winnowing local fingerprints (Schleimer SIGMOD'03
    # — partial-overlap detection whole-doc digests cannot do) and the
    # train/val/test near-dup leakage audit over the standing LSH pair
    # table.
    "winnowing_fingerprints", "winnowing_overlap_pairs",
    "split_leakage_check",
    # r9 NEW: exact embedding covariance (PCA/whitening/OPQ training
    # statistic; DECIMAL-exact, hash-gated) + its rows-only driver-eigh
    # component table (NumPy-pinned in pytest).
    "embedding_covariance", "embedding_pca_components",
    # r9 NEW: per-source document-length PSI (the standard numeric
    # drift score; add-one-smoothed bit-length buckets, floor-chain
    # rounding), hash-gated.
    "source_length_psi",
    # r9 fix: drift-monitor rounding now uses the engine-exact floor
    # chain (round-of-double diverged by one digit at sf0.1).
    # (embedding_source_drift already leads this list.)
    # r9 implementation change: occurrence-grain gram consumers now
    # stream k-grams per output row instead of materializing the
    # joined-string array (functions.stream_word_kgrams, ~4× on the
    # gram stage); same values, new lineage.
    "boilerplate_shingles", "text_repetition_stats", "ngram_top",
    "boilerplate_spans", "quality_gate_summary", "curation_pipeline",
    # r9 implementation change: the whole LSH-dedup family now probes
    # the STANDING persisted MinHash/shingle index (built once per
    # corpus snapshot, like the lexical/IVF indexes; bench reports
    # minhash_build_sec) instead of re-deriving shingles→signatures→
    # bands per invocation. Same signatures, banding and rounding —
    # provably equal outputs; from-scratch operators + index lifecycle
    # stay hash-gated in pytest (test_minhash_index_standing_probes).
    "dedup_minhash_lsh_pairs", "dedup_threshold_sweep",
    "dedup_signal_agreement", "dedup_containment",
    "dedup_jaccard_prefix_join", "fuzzy_dedup_clusters",
    "dedup_keep_best", "dedup_cluster_stats", "dedup_token_savings",
    # r9: table_profile_approx is now oracle-gated (portable md5 HLL
    # registers instead of native approx_count_distinct — closes the
    # one indefensible rows-only entry from r8).
    "table_profile_approx",
    # r9 numeric-safety change (r8 advisor, medium): the drift
    # cross-multiply now happens in DECIMAL(38,0) on BOTH engines —
    # BIGINT would overflow under ANSI once qscale-weighted dim-sums ×
    # corpus count exceed 2^63.
    "embedding_source_drift",
    # r9 implementation changes: the classifier serves the STANDING
    # trained model (train-once-classify-many; per-doc profiles now a
    # shuffle-free array fold, classification a map-literal projection)
    # and the KMV overlap reads the persisted per-source synopsis
    # section (mergeable-sketch index discipline).
    "lang_ngram_classifier", "kmv_source_overlap",
    # r9: SemDeDup consumes the STANDING Lloyd cluster map (clustering
    # as its own pipeline stage, per the paper); CMS/Bloom/banding
    # fixed the Generate per-output-row re-evaluation (d×d / k×k /
    # n_bands× redundant hashing) — same values, new lineage.
    "dedup_semantic_pairs", "dedup_semantic_summary",
    "cms_token_counts", "bloom_decontamination",
    # never driver-attested (rows-only r8 set — iterative/stateful
    # shapes, pinned vs Python/NumPy references in pytest): keep them
    # in the window so any driver improvement picks them up.
    "bpe_learn_merges", "bpe_segment_stats", "cdc_chunk_dedup",
    "cdc_incremental_dedup",
    # Everything below is already driver-attested (r01-r08, cumulative
    # 159/164 green) and fills the remaining window slots naturally in
    # registry order.
]


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    changed = [n for n in _CHANGED_SINCE_LAST_CHECK if n in QUERIES]
    rest = [n for n in names if n not in changed]
    return changed + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core replicate transform (P1-P4, J1)."""
    fn, _ = QUERIES["replicate_transform"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _ordered_names()
        if QUERIES[name][1] is not None
    }
