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
    # r10 NEW queries: perceptual image near-dup (64-bit dHash via the
    # Arrow decode path + 8-band Hamming pigeonhole join over
    # originals ∪ resize-stub variants) — the image-dedup capability
    # CDC's exact-bytes chunking cannot provide.
    "media_dhash", "media_dhash_near_pairs",
    # r10 NEW: acoustic energy-delta fingerprint (Haitsma-Kalker'02
    # construction, stub PCM domain) + volume-halved near-pairs.
    "media_audio_fingerprint", "media_audio_near_pairs",
    # r10 NEW: the daily-ingest media-dedup lifecycle — re-encoded batch
    # probes the standing fingerprint index; gated end-to-end.
    "media_incremental_dedup",
    # r10 NEW: perceptual duplicate clusters (CC over dhash pairs) —
    # pairs → clusters → keep-one retention, the text-family shape.
    "media_dedup_clusters",
    # r10 PRODUCTION-SHAPE change (r9 verdict task #3): these two rows
    # are now the sketch build + estimate/probe only — the exact-count
    # gauge pairing moved to tests/test_gauge_parity.py (it doubled
    # each query with the very shuffle the sketch exists to avoid).
    # New output schema ⇒ re-gate.
    "approx_distinct_orders", "cms_token_counts",
    # r10 lineage change (same register values, pinned): the HLL rank
    # is computed after the bucket aggregation (MAX(rho) ≡ rho(MIN v),
    # monotonicity) so bin()'s per-row string alloc moved to per
    # register; affects every _registers/hll_profile consumer.
    "approx_distinct_tokens", "approx_distinct_users_rolling",
    "table_profile_approx",
    # r10 amortization: the PQ family (code table, ADC search, recall
    # gauge) now serves the STANDING trained model (train once per
    # snapshot, pq_build_sec in bench); from-scratch twins pinned in
    # tests/test_gauge_parity.py.
    "embedding_pq_codes", "similarity_pq_adc", "similarity_pq_recall",
    # r10 amortization: embedding_kmeans summarizes the standing Lloyd
    # map (dist column now persisted alongside the SemDeDup columns).
    "embedding_kmeans",
    # r10 amortization: the three recall gauges read the standing eval
    # ground-truth tables (offline eval sets cache exact neighbors once
    # per snapshot); from-scratch twins pinned.
    "similarity_ann_recall", "similarity_multiprobe_recall",
    # r10 rounding-discipline fixes (r9 advisor): covariance now uses
    # the sign-aware floor chain (cov can be negative), winnowing
    # density the plain floor chain, and the PSI term sum folds in
    # canonical bucket order on both engines (SUM(double) is
    # partition-order-dependent).
    "embedding_covariance", "winnowing_fingerprints",
    "source_length_psi",
    # r10 lineage change: the winnowing family now probes the standing
    # index's persisted winnow_fingerprints section (per-doc local
    # state — appendable like signatures); from-scratch twins stay
    # pinned in test_minhash_index_standing_probes.
    "winnowing_overlap_pairs",
    # r10: PCA eigenvalue sort is now a stable argsort (deterministic
    # under degenerate spectra); rows-only as before.
    "embedding_pca_components",
    # never driver-attested (rows-only set — iterative/stateful
    # shapes, pinned vs Python/NumPy references in pytest): keep them
    # in the window so any driver improvement picks them up.
    "bpe_learn_merges", "bpe_segment_stats", "cdc_chunk_dedup",
    "cdc_incremental_dedup",
    # Everything below is already driver-attested (r01-r09, cumulative
    # 165/170 green) and fills the remaining window slots naturally in
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
