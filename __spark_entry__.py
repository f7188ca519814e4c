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
    # --- r11 ---
    # NEW: mergeable HDR-histogram quantile sketch (integer registers,
    # nearest-rank reads by integer cross-multiplication) — the
    # missing sketch-family member; merge/gauge pinned in
    # tests/test_gauge_parity.py.
    "workload_quantile_sketch",
    # NEW: frame-sequence (shot-level) near-dup — per-frame dHash
    # sequences + 4-frame shingles; a re-cut clip (leading frames
    # trimmed) re-aligns with its source like CDC chunks re-align
    # after a byte edit. Completes the perceptual multimodal family.
    "media_frame_signatures", "media_frame_near_pairs",
    # NEW: the shot-level incremental-dedup lifecycle — re-cut batch
    # probes the standing frame-shingle section; completes the
    # incremental triple (exact-chunk / whole-payload perceptual /
    # frame-sequence).
    "media_frame_incremental_dedup", "media_frame_dedup_clusters",
    # NEW: the daily-ingest TEXT dedup lifecycle gated end-to-end (the
    # media_incremental_dedup discipline): edited re-crawl batch
    # probes the standing MinHash band sections; oracle recomputes the
    # restricted LSH join.
    "text_incremental_dedup",
    # r11 ROUND-audit REFOLDS (semantic-shape changes; see SCALE.md
    # round-11 table): percentiles now pure-integer ×100 fixed-point;
    # running stats fold integer window bytes; the histogram gauge
    # interpolates explicitly from order stats; the LM/DSIR/KL/BM25/NB
    # families fold their double terms in canonical order.
    "workload_percentiles", "workload_running_stats",
    "histogram_quantiles", "event_value_outliers", "doc_perplexity_proxy",
    "dsir_importance_weights", "source_unigram_kl",
    "text_bm25_search", "bm25_index_search", "similarity_hybrid_rrf",
    "doc_bigram_perplexity", "nb_lang_confusion", "workload_capacity_forecast",
    "workload_trend", "offset_progression",
    # r11 norm refold (map-only array fold — also removes the norm
    # shuffle) + sign-aware cosine chains + quantizer chains: the
    # whole embedding family re-gates.
    "similarity_knn_bruteforce", "similarity_lsh_ann", "similarity_multiprobe_ann",
    "dedup_embedding_cosine", "embedding_quantize_int8",
    "label_centroids", "embedding_label_outliers",
    "dedup_semantic_pairs", "dedup_semantic_summary",
    "similarity_ivf_ann", "similarity_ivf_incremental",
    "similarity_multiprobe_recall", "similarity_ann_recall",
    "similarity_filtered_ann", "similarity_pq_adc",
    "similarity_pq_recall", "embedding_kmeans",
    # r11 floor-chain conversions with changed oracle SQL (values
    # identical off rounding boundaries; re-gate per discipline) —
    # the rest of the registry follows in natural order and the full
    # 177-query × {sf0.001, sf0.01} local parity suite plus the
    # PARITY_SF01 sweep gate everything regardless of window size.
    "workload_windows", "workload_max_lookback", "partition_workload",
    "expected_workers", "lag_time_estimate", "top_partitions_by_workload",
    "event_props_stats", "q1_pricing_summary", "promo_revenue_monthly",
    "part_small_qty_revenue", "event_transitions", "q8_market_share",
    "dedup_ngram_jaccard", "dedup_containment", "dedup_exact_substring",
    "dedup_signal_agreement", "dedup_jaccard_prefix_join", "corpus_health",
    "text_token_stats", "text_quality_score", "corpus_mix",
    "text_repetition_stats", "benchmark_contamination", "token_count_bpe",
    "corpus_mix_weights", "token_pmi_collocations", "weighted_sample_docs",
    "curation_pipeline", "text_tfidf_top_terms", "multimodal_pcm_energy",
    "kmv_source_overlap", "lag_weighted_assignment", "cms_token_counts",
    "approx_distinct_orders", "approx_distinct_tokens",
    "approx_distinct_users_rolling", "table_profile_approx",
    # r11 media-family change (advisor hardening): the id-space guard
    # (media_id vs id_offset collision now fails loudly) touched every
    # media plan; values unchanged, re-gate per discipline.
    "media_dhash", "media_dhash_near_pairs",
    "media_audio_fingerprint", "media_audio_near_pairs",
    "media_incremental_dedup", "media_dedup_clusters",
    # r11 CONVERTED from rows-only to fully hash-gated: the Gear-CDC
    # reset-independence that vectorizes the Spark side also makes the
    # oracle expressible — windowed LAG sum for the rolling hash +
    # WITH RECURSIVE cut walk (set-oriented: every doc advances one
    # chunk per iteration). Two of the five permanent no_oracle rows
    # retired.
    "cdc_chunk_dedup", "cdc_incremental_dedup",
    # never driver-attested (rows-only set — the genuinely non-SQL
    # shapes left: sequential global-argmax merge learning, driver
    # d×d eigh; pinned vs Python/NumPy references in pytest).
    "bpe_learn_merges", "bpe_segment_stats",
    # Everything below is already driver-attested (r01-r10 cumulative)
    # and fills the remaining window slots naturally in registry
    # order.
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
