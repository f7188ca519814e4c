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
# except that queries whose implementation or oracle SQL changed since
# their last driver hash-check are hoisted to the front so the next
# driver window (first ~50 entries) re-verifies them. The cross-round
# window union (CORRECTNESS_r01..r04.json) already covers all 99
# queries; the full registry is ALSO gated locally every round by
# tests/test_oracle_parity.py against DuckDB at sf0.001 and sf0.01,
# so the driver window is a sample, not the only correctness gate.
_CHANGED_SINCE_LAST_CHECK = [
    # r4 post-record / r5 changes: split ordering fix, 60-bit SimHash,
    # checkpointed inline IVF, fan_out cost model (shingling queries).
    "split_assignment", "dedup_simhash_near_pairs", "similarity_ivf_ann",
    "dedup_simhash", "dedup_minhash_signatures", "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    # r5: new queries (never driver-checked).
    "user_retention", "event_funnel", "embedding_kmeans",
    "similarity_ann_recall", "chunk_dedup", "token_count_bpe",
    "dedup_containment", "dedup_threshold_sweep", "workload_rate_spikes",
    "corpus_health", "doc_perplexity_proxy", "source_unigram_kl",
    "token_shard_packing", "dedup_keep_best", "lag_weighted_assignment",
    "embedding_pq_codes", "similarity_pq_adc", "dedup_exact_substring",
    "multimodal_pcm_energy", "workload_trend", "dedup_signal_agreement", "curation_pipeline", "similarity_pq_recall", "lang_id_confusion", "workload_capacity_forecast",
    "event_props_stats",
    # r5: integer-units money aggregation + boilerplate fan_out.
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_type_profit", "q10_returned_items", "q11_important_parts",
    "promo_revenue_monthly", "q15_top_supplier", "part_small_qty_revenue",
    "large_volume_orders", "q19_discount_revenue", "customer_order_rollup",
    "boilerplate_shingles",
    # r5 late additions (never driver-checked). With more changed-or-new
    # names than ~50 window slots, these must spill; they spill because
    # a missing driver row for a new query is VISIBLE in CORRECTNESS_r5
    # (no false green), whereas a changed query left outside the window
    # would carry a stale green attestation from an earlier round —
    # the failure mode the round-4 advisor flagged. All are gated
    # locally at sf0.001+sf0.01 until r6's window reaches them.
    "dedup_semantic_pairs", "dsir_importance_weights", "event_transitions",
    "similarity_retrieve_docs", "workload_cube", "dedup_semantic_summary",
    "orders_snapshot_diff", "dedup_cluster_stats", "similarity_multiprobe_ann",
    "lang_ngram_classifier", "approx_distinct_tokens", "approx_distinct_orders",
    "similarity_multiprobe_recall", "token_pmi_collocations",
    "cms_token_counts", "bloom_decontamination", "weighted_sample_docs",
    "event_value_outliers", "dedup_token_savings",
    "approx_distinct_users_rolling", "dedup_jaccard_prefix_join",
    "table_profile", "histogram_quantiles",
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
