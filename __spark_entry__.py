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
    # new in r7 (never driver-checked): the incremental-index lifecycle
    # query (build -> append_to_ivf_index -> DPP-pruned search).
    "similarity_ivf_incremental",
    # new in r7 (never driver-checked): lexical BM25 retrieval, the
    # hybrid dense+lexical reciprocal-rank-fusion retrieval, and the
    # incremental inverted-index lifecycle (build -> append -> pruned
    # search).
    "text_bm25_search", "similarity_hybrid_rrf", "bm25_index_search",
    "retrieval_arm_overlap", "doc_bigram_perplexity", "nb_lang_confusion", "kmv_source_overlap",
    # r7 window rotation (the r5 and r6 verdicts' #1 task): these 22
    # names have never appeared in any driver window across rounds
    # 1-6 (CORRECTNESS_r01..r06 union = 126/148). They lead the list
    # so CORRECTNESS_r07 attests them and the cumulative union reaches
    # 148/148. Two of them (`table_profile`, `lang_ngram_classifier`)
    # are ALSO the queries whose implementations r7 changes (perf
    # rewrites), so the rotation doubles as the changed-query re-check.
    "table_profile", "lang_ngram_classifier",
    "similarity_retrieve_docs", "workload_cube", "event_transitions",
    "dedup_semantic_summary", "dsir_importance_weights",
    "orders_snapshot_diff", "dedup_cluster_stats", "similarity_multiprobe_ann",
    "approx_distinct_tokens", "approx_distinct_orders",
    "similarity_multiprobe_recall", "token_pmi_collocations",
    "cms_token_counts", "bloom_decontamination", "weighted_sample_docs",
    "event_value_outliers", "dedup_token_savings",
    "approx_distinct_users_rolling", "dedup_jaccard_prefix_join",
    "histogram_quantiles",
    # Everything below is already driver-attested (r01-r06) and fills
    # the remaining window slots naturally in registry order.
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
