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
    # new in r8 (never driver-checked): in-engine BPE tokenizer
    # training + its compression gauge (rows-only — the merge loop is
    # iterative, hash-gated vs a Python reference in tests/test_bpe.py)
    # and the single-pass HLL profile twin (rows-only —
    # approx_count_distinct is engine-specific).
    # and content-defined chunk dedup over binary payloads (rows-only —
    # the Gear rolling-boundary walk is pinned per-byte vs a Python
    # reference in tests/test_cdc_chunking.py).
    "bpe_learn_merges", "bpe_segment_stats", "cdc_chunk_dedup",
    "cdc_incremental_dedup", "table_profile_approx",
    # new in r8: training-sequence packing (oracle-gated — the oracle
    # runs the global-window strawman, the engine the two-phase scan)
    # and the shard-export balance gauge (portable md5 assignment).
    "sequence_packing", "training_shard_stats", "embedding_source_drift",
    # r8 refactor: shard_assignments now rides the shared
    # doc_token_offsets scan (same results, new lineage).
    "token_shard_packing",
    # r8 SCHEMA change: synopsis-only now (the exact COUNT(DISTINCT)
    # gauge columns moved to a test-only twin), so it must re-enter
    # the window.
    "kmv_source_overlap",
    # r8 implementation changes: bm25_index_search searches the
    # standing index (build amortized out, like ivf_build_sec);
    # dedup_containment switched to asymmetric prefix-filter
    # candidates + array verification; lang_ngram_classifier
    # aggregates the train split straight to (lang, gram);
    # doc_bigram_perplexity dropped forced model-table broadcasts.
    "bm25_index_search", "dedup_containment", "lang_ngram_classifier",
    "doc_bigram_perplexity",
    # r8 implementation change in duplicate_clusters (labels now derive
    # from the checkpointed edge set — same fixpoint, lineage fix):
    # every query through the CC pass re-enters the window.
    "fuzzy_dedup_clusters", "dedup_keep_best", "dedup_cluster_stats",
    "dedup_token_savings", "curation_pipeline",
    # r8 ORACLE change: _BM25_CONTRIB literals now cast to DOUBLE so
    # DuckDB runs Spark's IEEE chain — every oracle embedding it
    # re-enters the window (similarity_hybrid_rrf /
    # retrieval_arm_overlap also lost a forced broadcast in the
    # shared lexical arm).
    "text_bm25_search", "similarity_hybrid_rrf", "retrieval_arm_overlap",
    # Everything below is already driver-attested (r01-r07, cumulative
    # 156/156 green) and fills the remaining window slots naturally in
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
