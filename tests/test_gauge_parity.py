"""Sketch-vs-exact GAUGE parity.

The bench/driver rows for `approx_distinct_orders` and
`cms_token_counts` are the PRODUCTION shapes (register/counter build +
estimate/probe only — the work a 100 TB pipeline actually runs). The
exact-count pairing — the verification that the portable sketches
track the truth they exist to replace — doubles each query with the
very shuffle the sketch avoids, so it lives here: the full gauge
output (estimate, exact, error) is hash-compared against the DuckDB
oracle, same discipline as the driver gate.
"""

from __future__ import annotations

import pytest

from oracle_harness import compare
from ureplicator_spark.queries import (
    _CMS_GAUGE_SQL,
    _HLL_ORDERS_GAUGE_SQL,
    _cms_tokens,
    _hll_orders_keyed,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_hll_orders_gauge_matches_oracle(spark, sf):
    from ureplicator_spark.operators.sketch import hll_gauge

    out = hll_gauge(_hll_orders_keyed(spark, sf), "flag", "k")
    assert compare(out, _HLL_ORDERS_GAUGE_SQL, sf) == []


@pytest.mark.parametrize("sf", SF_DIRS)
def test_cms_gauge_matches_oracle(spark, sf):
    from ureplicator_spark.operators.sketch import cms_topk_gauge

    tok = _cms_tokens(spark, sf).select("token")
    out = cms_topk_gauge(tok, "token")
    assert compare(out, _CMS_GAUGE_SQL, sf) == []


@pytest.mark.parametrize("sf", SF_DIRS)
def test_production_estimates_agree_with_gauge(spark, sf):
    """The production rows must serve the same numbers the gauges
    certify: hll_estimate's per-flag estimate == hll_gauge's, and
    cms_estimate's probe answers == cms_topk_gauge's wherever the
    probe sets overlap."""
    from ureplicator_spark.operators.sketch import (
        cms_estimate,
        cms_topk_gauge,
        hll_estimate,
        hll_gauge,
    )

    keyed = _hll_orders_keyed(spark, sf)
    prod = {r["flag"]: r["est_distinct"] for r in hll_estimate(keyed, "flag", "k").collect()}
    gauge = {r["flag"]: r["est_distinct"] for r in hll_gauge(keyed, "flag", "k").collect()}
    assert prod == gauge and prod

    tok = _cms_tokens(spark, sf).select("token")
    top = cms_topk_gauge(tok, "token")
    gauge_est = {r["token"]: r["est_count"] for r in top.collect()}
    probes = spark.createDataFrame(
        [(t,) for t in gauge_est], "token string"
    )
    prod_est = {
        r["token"]: r["est_count"]
        for r in cms_estimate(tok, probes, "token").collect()
    }
    assert prod_est == gauge_est and prod_est


def test_cms_unseen_probe_answers_zero(spark):
    """A Count-Min point query for a key ABSENT from the corpus must
    answer 0 (empty buckets), not overestimate from partial counter
    coverage and not vanish from the result — the left-join +
    COALESCE(cnt, 0) contract. Small corpus so the absent key's d
    buckets are deterministically empty (fixed md5 hashing)."""
    from ureplicator_spark.operators.sketch import cms_estimate

    keyed = spark.createDataFrame(
        [(t,) for t in ["alpha", "beta", "gamma", "delta"] * 3], "token string"
    )
    probes = spark.createDataFrame(
        [("alpha",), ("never-in-corpus",)], "token string"
    )
    est = {r["token"]: r["est_count"] for r in cms_estimate(keyed, probes, "token").collect()}
    assert set(est) == {"alpha", "never-in-corpus"}
    assert est["never-in-corpus"] == 0
    assert est["alpha"] >= 3


def test_standing_pq_model_equals_from_scratch(spark, tmp_path):
    """The persisted PQ model serves the code table, ADC search and
    recall gauge EXACTLY as the from-scratch training path does
    (integer-exact Lloyd, fixed init ⇒ deterministic model)."""
    import ureplicator_spark.queries as Q
    from ureplicator_spark.operators.similarity import (
        pq_adc_recall,
        pq_adc_search,
        pq_train_codes,
    )
    from ureplicator_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")

    def rows(df):
        return [tuple(r) for r in df.collect()]

    assert rows(Q.QUERIES["embedding_pq_codes"][0](spark, sf)) == rows(
        pq_train_codes(emb)
    )
    assert rows(Q.QUERIES["similarity_pq_adc"][0](spark, sf)) == rows(
        pq_adc_search(emb).orderBy("q_id", "rank")
    ) or rows(Q.QUERIES["similarity_pq_adc"][0](spark, sf).orderBy("q_id", "rank")) == rows(
        pq_adc_search(emb).orderBy("q_id", "rank")
    )
    assert rows(Q.QUERIES["similarity_pq_recall"][0](spark, sf)) == rows(
        pq_adc_recall(emb)
    )


def test_standing_kmeans_rollup_equals_from_scratch(spark):
    """embedding_kmeans served from the standing Lloyd map equals the
    from-scratch clustering rollup."""
    import ureplicator_spark.queries as Q
    from ureplicator_spark.operators.similarity import kmeans_clusters
    from ureplicator_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in Q.QUERIES["embedding_kmeans"][0](spark, sf).collect()]
    want = [
        tuple(r)
        for r in kmeans_clusters(load_table(spark, sf, "embeddings")).collect()
    ]
    assert got == want and got


def test_standing_eval_truth_gauges_equal_from_scratch(spark):
    """The three recall gauges served from the standing ground-truth
    tables equal their from-scratch twins."""
    import ureplicator_spark.queries as Q
    from ureplicator_spark.operators.similarity import (
        ann_recall,
        multiprobe_recall_comparison,
        pq_adc_recall,
    )
    from ureplicator_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")

    def rows(df):
        return [tuple(r) for r in df.collect()]

    assert rows(Q.QUERIES["similarity_ann_recall"][0](spark, sf)) == rows(
        ann_recall(emb)
    )
    assert rows(Q.QUERIES["similarity_multiprobe_recall"][0](spark, sf)) == rows(
        multiprobe_recall_comparison(emb)
    )
    assert rows(Q.QUERIES["similarity_pq_recall"][0](spark, sf)) == rows(
        pq_adc_recall(emb)
    )


@pytest.mark.parametrize("sf", SF_DIRS)
def test_hdr_sketch_merge_and_exactness_gauge(spark, sf):
    """HDR quantile sketch (workload_quantile_sketch's operator):
    (1) registers MERGE exactly — two half-corpus register sets summed
    by bucket_key equal the one-shot build (the append ≡ rebuild
    discipline, like HLL's); (2) each nearest-rank estimate's bucket
    CONTAINS the exact nearest-rank percentile, i.e. exact <= est <=
    exact·(1 + 2^-5) — the HdrHistogram relative-error guarantee."""
    import math

    from pyspark.sql import functions as F

    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.operators.sketch import hdr_quantiles, hdr_registers

    rec = FX.records(spark, sf)

    # (1) mergeability: split on offset parity, merge by SUM
    full = hdr_registers(rec, "value_size", ["topic"])
    a = hdr_registers(rec.filter(F.col("offset") % 2 == 0), "value_size", ["topic"])
    b = hdr_registers(rec.filter(F.col("offset") % 2 == 1), "value_size", ["topic"])
    merged = (
        a.unionByName(b)
        .groupBy("topic", "bucket_key")
        .agg(F.sum("cnt").alias("cnt"))
    )
    t_full = {(r.topic, r.bucket_key): r.cnt for r in full.collect()}
    t_merged = {(r.topic, r.bucket_key): r.cnt for r in merged.collect()}
    assert t_full == t_merged

    # (2) estimate bounds vs the exact nearest-rank percentile
    ests = {r.topic: r for r in hdr_quantiles(full, ["topic"]).collect()}
    vals: dict[str, list[int]] = {}
    for r in rec.select("topic", "value_size").collect():
        vals.setdefault(r.topic, []).append(r.value_size)
    assert set(ests) == set(vals)
    for topic, vs in vals.items():
        vs.sort()
        n = len(vs)
        row = ests[topic]
        assert row.n_records == n
        for p in (50, 95, 99):
            exact = vs[math.ceil(p * n / 100) - 1]
            est = row[f"p{p}_est"]
            assert exact <= est <= exact * (1 + 2**-5) + 1e-9, (
                topic, p, exact, est
            )
