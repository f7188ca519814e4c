"""Embedding drift gauge: bit-exact vs an oblivious NumPy reference,
and actually detects a shifted batch (the monitoring property the
operator exists for)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ureplicator_spark.operators.similarity import embedding_source_drift


def _load(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return emb, docs


def test_matches_numpy_reference_exactly(spark, sf_dir):
    emb, docs = _load(spark, sf_dir)
    got = {
        r["source"]: (r["n_vecs"], r["centroid_drift"], r["max_dim_drift"])
        for r in embedding_source_drift(emb, docs).collect()
    }

    # oblivious reference: same quantization, exact integer numerators
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    rows = emb.collect()
    qs = {
        r["vec_id"]: np.round(np.asarray(r["embedding"], dtype=np.float64) * 1000)
        .astype(np.int64)
        for r in rows
        if r["vec_id"] in src
    }
    gsum = sum(qs.values())
    big_n = len(qs)
    want = {}
    by_src: dict[str, list] = {}
    for vid, q in qs.items():
        by_src.setdefault(src[vid], []).append(q)
    for s, vecs in by_src.items():
        n = len(vecs)
        ssum = sum(vecs)
        num = (ssum.astype(object) * big_n) - (gsum.astype(object) * n)
        sq = sum(int(x) * int(x) for x in num)
        scale = n * big_n * 1000
        want[s] = (
            n,
            round(float(np.sqrt(float(sq))) / scale, 6),
            round(float(max(abs(int(x)) for x in num)) / scale, 6),
        )
    assert got == want


def test_detects_a_shifted_batch(spark, sf_dir):
    """Inject a copy of one source's vectors shifted by +0.5 in every
    dimension under a new source name: the injected source must show
    drift an order of magnitude above every original source."""
    emb, docs = _load(spark, sf_dir)
    shifted_docs = docs.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        "lang",
        F.lit("BROKEN_ENCODER").alias("source"),
        "n_chars",
    )
    shifted_emb = emb.filter("vec_id % 10 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))").alias(
            "embedding"
        ),
    )
    base_emb = emb.select("vec_id", "embedding")
    out = {
        r["source"]: r["centroid_drift"]
        for r in embedding_source_drift(
            base_emb.unionByName(shifted_emb), docs.unionByName(shifted_docs)
        ).collect()
    }
    broken = out.pop("BROKEN_ENCODER")
    assert broken > 3 * max(out.values())


def test_no_bigint_overflow_on_large_magnitudes(spark):
    """Regression (r8 advisor): the cross-multiply s·N − g·n must run
    in DECIMAL(38,0) — with qscale-weighted dim-sums around 10^17 the
    BIGINT product exceeds 2^63 and ANSI mode (this Spark's default)
    threw ARITHMETIC_OVERFLOW before the fix. Values are still exact,
    so the two identical sources must both report zero drift."""
    # q = round(5e12·1000) = 5e15 per component; s = 50·q = 2.5e17;
    # s·gn = 2.5e17·100 = 2.5e19 > 2^63 ≈ 9.2e18 → overflows BIGINT.
    n = 100
    rows = [(i, [5.0e12, -5.0e12]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2)) for i in range(n)], "doc_id long, source string"
    )
    got = {
        r["source"]: (r["n_vecs"], r["centroid_drift"], r["max_dim_drift"])
        for r in embedding_source_drift(emb, docs).collect()
    }
    assert got == {"s0": (50, 0.0, 0.0), "s1": (50, 0.0, 0.0)}
