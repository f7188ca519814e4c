"""Training-shard export: deterministic assignment, complete
round-trip, manifest-gated reads, and shard-partition pruning."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ureplicator_spark.plans.inspect import plan_string
from ureplicator_spark.sources.shards import (
    assign_shards,
    export_training_shards,
    read_training_shards,
    shard_stats,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_export_roundtrip_is_complete_and_partitioned(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "shards")
    export_training_shards(docs, root, n_shards=8)

    back = read_training_shards(spark, root)
    assert back.count() == docs.count()
    assert set(back.select("doc_id").toPandas()["doc_id"]) == set(
        docs.select("doc_id").toPandas()["doc_id"]
    )
    assert back.select("shard").distinct().count() == 8

    # manifest certifies exactly what landed
    manifest = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in spark.read.parquet(root + "/_manifest").collect()
    }
    got = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert {s: m[0] for s, m in manifest.items()} == got


def test_read_requires_manifest(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "shards")
    # data without manifest = torn export -> the loader must refuse
    assign_shards(docs, 4).repartition("shard").write.partitionBy("shard").parquet(
        root + "/data"
    )
    with pytest.raises(Exception):
        read_training_shards(spark, root)


def test_assignment_is_deterministic_and_balanced(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 16).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 16).collect()}
    assert a == b
    stats = shard_stats(docs, 16).collect()
    n = [r["n_docs"] for r in stats]
    # md5 avalanche balance: no shard more than 3x the mean on the fixture
    assert max(n) <= 3 * (sum(n) / len(n))


def test_single_shard_read_prunes_partitions(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "shards")
    export_training_shards(docs, root, n_shards=8)
    one = spark.read.parquet(root + "/data").filter(F.col("shard") == 3)
    plan = plan_string(one)
    assert re.search(r"PartitionFilters: \[[^\]]*shard[^\]]*\]", plan), plan
