"""Balanced training-shard export — the pipeline's last-mile write.

A trained-on corpus leaves the engine as N deterministic shards that
loaders stream independently; what matters at 100 TB is (a) shard
assignment is a pure hash of the stable doc key — no sampling, no
global sort, reproducible across runs and engines — and (b) the
export is one corpus pass: a single shuffle keyed by shard id, each
shard written by one task (shard count = writer parallelism), plus a
shard-cardinality-sized manifest the loader can trust without
listing/reading the data files.

Assignment uses the engine's portable ``md5_long`` (DuckDB-
reproducible), so shard membership is itself an oracle-checkable
query (`training_shard_stats`), and md5's avalanche gives
size-balanced shards without any balancing pass (law of large
numbers over docs-per-shard; the stats query is the gauge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.functions import md5_long

N_SHARDS = 16


def assign_shards(documents: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """documents + ``shard`` — md5_long('shard:' || doc_id) % n_shards,
    deterministic and engine-portable."""
    return documents.withColumn(
        "shard",
        (md5_long(F.col("doc_id").cast("string"), salt="shard") % n_shards).cast(
            "int"
        ),
    )


def shard_stats(documents: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Per-shard balance gauge: (shard_id, n_docs, n_tokens, n_chars).
    Token counts use the parity-tested pure-string form."""
    return (
        assign_shards(documents, n_shards)
        .groupBy(F.col("shard").cast("bigint").alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (
                    F.length("text")
                    - F.length(F.regexp_replace("text", " ", ""))
                    + F.lit(1)
                ).cast("long")
            ).alias("n_tokens"),
            F.sum(F.length("text").cast("long")).alias("n_chars"),
        )
        .orderBy("shard_id")
    )


def export_training_shards(
    documents: DataFrame, root: str, n_shards: int = N_SHARDS
) -> None:
    """Export with a trustworthy completeness certificate: the
    manifest is INVALIDATED before the data overwrite begins and
    committed LAST (the archive.py commit-order discipline), so a
    crash anywhere mid-export leaves no manifest and the loader
    refuses the torn directory — including the re-export-over-
    existing-root case, where a stale manifest would otherwise
    certify half-rewritten data.

    The data job is the one corpus pass (repartition by shard id;
    each shard lands as one task's write — shard count is the write
    parallelism knob). The manifest is then computed FROM THE WRITTEN
    FILES, not from the input frame: it certifies what actually
    landed, stays correct even when ``documents`` is a view over
    moving data, and costs a shard-pruned read of the export rather
    than a second pass over the upstream lineage."""
    from ureplicator_spark.fsutil import delete_recursive

    spark = documents.sparkSession
    delete_recursive(spark, root + "/_manifest")
    (
        assign_shards(documents, n_shards)
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(root + "/data")
    )
    landed = spark.read.parquet(root + "/data")
    shard_stats(landed, n_shards).write.mode("overwrite").parquet(
        root + "/_manifest"
    )


def read_training_shards(spark: SparkSession, root: str) -> DataFrame:
    """Loader view: the exported corpus with its shard column; raises
    if the manifest is missing (incomplete export)."""
    manifest = spark.read.parquet(root + "/_manifest")  # noqa: F841 — existence gate
    return spark.read.parquet(root + "/data")
