"""Partitioned record archive — replay-from-archive with partition
pruning.

The reference replays from Kafka retention only; an archive sink
(replicated log → parquet partitioned by topic/date) extends replay
beyond retention, and Hive-style partitioning makes bounded replays
(S3/T10) and per-topic analytics prune to exactly the directories they
need — at 100 TB a single-topic single-day replay reads one partition
directory, not the log.

Layout: ``<root>/topic=<t>/dt=<yyyy-MM-dd>/*.parquet``. Partition
columns are low-cardinality by construction (topics × days), so no
small-file explosion; within a partition, files arrive sized by the
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_archive(records: DataFrame, root: str, mode: str = "append") -> None:
    """Append records partitioned by (topic, dt). ``dt`` derives from
    the record timestamp (epoch seconds → UTC date)."""
    (
        records.withColumn("dt", F.to_date(F.timestamp_seconds("ts_sec")))
        .write.mode(mode)
        .partitionBy("topic", "dt")
        .parquet(root)
    )


def read_archive(
    spark: SparkSession,
    root: str,
    topic: str | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Pruned archive scan: topic/date predicates hit PartitionFilters
    (directory pruning), never file contents."""
    df = spark.read.parquet(root)
    if topic is not None:
        df = df.filter(F.col("topic") == topic)
    if date_from is not None:
        df = df.filter(F.col("dt") >= F.lit(date_from).cast("date"))
    if date_to is not None:
        df = df.filter(F.col("dt") < F.lit(date_to).cast("date"))
    return df
