"""Bucketed tables — co-located joins with zero shuffle.

At 100 TB the orders⋈lineitem-style fact-fact join is the single most
expensive shuffle in the engine. Writing both facts bucketed by the
join key (`bucketBy(n, key).sortBy(key)`) makes every later join/agg
on that key shuffle-free: Spark matches bucket files one-to-one and
(with `spark.sql.sources.bucketing.enabled`, on by default) plans a
SortMergeJoin with NO Exchange on either side.

This is the Spark analog of the reference pinning a topic-partition to
one worker so all its work is local (IdealStateBuilder assignment,
controller/core/IdealStateBuilder.java:40-61) — co-location decided at
write time, reused by every query after.

Bucket-count discipline: pick n_buckets so one bucket of the LARGER
table fits a task comfortably (~128-256 MB) — at 100 TB lineitem that
is O(10^5) buckets; both tables MUST use the same count or Spark
falls back to shuffling the mismatched side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its sort step
    entirely — the join becomes a streaming zip of pre-sorted files.
    """
    keys = list(keys)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
