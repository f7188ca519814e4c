"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_builder, duckdb_oracle_sql) pair.

``QUERIES[name] = (fn, sql)`` where ``fn(spark, sf_dir) -> DataFrame``
and ``sql`` is ANSI SQL DuckDB runs over the same parquet views. The
driver hash-compares both result sets (order-insensitive, columns
sorted by name) — so every computed column is aliased identically on
both sides, doubles are rounded/decimal-cast identically, and only
engine-portable primitives (integer math, md5, length/substr) feed
grouping keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark import fixtures as FX
from ureplicator_spark.operators import replicate as R

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Data plane: replicate transform (S1/S3, P1-P4, J1) over the record log
# ---------------------------------------------------------------------------

_REPLICATE_SQL = f"""
WITH {FX.RECORDS_CTE},
{FX.TOPIC_MAPPING_CTE},
{FX.PARTITION_COUNTS_CTE}
SELECT r.topic AS src_topic,
       r."partition" AS src_partition,
       r."offset" AS offset,
       COALESCE(m.dst_topic, r.topic) AS topic_out,
       CASE WHEN pc.num_partitions IS NOT NULL AND r."partition" >= 0
            THEN r."partition" % pc.num_partitions ELSE NULL END AS partition_out,
       CASE WHEN r.ts_sec <= 0 THEN NULL ELSE r.ts_sec END AS ts_out,
       r.value_size AS value_size
FROM records r
LEFT JOIN topic_mapping m ON r.topic = m.src_topic
LEFT JOIN partition_counts pc ON COALESCE(m.dst_topic, r.topic) = pc.topic
WHERE NOT r.topic = 'error'
"""


@register("replicate_transform", _REPLICATE_SQL)
def q_replicate_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename + P2 remap + P3 ts-normalize + P4 drop + J1 broadcast map."""
    rec = FX.records(spark, sf_dir)
    out = R.replicate_transform(
        rec,
        FX.topic_mapping(spark),
        FX.partition_counts(spark),
        drop_predicate=F.col("topic") == "error",
    )
    return out.select(
        F.col("topic").alias("src_topic"),
        F.col("partition").alias("src_partition"),
        F.col("offset"),
        F.col("dst_topic").alias("topic_out"),
        F.col("dst_partition").alias("partition_out"),
        F.col("ts_sec").alias("ts_out"),
        F.col("value_size"),
    )


_BOUNDED_SQL = f"""
WITH {FX.RECORDS_CTE}
SELECT topic, "partition" AS partition,
       COUNT(*) AS n_records,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset,
       CAST(SUM(value_size) AS BIGINT) AS total_bytes
FROM records
WHERE "offset" >= 100 AND "offset" < 600
GROUP BY topic, "partition"
"""


@register("bounded_replication", _BOUNDED_SQL)
def q_bounded_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/T10: bounded [start, end) per-partition replication counts."""
    rec = FX.records(spark, sf_dir)
    out = R.bounded_counts(rec, 100, 600)
    return out.withColumn("total_bytes", F.col("total_bytes").cast("long"))
