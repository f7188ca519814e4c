"""Stream-stream joins over the control-plane streams.

The reference computes lag by joining two *polled snapshots* — broker
latest offsets vs ZK committed offsets (OffsetMonitor.java:276-292,
J2/A1). As continuous streams, this is a watermarked stream-stream
interval join: each latest-offset observation pairs with the most
recent committed-offset observation within a tolerance window.

Scale shape: both sides are keyed on (topic, partition) — the join
state store partitions on that key, so state per task is bounded by
the partitions-per-task share of the topology, and the watermark
bounds state retention in time. No unbounded buffering: Spark evicts
rows once the watermark passes the interval upper bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_lag_join(
    latest: DataFrame,
    committed: DataFrame,
    watermark_delay: str = "10 minutes",
    tolerance_sec: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Continuous lag: join a stream of broker latest-offset
    observations (topic, partition, latest_offset, ts_sec) with a
    stream of committed-offset observations (topic, partition,
    commit_offset, ts_sec).

    A pair matches when the commit observation is no older than
    ``tolerance_sec`` before the latest-offset observation (and not
    newer) — the streaming analogue of OffsetMonitor joining the
    freshest committed snapshot to each poll. Lag is clamped ≥ 0
    exactly like the reference's gauges (OffsetMonitor.java:391-400).

    Both watermarks bound state: rows are evicted once event time
    passes ``watermark_delay`` + interval bound, so the state store
    holds O(observations within the window) per (topic, partition).

    ``how="leftOuter"`` additionally emits latest-offset observations
    that saw NO committed offset within tolerance (null commit/lag
    columns) once the watermark proves none can arrive — the "commits
    stopped flowing entirely" alert that a plain inner join would
    silently drop.
    """
    lt = (
        latest.withColumn("latest_ts", F.timestamp_seconds("ts_sec"))
        .drop("ts_sec")
        .withWatermark("latest_ts", watermark_delay)
    )
    cm = (
        committed.select(
            F.col("topic").alias("c_topic"),
            F.col("partition").alias("c_partition"),
            "commit_offset",
            F.timestamp_seconds("ts_sec").alias("commit_ts"),
        ).withWatermark("commit_ts", watermark_delay)
    )
    cond = (
        (F.col("topic") == F.col("c_topic"))
        & (F.col("partition") == F.col("c_partition"))
        & (F.col("commit_ts") <= F.col("latest_ts"))
        & (F.col("commit_ts") >= F.col("latest_ts") - F.expr(f"INTERVAL {tolerance_sec} SECONDS"))
    )
    return (
        lt.join(cm, cond, how)
        .select(
            "topic",
            "partition",
            "latest_offset",
            "commit_offset",
            F.when(
                F.col("commit_offset").isNull(), F.lit(None).cast("long")
            )
            .otherwise(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.col("latest_offset") - F.col("commit_offset"),
                )
            )
            .alias("lag"),
            F.unix_timestamp("latest_ts").alias("latest_ts_sec"),
            F.unix_timestamp("commit_ts").alias("commit_ts_sec"),
        )
    )
