"""Offset / lag / no-progress analytics (OffsetMonitor).

Reference semantics:
  * J2 latest ⋈ committed per partition  (OffsetMonitor.java:276-292)
  * A1 lag = max(0, latest − commit)     (OffsetMonitor.java:391-400)
  * A2 no-progress: commit offset unchanged between two monitor ticks
    while lag > 0; stuck once stagnation exceeds MIN_NO_PROGRESS_TIME_MS
    (OffsetMonitor.java:78, 293-307, 458-474)
  * A3 lagTime = lag / max(1, msgsPerSecond)
    (HelixMirrorMakerManager.java:398-420)

Scale notes: all aggregations are partial-aggregated map-side before
the single shuffle on (topic, partition); the join keys reuse that
same partitioning so AQE plans a shuffle-free sort-merge or broadcasts
the (small) committed side. Cardinality is #partitions, not #records —
these queries stay cheap no matter the log size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.functions import clamp_lag, round6f


def committed_offsets(records: DataFrame, as_of_sec: int) -> DataFrame:
    """Checkpoint snapshot: highest offset consumed by time ``as_of_sec``.

    Stand-in for the ZK store read (ZookeeperCheckpointManager.java:114-130);
    partitions with no commit are absent (fetchOffset = -1 semantics).
    """
    return (
        records.filter(F.col("ts_sec") <= as_of_sec)
        .groupBy("topic", "partition")
        .agg(F.max("offset").alias("commit_offset"))
    )


def latest_offsets(records: DataFrame) -> DataFrame:
    """Broker end-offsets (OffsetMonitor.java:340-356)."""
    return records.groupBy("topic", "partition").agg(
        F.max("offset").alias("latest_offset")
    )


def consumer_lag(latest: DataFrame, committed: DataFrame) -> DataFrame:
    """J2 + A1: left join then clamped lag; missing commit → -1."""
    joined = latest.join(committed, ["topic", "partition"], "left")
    return joined.select(
        "topic",
        "partition",
        "latest_offset",
        F.coalesce("commit_offset", F.lit(-1).cast("long")).alias("commit_offset"),
        clamp_lag(
            F.col("latest_offset"),
            F.greatest(F.coalesce("commit_offset", F.lit(0).cast("long")), F.lit(0).cast("long")),
        ).alias("lag"),
    )


def no_progress(
    records: DataFrame,
    t1_sec: int,
    t2_sec: int,
    c1: DataFrame | None = None,
    c2: DataFrame | None = None,
) -> DataFrame:
    """A2: partitions whose commit is unchanged from t1→t2 with lag > 0.

    ``c1``/``c2`` override the derived snapshots (both with columns
    topic, partition, commit_offset) — the monitor compares whatever
    the checkpoint store reports, not necessarily what the log implies.
    """
    if c1 is None:
        c1 = committed_offsets(records, t1_sec)
    if c2 is None:
        c2 = committed_offsets(records, t2_sec)
    c1 = c1.withColumnRenamed("commit_offset", "commit_t1")
    c2 = c2.withColumnRenamed("commit_offset", "commit_t2")
    lat = latest_offsets(records)
    j = (
        lat.join(c1, ["topic", "partition"], "left")
        .join(c2, ["topic", "partition"], "left")
        .withColumn("lag", clamp_lag("latest_offset", F.coalesce("commit_t2", F.lit(0).cast("long"))))
    )
    return j.filter(
        F.col("commit_t1").isNotNull()
        & (F.col("commit_t1") == F.col("commit_t2"))
        & (F.col("lag") > 0)
    ).select("topic", "partition", "commit_t2", "lag")


def lag_time(lag_df: DataFrame, workload_df: DataFrame) -> DataFrame:
    """A3: estimated seconds of lag = lag / max(1, msgs_per_sec)."""
    j = lag_df.join(workload_df.select("topic", "partition", "msgs_per_sec"),
                    ["topic", "partition"], "left")
    return j.select(
        "topic",
        "partition",
        "lag",
        round6f(
            F.col("lag").cast("double")
            / F.greatest(F.lit(1.0), F.coalesce("msgs_per_sec", F.lit(0.0))),
            4,
        ).alias("lag_time_sec"),
    )
