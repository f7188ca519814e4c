"""Stateful streaming operators (T8) — the no-progress/stuck detector
as a continuous computation.

Reference semantics (OffsetMonitor.java:78, 293-307): a partition is
"no progress" when its commit offset is unchanged since the previous
tick while lag > 0; it is "stuck" once the stagnation age exceeds
MIN_NO_PROGRESS_TIME_MS (10 min). The reference keeps a driver-side
map keyed by partition; here the state lives in Spark's state store,
partitioned by (topic, partition) — it scales horizontally and
survives restarts via the checkpoint.

This is the one operator that genuinely needs
``applyInPandasWithState`` (SURVEY §7 risk 5); everything else in the
engine is stateless or window-expressible.

Also here: the watermarked streaming form of the workload windows
(A5/T7) — tumbling event-time windows with late-data tolerance.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6f
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NO_PROGRESS_OUTPUT_SCHEMA = (
    "topic string, partition int, commit_offset long, lag long, stalled_for_sec long"
)
NO_PROGRESS_STATE_SCHEMA = "last_commit long, last_change_ts long"

MIN_NO_PROGRESS_SEC = 600  # MIN_NO_PROGRESS_TIME_MS (OffsetMonitor.java:78)


def no_progress_detector(
    lag_updates: DataFrame, stall_threshold_sec: int = MIN_NO_PROGRESS_SEC
) -> DataFrame:
    """Continuous stuck-partition detection over a stream of offset
    snapshots (topic, partition, commit_offset, latest_offset, ts_sec).

    Emits a row whenever a snapshot shows commit unchanged for ≥
    threshold with positive lag. State per key: (last_commit,
    ts_of_last_commit_change).
    """

    def detect(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values("ts_sec")
        if state.exists:
            last_commit, last_change = state.get
        else:
            last_commit, last_change = None, None
        out: list[tuple] = []
        for r in rows.itertuples(index=False):
            commit = int(r.commit_offset)
            ts = int(r.ts_sec)
            if last_commit is None or commit != last_commit:
                last_commit, last_change = commit, ts
            lag = max(0, int(r.latest_offset) - max(commit, 0))
            stalled = ts - last_change
            if lag > 0 and stalled >= stall_threshold_sec:
                out.append((key[0], int(key[1]), commit, lag, stalled))
        state.update((last_commit, last_change))
        if out:
            yield pd.DataFrame(
                out,
                columns=["topic", "partition", "commit_offset", "lag", "stalled_for_sec"],
            )

    return lag_updates.groupBy("topic", "partition").applyInPandasWithState(
        detect,
        outputStructType=NO_PROGRESS_OUTPUT_SCHEMA,
        stateStructType=NO_PROGRESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_workload_windows(
    records_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """A5/T7 as a watermarked streaming aggregation: tumbling
    event-time windows with bounded state (late rows beyond the
    watermark are dropped — the reference has no event-time notion at
    all (T6), so any watermark is a strict superset of its behavior).
    """
    with_ts = records_stream.withColumn(
        "event_time", F.timestamp_seconds(F.col("ts_sec"))
    ).withWatermark("event_time", watermark)
    # rate divisor comes from the window itself, not a constant — the
    # ``window`` parameter is free-form ("10 minutes", "1 hour", ...)
    win_sec = (
        F.col("win.end").cast("long") - F.col("win.start").cast("long")
    ).cast("double")
    return (
        with_ts.groupBy("topic", F.window("event_time", window).alias("win"))
        .agg(
            F.sum("value_size").alias("window_bytes"),
            F.count("*").alias("window_msgs"),
        )
        .select(
            "topic",
            F.col("win.start").cast("long").alias("window_start"),
            round6f(F.col("window_bytes") / win_sec).alias("bytes_per_sec"),
            round6f(F.col("window_msgs") / win_sec).alias("msgs_per_sec"),
        )
    )


def streaming_session_windows(
    events_stream: DataFrame,
    gap: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Native session windows (`F.session_window`): per-user sessions
    close after ``gap`` of inactivity; watermark bounds state. The
    streaming twin of the batch ``relational.sessionize`` (same gap
    semantics, windowed state instead of a sort) — state is per OPEN
    session per user, merged incrementally as events arrive, so memory
    is O(active users), never O(events)."""
    with_ts = events_stream.withColumn(
        "event_time", F.timestamp_seconds(F.col("ts_sec"))
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy("user_id", F.session_window("event_time", gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start"),
            F.col("sw.end").cast("long").alias("session_end"),
            "n_events",
        )
    )


MOVE_OUTPUT_SCHEMA = (
    "topic string, partition int, move_seq int, from_instance string, decided_at_sec long"
)
MOVE_STATE_SCHEMA = "n_moves int, last_move_ts long"


def stuck_partition_mover(
    stuck_alerts: DataFrame,
    max_moves: int = 3,
    cooldown_sec: int = 1800,
) -> DataFrame:
    """Move decisions for stuck partitions with per-partition history:
    at most ``max_moves`` moves ever, and no move within
    ``cooldown_sec`` of the previous one — the reference's
    `_movePartitionHistoryMap` + `maxStuckPartitionMovements` +
    `movePartitionAfterStuckMillis` semantics
    (AutoRebalanceLiveInstanceChangeListener.java:100, 387-463).

    Input stream: (topic, partition, instance, ts_sec) stuck alerts
    (e.g. the no_progress_detector output joined to the assignment).
    State per key: (move count, last move time) — O(#partitions)."""

    def decide(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values("ts_sec")
        n_moves, last_move = state.get if state.exists else (0, None)
        out: list[tuple] = []
        for r in rows.itertuples(index=False):
            ts = int(r.ts_sec)
            if n_moves >= max_moves:
                continue  # movement budget exhausted — stop thrashing
            if last_move is not None and ts - last_move < cooldown_sec:
                continue  # cooling down
            n_moves += 1
            last_move = ts
            out.append((key[0], int(key[1]), n_moves, str(r.instance), ts))
        state.update((n_moves, last_move))
        if out:
            yield pd.DataFrame(
                out,
                columns=["topic", "partition", "move_seq", "from_instance", "decided_at_sec"],
            )

    return stuck_alerts.groupBy("topic", "partition").applyInPandasWithState(
        decide,
        outputStructType=MOVE_OUTPUT_SCHEMA,
        stateStructType=MOVE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
