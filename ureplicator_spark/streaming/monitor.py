"""Streaming observability — the OffsetMonitor / metrics analog.

A StreamingQueryListener captures per-micro-batch progress (rows,
rates, durations) into driver memory; ``progress_df`` exposes it as a
DataFrame so every control-plane query (lag, workload, no-progress)
runs over live telemetry exactly as it runs over the fixture log.

Reference: OffsetMonitor's cron fold (OffsetMonitor.java:240-316) and
the numDroppedMessage-style counters (ProducerThread.java:150-155 —
ours come from ``df.observe`` in the transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "input_rows_per_second double, process_rows_per_second double, "
    "batch_duration_ms long, ts string"
)


class ProgressMonitor(StreamingQueryListener):
    """Collects QueryProgress events; driver-side, bounded memory
    (keeps the last ``max_events``)."""

    def __init__(self, max_events: int = 10_000) -> None:
        self.events: list[tuple] = []
        self.max_events = max_events

    # StreamingQueryListener interface -------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.events.append(
            (
                p.name or "",
                p.batchId,
                int(p.numInputRows),
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(p.batchDuration),
                p.timestamp,
            )
        )
        if len(self.events) > self.max_events:
            del self.events[: len(self.events) - self.max_events]

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # analytics ------------------------------------------------------------
    def progress_df(self, spark: SparkSession) -> DataFrame:
        rows = self.events or []
        return spark.createDataFrame(rows, PROGRESS_SCHEMA) if rows else (
            spark.createDataFrame([], PROGRESS_SCHEMA)
        )

    def attach(self, spark: SparkSession) -> "ProgressMonitor":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
