"""Workload analytics (WorkloadInfoRetriever / C3QueryUtils /
InstanceTopicPartitionHolder).

Reference semantics:
  * A5 ingestion rate per 10-min window: (bytes/period, msgs/period)
    (C3QueryUtils.java:45-111) — here computed from the log itself.
  * A4 max workload within a lookback window, with engineered defaults
    (1000 B/s, 1 msg/s) for topics lacking fresh data
    (WorkloadInfoRetriever.java:145-168, 209-237; ControllerConf.java:161-165)
  * A6 instance total workload (InstanceTopicPartitionHolder.java:116-132)
  * A7 overloaded = load > avg × ratio
    (AutoRebalanceLiveInstanceChangeListener.java:678-714)
  * A8 expected workers = round(total / 8 MiB) + 1
    (AdminRestletResource.java:92-132)

Determinism note: per-entity byte totals are INTEGER sums (exact,
order-independent); double division happens once per output row, so
results are bit-identical across engines/partitionings — important
both for the oracle gate and for reproducible autoscaling decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6f, round6s
from ureplicator_spark.fixtures import (
    DEFAULT_BYTES_PER_SEC,
    DEFAULT_MSGS_PER_SEC,
    MAX_WORKLOAD_PER_WORKER,
    WINDOW_SEC,
)


def workload_windows_raw(records: DataFrame, width_sec: int = WINDOW_SEC) -> DataFrame:
    """(topic, window_start, window_bytes, window_msgs) — the EXACT
    integer per-window sums behind :func:`workload_windows`. Running /
    frame aggregates must fold these (integer sums are
    order-independent) and divide ONCE at the end; folding the derived
    double rates instead would inherit each engine's window-summation
    association order (segment tree vs left fold)."""
    win = (F.col("ts_sec") - (F.col("ts_sec") % width_sec)).alias("window_start")
    return records.groupBy("topic", win).agg(
        F.sum("value_size").cast("long").alias("window_bytes"),
        F.count("*").alias("window_msgs"),
    )


def workload_windows(records: DataFrame, width_sec: int = WINDOW_SEC) -> DataFrame:
    """A5/T7: tumbling-window per-topic rates from the record log."""
    return workload_windows_raw(records, width_sec).select(
        "topic",
        "window_start",
        round6f(F.col("window_bytes") / float(width_sec)).alias("bytes_per_sec"),
        round6f(F.col("window_msgs") / float(width_sec)).alias("msgs_per_sec"),
    )


def max_workload_lookback(
    windows: DataFrame,
    topics: DataFrame,
    lookback_sec: int,
    default_bytes: float = DEFAULT_BYTES_PER_SEC,
    default_msgs: float = DEFAULT_MSGS_PER_SEC,
) -> DataFrame:
    """A4: per-topic max rate over the lookback; defaults when absent.

    ``topics`` is the serving-topic list (may include topics with no
    traffic — they get the engineered defaults, matching
    WorkloadInfoRetriever's fallback TopicWorkload).
    """
    horizon = windows.agg(F.max("window_start").alias("max_ws"))
    fresh = (
        windows.crossJoin(F.broadcast(horizon))
        .filter(F.col("window_start") >= F.col("max_ws") - lookback_sec)
        .groupBy("topic")
        .agg(
            F.max("bytes_per_sec").alias("max_bytes_per_sec"),
            F.max("msgs_per_sec").alias("max_msgs_per_sec"),
        )
    )
    return topics.join(fresh, "topic", "left").select(
        "topic",
        F.coalesce("max_bytes_per_sec", F.lit(default_bytes)).alias("max_bytes_per_sec"),
        F.coalesce("max_msgs_per_sec", F.lit(default_msgs)).alias("max_msgs_per_sec"),
    )


def partition_workload(records: DataFrame) -> DataFrame:
    """Per-(topic, partition) exact byte/msg totals + span-based rates."""
    span = records.agg(
        (F.max("ts_sec") - F.min("ts_sec")).cast("long").alias("span_sec")
    )
    return (
        records.groupBy("topic", "partition")
        .agg(
            F.sum("value_size").cast("long").alias("total_bytes"),
            F.count("*").alias("total_msgs"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            "topic",
            "partition",
            "total_bytes",
            "total_msgs",
            round6f(F.col("total_bytes") / F.col("span_sec")).alias("bytes_per_sec"),
            round6f(F.col("total_msgs") / F.col("span_sec")).alias("msgs_per_sec"),
        )
    )


def instance_load(partition_wl: DataFrame, n_instances: int) -> DataFrame:
    """A6: Σ workload per instance (deterministic topic+partition hash
    assignment, mirroring the greedy Helix placement's balanced result)."""
    assigned = partition_wl.withColumn(
        "instance",
        F.concat(
            F.lit("worker-"),
            ((F.col("partition") + F.length("topic")) % n_instances).cast("string"),
        ),
    )
    return assigned.groupBy("instance").agg(
        F.sum("total_bytes").cast("long").alias("total_bytes"),
        F.sum("total_msgs").cast("long").alias("total_msgs"),
        F.count("*").alias("n_partitions"),
    )


def overloaded_instances(loads: DataFrame, ratio_num: int = 6, ratio_den: int = 5) -> DataFrame:
    """A7: overloaded if load > avg × (ratio_num/ratio_den), computed in
    exact integer arithmetic: bytes × n_instances × den > total × num."""
    totals = loads.agg(
        F.sum("total_bytes").cast("long").alias("grand_bytes"),
        F.count("*").alias("n_instances"),
    )
    return (
        loads.crossJoin(F.broadcast(totals))
        .select(
            "instance",
            "total_bytes",
            "n_partitions",
            (
                F.col("total_bytes") * F.col("n_instances") * ratio_den
                > F.col("grand_bytes") * ratio_num
            ).alias("overloaded"),
        )
    )


def expected_workers(records: DataFrame, per_worker_bytes: int = MAX_WORKLOAD_PER_WORKER) -> DataFrame:
    """A8: round(total bytes/s ÷ per-worker capacity) + 1.

    Total rate from exact integer byte/span sums (one double division →
    order-independent, engine-identical).
    """
    return records.agg(
        F.sum("value_size").cast("long").alias("grand_bytes"),
        (F.max("ts_sec") - F.min("ts_sec")).cast("long").alias("span_sec"),
    ).select(
        round6f(F.col("grand_bytes") / F.col("span_sec")).alias("total_bytes_per_sec"),
        (
            F.floor(
                (F.col("grand_bytes") / F.col("span_sec")) / F.lit(float(per_worker_bytes))
                + F.lit(0.5)
            ).cast("int")
            + 1
        ).alias("expected_workers"),
    )


def rate_spikes(records: DataFrame, width_sec: int = 60) -> DataFrame:
    """Per-topic ingestion-rate anomaly flags: a window is a spike when
    its event count sits more than 2 population-σ above the topic's
    mean window count — the OffsetMonitor-style alert that catches a
    runaway producer or replay storm.

    Exactness discipline: the z²>4 test is evaluated in INTEGER
    arithmetic — (n·x − S)² > 4·(n·S2 − S²) with S=Σx, S2=Σx² over the
    topic's n observed windows — so no float variance accumulation
    order can flip a boundary window between engines/partitionings.
    Scale shape: one shuffle for the (topic, window) count, one for
    the per-topic moment aggregate (3 longs/topic), broadcast back.
    Only windows with ≥1 event participate (sparse representation —
    an all-silent window is absence, not a zero sample)."""
    win = (F.col("ts_sec") / width_sec).cast("long") * width_sec
    counts = (
        records.groupBy("topic", win.alias("win_start"))
        .agg(F.count("*").alias("n_events"))
    )
    moments = counts.groupBy("topic").agg(
        F.count("*").alias("n_windows"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    n, s1, s2 = F.col("n_windows"), F.col("s1"), F.col("s2")
    dev = n * F.col("n_events") - s1
    return (
        counts.join(F.broadcast(moments), "topic")
        .select(
            "topic",
            "win_start",
            "n_events",
            ((dev > 0) & (dev * dev > 4 * (n * s2 - s1 * s1))).alias("is_spike"),
        )
        .orderBy("topic", "win_start")
    )


def _ols_exact_aggs() -> list:
    """Aggregate columns for an integer-exact per-topic OLS over
    (window index, y): every sum is exact integer arithmetic, so the
    only floating-point steps are ONE division per coefficient —
    deterministic in any engine. ``regr_slope``/``regr_intercept``
    compute running double means whose summation order is
    partitioning-dependent; at sf0.1 that produced a 1-ulp difference
    that flipped the 6-dp rounding of a slope vs the oracle. Requires
    columns ``ix`` (long window index) and ``y`` (long)."""
    return [
        F.count("*").alias("n_windows"),
        F.sum("ix").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("ix") * F.col("y")).alias("sxy"),
        F.sum(F.col("ix") * F.col("ix")).alias("sxx"),
        F.max("ix").alias("max_idx"),
    ]


def _ols_coefficients(df: DataFrame) -> DataFrame:
    """Attach 6-dp ``slope``/``intercept`` from the exact sums; a
    single window (zero variance) yields NULLs like regr_slope would.
    Sums widen to decimal(38,0) before the cross products so no
    intermediate can overflow long at large window counts."""
    def D(c):  # noqa: N802 - local cast helper
        return F.col(c).cast("decimal(38,0)")

    num = D("n_windows") * D("sxy") - D("sx") * D("sy")
    den = D("n_windows") * D("sxx") - D("sx") * D("sx")
    icept_num = D("sy") * den - num * D("sx")
    icept_den = D("n_windows") * den
    return df.withColumn(
        "slope",
        F.when(den == 0, F.lit(None)).otherwise(
            round6s(num.cast("double") / den.cast("double"))
        ),
    ).withColumn(
        "intercept",
        F.when(den == 0, F.lit(None)).otherwise(
            round6s(icept_num.cast("double") / icept_den.cast("double"))
        ),
    )


def workload_trend(records: DataFrame, width_sec: int = WINDOW_SEC) -> DataFrame:
    """Per-topic ingestion TREND: OLS slope/intercept of per-window
    message counts over the window index, plus the next-window
    forecast — the predictive input a capacity planner feeds into
    expected-worker sizing (the reference sizes workers from current
    maxima only; a trend turns that reactive signal proactive).

    One windowed aggregation (same key as workload_windows) then one
    per-topic aggregate of exact integer OLS sums (see
    ``_ols_exact_aggs``), so the whole query is two shuffles on
    (topic[, window]) regardless of log size. Topics with a single
    window regress to NULL (no trend claimable)."""
    win = (F.col("ts_sec") - (F.col("ts_sec") % width_sec)).alias("window_start")
    counts = records.groupBy("topic", win).agg(F.count("*").alias("n_msgs"))
    base = counts.select(
        "topic",
        F.expr(f"window_start div {width_sec}").alias("ix"),
        F.col("n_msgs").alias("y"),
    )
    agg = _ols_coefficients(base.groupBy("topic").agg(*_ols_exact_aggs()))
    return agg.select(
        "topic",
        "n_windows",
        "slope",
        "intercept",
        round6s(F.col("intercept") + F.col("slope") * (F.col("max_idx") + 1)).alias(
            "forecast_next"
        ),
    ).orderBy("topic")


def capacity_forecast(
    records: DataFrame,
    width_sec: int = WINDOW_SEC,
    per_worker: float = MAX_WORKLOAD_PER_WORKER,
) -> DataFrame:
    """A8 made proactive: forecast each topic's next-window BYTES from
    its OLS trend (fallback: the latest observed window when a topic
    has only one window, so no trend is claimable), then size the
    worker fleet for the forecast total — the capacity-planning twin
    of ``expected_workers``, which sizes for the observed average.

    Two shuffles (per-(topic, window) sum, per-topic exact-OLS sums +
    max_by) and a single-row reduce; nothing scales with record count
    beyond the first windowed aggregation."""
    win = (F.col("ts_sec") - (F.col("ts_sec") % width_sec)).alias("window_start")
    wb = records.groupBy("topic", win).agg(
        F.sum("value_size").cast("long").alias("window_bytes")
    )
    base = wb.select(
        "topic",
        "window_start",
        F.expr(f"window_start div {width_sec}").alias("ix"),
        F.col("window_bytes").alias("y"),
    )
    per_topic = _ols_coefficients(
        base.groupBy("topic").agg(
            *_ols_exact_aggs(),
            F.max_by("y", F.col("window_start")).alias("last_bytes"),
        )
    )
    forecast = F.coalesce(
        round6s(F.col("intercept") + F.col("slope") * (F.col("max_idx") + 1)),
        F.col("last_bytes").cast("double"),
    )
    # canonical-order fold: SUM(double) over per-topic forecasts is
    # partition-order-dependent; folding the sorted value list is one
    # total order shared by any engine (topic count is tiny)
    total = per_topic.select(
        F.greatest(forecast, F.lit(0.0)).alias("f")
    ).agg(
        round6f(
            F.aggregate(
                F.sort_array(F.collect_list("f")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / width_sec
        ).alias("forecast_bytes_per_sec")
    )
    return total.select(
        "forecast_bytes_per_sec",
        (
            F.floor(
                F.col("forecast_bytes_per_sec") / float(per_worker) + F.lit(0.5)
            ).cast("int")
            + 1
        ).alias("forecast_workers"),
    )
