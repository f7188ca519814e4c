"""Stateful streaming no-progress detector (T8/A2) tests."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ureplicator_spark.streaming.stateful import (
    no_progress_detector,
    streaming_workload_windows,
)

UPDATE_SCHEMA = (
    "topic string, partition int, commit_offset long, latest_offset long, ts_sec long"
)


def _run_stream(spark, src_dir, build, ckpt):
    static = spark.read.schema(UPDATE_SCHEMA).parquet(src_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(f"mem_{int(time.time() * 1000)}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {q.name}")


def test_no_progress_detector_flags_stalled_partition(spark, tmp_path):
    src = str(tmp_path / "updates")
    # tick 1: both partitions progressing
    spark.createDataFrame(
        [("t", 0, 100, 110, 1000), ("t", 1, 200, 210, 1000)], UPDATE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # tick 2 (+700 s): partition 0 commit unchanged with lag → stuck;
    # partition 1 advanced → healthy
    spark.createDataFrame(
        [("t", 0, 100, 130, 1700), ("t", 1, 260, 270, 1700)], UPDATE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    res = _run_stream(
        spark, src, lambda s: no_progress_detector(s, 600), str(tmp_path / "ck")
    )
    rows = {(r.topic, r.partition): r for r in res.collect()}
    assert ("t", 0) in rows, f"stalled partition not flagged: {rows}"
    r = rows[("t", 0)]
    assert r.stalled_for_sec >= 600 and r.lag == 30
    assert ("t", 1) not in rows  # progressing partition stays quiet


def test_no_progress_detector_no_lag_no_alert(spark, tmp_path):
    src = str(tmp_path / "updates2")
    # commit stalls but lag is zero (fully caught up) → never stuck
    spark.createDataFrame([("t", 0, 100, 100, 1000)], UPDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame([("t", 0, 100, 100, 1700)], UPDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    res = _run_stream(
        spark, src, lambda s: no_progress_detector(s, 600), str(tmp_path / "ck2")
    )
    assert res.count() == 0


def test_streaming_workload_windows_matches_batch(spark, sf_dir, tmp_path):
    """The watermarked streaming agg produces the same windows as the
    batch operator once the stream drains (availableNow)."""
    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.operators.workload import workload_windows

    src = str(tmp_path / "rec")
    FX.records(spark, sf_dir).coalesce(2).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        streaming_workload_windows(stream)
        .writeStream.format("memory")
        .queryName("wl_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wl_windows")
    expected = workload_windows(FX.records(spark, sf_dir))
    # append mode emits only windows sealed by the watermark; every
    # emitted window must match the batch result exactly
    joined = got.join(
        expected.withColumnRenamed("bytes_per_sec", "exp_bps"),
        ["topic", "window_start"],
        "left",
    )
    assert joined.filter(F.col("exp_bps").isNull()).count() == 0
    assert joined.filter(F.col("bytes_per_sec") != F.col("exp_bps")).count() == 0
    assert got.count() > 0


def test_streaming_session_windows_match_batch_sessionize(spark, sf_dir, tmp_path):
    """The native session_window streaming aggregation must produce the
    same (#sessions, #events) per user as the batch LAG-based
    sessionize (identical gap)."""
    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.operators.relational import sessionize
    from ureplicator_spark.sources.parquet import load_table
    from ureplicator_spark.streaming.stateful import streaming_session_windows

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", "event_id", FX.event_ts_sec(raw).alias("ts_sec"))
    src_dir = str(tmp_path / "ev")
    ev.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "2").parquet(src_dir)
    # files replay in arbitrary event-time order, so use a watermark
    # wider than the fixture's whole span — otherwise cross-batch late
    # rows are (correctly) dropped and the exact-equivalence check
    # can't hold
    out = streaming_session_windows(stream, watermark="90 days")
    qname = "session_windows_test"
    # complete mode: append would hold sessions back until the
    # watermark passes them, which never happens in a bounded replay
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
    got_map = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}
    exp_map = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in sessionize(ev, gap_sec=21600).collect()
    }
    assert got_map == exp_map


def test_stuck_partition_mover_cooldown_and_cap(spark, tmp_path):
    """Move history semantics: cooldown suppresses rapid re-moves and
    the per-partition budget caps total movements
    (AutoRebalance _movePartitionHistoryMap analog)."""
    from ureplicator_spark.streaming.stateful import stuck_partition_mover

    schema = "topic string, partition int, instance string, ts_sec long"
    src = str(tmp_path / "alerts")
    # 6 alerts for one partition: t=0 (move 1), t=100 (cooldown),
    # t=2000 (move 2), t=2100 (cooldown), t=4000 (move 3),
    # t=6000 (budget exhausted)
    spark.createDataFrame(
        [("t", 0, "i-0", 0), ("t", 0, "i-0", 100), ("t", 0, "i-1", 2000),
         ("t", 0, "i-1", 2100), ("t", 0, "i-2", 4000), ("t", 0, "i-0", 6000),
         ("u", 1, "i-9", 50)],
        schema,
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = stuck_partition_mover(stream, max_moves=3, cooldown_sec=1800)
    q = (
        out.writeStream.format("memory").queryName("mover_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("mover_test").collect()
    t_moves = sorted(
        [(r.move_seq, r.decided_at_sec) for r in rows if r.topic == "t"]
    )
    assert t_moves == [(1, 0), (2, 2000), (3, 4000)]  # cooldowns + cap applied
    u_moves = [(r.move_seq, r.decided_at_sec) for r in rows if r.topic == "u"]
    assert u_moves == [(1, 50)]  # independent per-partition state


def test_streaming_lag_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (J2/A1 continuous form): each
    latest-offset observation pairs with committed observations within
    tolerance; result equals the equivalent batch join."""
    from ureplicator_spark.streaming.joins import streaming_lag_join

    lat_schema = "topic string, partition int, latest_offset long, ts_sec long"
    com_schema = "topic string, partition int, commit_offset long, ts_sec long"
    lat_rows = [
        ("t", 0, 100, 1000), ("t", 0, 250, 1600), ("u", 1, 50, 1000),
    ]
    com_rows = [
        ("t", 0, 90, 700),    # within 600s of ts=1000 only
        ("t", 0, 240, 1550),  # within 600s of ts=1600 only
        ("u", 1, 80, 990),    # commit ahead of latest -> lag clamps to 0
        ("u", 1, 10, 200),    # too old for any latest observation
    ]
    lat_src, com_src = str(tmp_path / "lat"), str(tmp_path / "com")
    spark.createDataFrame(lat_rows, lat_schema).coalesce(1).write.parquet(lat_src)
    spark.createDataFrame(com_rows, com_schema).coalesce(1).write.parquet(com_src)

    out = streaming_lag_join(
        spark.readStream.schema(lat_schema).parquet(lat_src),
        spark.readStream.schema(com_schema).parquet(com_src),
        tolerance_sec=600,
    )
    q = (
        out.writeStream.format("memory").queryName("lag_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.topic, r.partition, r.latest_offset, r.commit_offset, r.lag,
         r.latest_ts_sec, r.commit_ts_sec)
        for r in spark.table("lag_join_test").collect()
    }
    expected = {
        ("t", 0, 100, 90, 10, 1000, 700),
        ("t", 0, 250, 240, 10, 1600, 1550),
        ("u", 1, 50, 80, 0, 1000, 990),
    }
    assert got == expected


def test_streaming_lag_join_left_outer_emits_missing_commits(spark, tmp_path):
    """leftOuter interval join: a latest-offset observation with no
    committed observation within tolerance must surface (null commit)
    once the watermark passes its eviction bound."""
    from pyspark.sql import functions as F

    from ureplicator_spark.streaming.joins import streaming_lag_join

    lat_schema = "topic string, partition int, latest_offset long, ts_sec long"
    com_schema = "topic string, partition int, commit_offset long, ts_sec long"
    lat_src, com_src = str(tmp_path / "lat"), str(tmp_path / "com")
    # batch 1: the observation that will go unmatched; batch 2: a much
    # later observation that advances the watermark past its bound
    spark.createDataFrame([("t", 0, 100, 1000)], lat_schema).coalesce(1).write.parquet(lat_src)
    spark.createDataFrame(
        [("t", 0, 999, 50000)], lat_schema
    ).coalesce(1).write.mode("append").parquet(lat_src)
    spark.createDataFrame([("t", 0, 990, 49900)], com_schema).coalesce(1).write.parquet(com_src)

    out = streaming_lag_join(
        spark.readStream.schema(lat_schema).option("maxFilesPerTrigger", "1").parquet(lat_src),
        spark.readStream.schema(com_schema).parquet(com_src),
        watermark_delay="10 seconds",
        tolerance_sec=600,
        how="leftOuter",
    )
    q = (
        out.writeStream.format("memory").queryName("lag_outer_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.latest_offset, r.commit_offset, r.lag)
        for r in spark.table("lag_outer_test").collect()
    }
    assert (999, 990, 9) in rows          # matched pair
    assert (100, None, None) in rows      # unmatched -> outer row with nulls
