"""Live control-plane tests (streaming/dynamic.py): rate changes and
blacklist edits apply to a RUNNING query at the next micro-batch, and
a topic that did not exist at query start flows through — all with the
same runId (no restart). Mirrors the reference's live RateLimiter swap
(RateLimiterResource.java:41-62) and non-stop partition reconciliation
(ConsumerFetcherThread.java:183-206).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ureplicator_spark import fixtures as FX
from ureplicator_spark.streaming.dynamic import ControlDoc
from ureplicator_spark.streaming.replication import ReplicationJob, Route


def _route(max_files: int = 100) -> Route:
    return Route(
        src_cluster="sjc1",
        dst_cluster="dca1",
        route_id=7,
        topic_mapping=dict(FX.TOPIC_MAPPING_ROWS),
        partition_counts=dict(FX.PARTITION_COUNT_ROWS),
        max_files_per_trigger=max_files,
    )


@pytest.fixture()
def dyn(spark, sf_dir, tmp_path):
    """A running dynamic-controlled stream over a file source, plus the
    handles the tests poke: (job, query, control, src_dir, out_dir)."""
    src = str(tmp_path / "records")
    FX.records(spark, sf_dir).limit(400).coalesce(1).write.parquet(src)
    control = ControlDoc(str(tmp_path / "control.json"))
    job = ReplicationJob(
        spark,
        _route(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_kind="files",
        source_path=src,
    )
    out = str(tmp_path / "out")
    q = job.start_dynamic(out, control)
    try:
        yield job, q, control, src, out
    finally:
        q.stop()


def _feed(spark, sf_dir, src, n: int, topic: str | None = None):
    """Append one more file of n records (optionally a single topic)."""
    df = FX.records(spark, sf_dir)
    if topic is not None:
        df = df.withColumn("topic", F.lit(topic))
    df.limit(n).coalesce(1).write.mode("append").parquet(src)


def test_live_rate_change_no_restart(spark, sf_dir, dyn):
    """PUT-a-new-rate semantics: unlimited → throttled at the NEXT
    batch, not at restart. The sink's decision log pins the applied
    rate and computed sleep per batch (no wall-clock racing)."""
    job, q, control, src, _out = dyn
    q.processAllAvailable()
    n0 = len(job.dynamic_sink.log)
    assert n0 >= 1
    assert all(
        b["rate"] is None and b["slept_sec"] == 0.0 for b in job.dynamic_sink.log
    )
    run_id = q.runId

    control.set_rate(2000)  # 400-record batch → ~0.2 s token-bucket sleep
    _feed(spark, sf_dir, src, 400)
    q.processAllAvailable()
    new = job.dynamic_sink.log[n0:]
    assert sum(b["rows_written"] for b in new) == 400
    assert all(b["rate"] == 2000 for b in new)
    assert sum(b["slept_sec"] for b in new) >= 400 / 2000 * 0.9
    assert q.runId == run_id and q.isActive  # never restarted

    control.set_rate(None)  # back to unlimited, again without restart
    _feed(spark, sf_dir, src, 100)
    q.processAllAvailable()
    last = job.dynamic_sink.log[-1]
    assert last["rate"] is None and last["slept_sec"] == 0.0
    assert q.runId == run_id


def test_live_blacklist_topic_remove(spark, sf_dir, dyn):
    """Topic REMOVE without stopping the query: blacklisted source
    topics vanish from batches after the edit; earlier output stays."""
    job, q, control, src, out = dyn
    q.processAllAvailable()
    before = spark.read.parquet(out)
    n_click_before = before.filter(F.col("topic") == "click").count()
    assert n_click_before > 0
    run_id = q.runId

    control.set_blacklist(["click"])
    _feed(spark, sf_dir, src, 300)
    q.processAllAvailable()
    after = spark.read.parquet(out)
    # no NEW click rows landed; other topics kept flowing
    assert after.filter(F.col("topic") == "click").count() == n_click_before
    assert after.count() > before.count()
    dropped = [b for b in job.dynamic_sink.log if b["blacklist"] == ["click"]]
    assert dropped and any(b["rows_in"] > b["rows_written"] for b in dropped)
    assert q.runId == run_id and q.isActive

    control.set_blacklist([])  # un-blacklist: next batches include it again
    _feed(spark, sf_dir, src, 300)
    q.processAllAvailable()
    assert (
        spark.read.parquet(out).filter(F.col("topic") == "click").count()
        > n_click_before
    )
    assert q.runId == run_id


def test_topic_add_without_restart(spark, sf_dir, dyn):
    """Topic ADD while running: records for a topic unknown at query
    start are discovered and replicated (P1 coalesce keeps the name),
    same runId throughout — the reference's non-stop reconciliation."""
    job, q, control, src, out = dyn
    q.processAllAvailable()
    run_id = q.runId
    assert spark.read.parquet(out).filter(F.col("topic") == "brand_new").count() == 0

    _feed(spark, sf_dir, src, 120, topic="brand_new")
    q.processAllAvailable()
    landed = spark.read.parquet(out).filter(F.col("topic") == "brand_new")
    assert landed.count() == 120
    # unmapped topic keeps its name (getOrDefault contract)
    assert landed.filter(F.col("dst_topic") == "brand_new").count() == 120
    assert q.runId == run_id and q.isActive


def test_live_topic_remap_and_expand(spark, sf_dir, dyn):
    """Runtime topology change WITHOUT restart: a new rename target and
    a bigger partition count land in the next batch's broadcast dims —
    the reference's topic-expand reconciliation
    (ConsumerFetcherThread.java:183-206)."""
    job, q, control, src, out = dyn
    q.processAllAvailable()
    run_id = q.runId
    before = spark.read.parquet(out)
    assert before.filter(F.col("dst_topic") == "click_v2").count() == 0
    max_p_before = (
        before.filter(F.col("topic") == "click")
        .agg(F.max("dst_partition"))
        .collect()[0][0]
    )
    assert max_p_before < 3  # static route maps click -> 3 partitions

    # rename click -> click_v2 and expand to 16 partitions, live
    control.set_topics({"click": "click_v2"}, {"click_v2": 16})
    _feed(spark, sf_dir, src, 400)
    q.processAllAvailable()
    after = spark.read.parquet(out)
    new_click = after.filter(
        (F.col("topic") == "click") & (F.col("dst_topic") == "click_v2")
    )
    assert new_click.count() > 0
    assert new_click.agg(F.max("dst_partition")).collect()[0][0] > 2
    # pre-change rows are untouched history
    assert after.filter(F.col("dst_topic") == "click_mirror").count() == before.filter(
        F.col("dst_topic") == "click_mirror"
    ).count()
    assert q.runId == run_id and q.isActive
    assert job.dynamic_sink.log[-1]["live_topology"] is True


def test_engine_applies_rate_and_blacklist_live(spark, sf_dir, tmp_path):
    """Engine.set_rate / blacklist_add reach a running dynamic route's
    ControlDoc (the REST PUT /ratelimiter path) — applied_live_routes
    names it and the next batch obeys."""
    from ureplicator_spark.api import Engine

    src = str(tmp_path / "records")
    FX.records(spark, sf_dir).limit(200).coalesce(1).write.parquet(src)
    control = ControlDoc(str(tmp_path / "control.json"))
    job = ReplicationJob(
        spark,
        _route(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_kind="files",
        source_path=src,
    )
    eng = Engine(spark)
    eng.add_route(job)
    out = str(tmp_path / "out")
    q = job.start_dynamic(out, control)
    try:
        q.processAllAvailable()
        resp = eng.set_rate(5000)
        assert resp["applied_live_routes"] == [job.route.name]
        assert resp["running_routes_pending_restart"] == []
        eng.blacklist_add("view")
        FX.records(spark, sf_dir).limit(200).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        last = job.dynamic_sink.log[-1]
        assert last["rate"] == 5000
        assert last["blacklist"] == ["view"]

        # PUT /topics path: expand reaches the running route live
        eng.add_topic("click", dst_topic="click_wide", partitions=12)
        FX.records(spark, sf_dir).limit(200).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        assert job.dynamic_sink.log[-1]["live_topology"] is True
        landed = spark.read.parquet(out).filter(
            F.col("dst_topic") == "click_wide"
        )
        assert landed.count() > 0
    finally:
        q.stop()


def test_dynamic_route_checkpoint_restart_no_duplicates(
    spark, sf_dir, tmp_path
):
    """A clean stop + restart from the same checkpoint must not
    re-append committed batches (the T1 at-least-once window is only
    crash-mid-batch, never a clean restart), and the control doc keeps
    governing the resumed query."""
    src = str(tmp_path / "records")
    FX.records(spark, sf_dir).limit(300).coalesce(1).write.parquet(src)
    control = ControlDoc(str(tmp_path / "control.json"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    job1 = ReplicationJob(
        spark, _route(), checkpoint_dir=ckpt,
        source_kind="files", source_path=src,
    )
    q1 = job1.start_dynamic(out, control)
    q1.processAllAvailable()
    q1.stop()
    n1 = spark.read.parquet(out).count()
    assert n1 == 300

    # restart: same checkpoint, nothing new -> nothing re-emitted
    job2 = ReplicationJob(
        spark, _route(), checkpoint_dir=ckpt,
        source_kind="files", source_path=src,
    )
    q2 = job2.start_dynamic(out, control)
    try:
        q2.processAllAvailable()
        assert spark.read.parquet(out).count() == n1

        # the resumed query still reads the live doc
        control.set_blacklist(["click"])
        _feed(spark, sf_dir, src, 200)
        q2.processAllAvailable()
        after = spark.read.parquet(out)
        assert after.count() > n1
        assert job2.dynamic_sink.log[-1]["blacklist"] == ["click"]
        assert job2.dynamic_sink.log[-1]["rows_in"] > job2.dynamic_sink.log[-1][
            "rows_written"
        ]
    finally:
        q2.stop()


def test_rest_route_teardown(spark, sf_dir, tmp_path):
    """DELETE /routes/{name} stops the query and drops it from the
    registry; checkpoint state survives for a later resume."""
    import json as _json
    import urllib.parse
    import urllib.request

    from ureplicator_spark.api import Engine
    from ureplicator_spark.api_http import RestServer

    src = str(tmp_path / "records")
    FX.records(spark, sf_dir).limit(100).coalesce(1).write.parquet(src)
    control = ControlDoc(str(tmp_path / "control.json"))
    job = ReplicationJob(
        spark, _route(), checkpoint_dir=str(tmp_path / "ckpt"),
        source_kind="files", source_path=src,
    )
    eng = Engine(spark)
    eng.add_route(job)
    srv = RestServer(eng, port=0).start()
    q = job.start_dynamic(str(tmp_path / "out"), control)
    try:
        q.processAllAvailable()
        quoted = urllib.parse.quote(job.route.name)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/routes/{quoted}", method="DELETE"
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert _json.loads(resp.read())["removed"] == job.route.name
        assert not q.isActive  # stopped by the teardown
        assert job.route.name not in eng.routes.jobs
    finally:
        if q.isActive:
            q.stop()
        srv.stop()
