"""Streaming corpus curation: the training-data gates applied to a
document stream must agree with their batch twins (same rows through
an availableNow run) and keep dedup state bounded by the watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ureplicator_spark.sources.parquet import load_table
from ureplicator_spark.streaming.curation import (
    doc_quality_columns,
    quality_gated_stream,
    streaming_exact_dedup,
)


@pytest.fixture()
def doc_dir(spark, sf_dir, tmp_path):
    """Documents replayed as a stream source, with one duplicated
    slice to exercise dedup."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "ingest_ts", F.timestamp_seconds(F.col("doc_id") + 1_700_000_000)
    )
    d = str(tmp_path / "docs_stream")
    docs.write.parquet(d)
    docs.filter(F.col("doc_id") < 50).write.mode("append").parquet(d)
    return d


def test_quality_gate_stream_matches_batch(spark, doc_dir, tmp_path):
    batch = spark.read.parquet(doc_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_dir)
    )
    out = str(tmp_path / "gated_out")
    q = (
        quality_gated_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = quality_gated_stream(batch)
    assert got.count() == want.count()
    assert (
        got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0
    )
    # the gate keeps a nontrivial subset (fixture docs vary in quality)
    assert 0 < got.count() <= batch.count()


def test_streaming_exact_dedup_suppresses_replays(spark, doc_dir, tmp_path):
    batch = spark.read.parquet(doc_dir)
    n_distinct = batch.select("text").distinct().count()
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_dir)
    )
    out = str(tmp_path / "dedup_out")
    q = (
        streaming_exact_dedup(stream, watermark="365 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n_distinct
    assert got.select("content_hash").distinct().count() == n_distinct


def test_doc_quality_columns_are_stateless_expressions(spark, sf_dir):
    """The streaming-safe signals must be pure column expressions —
    no aggregation, no shuffle — so the gate stays map-only."""
    from ureplicator_spark.plans.inspect import count_shuffles

    docs = load_table(spark, sf_dir, "documents")
    assert count_shuffles(doc_quality_columns(docs)) == 0
    assert count_shuffles(quality_gated_stream(docs)) == 0


def test_streaming_exact_dedup_evicts_state_past_watermark(spark, doc_dir, tmp_path):
    """The at-scale contract is EVICTION, not just output rows: once the
    watermark passes a hash's last-seen event time its state row must be
    removed (plain dropDuplicates on the hash alone never removes state,
    growing O(all distinct hashes ever) on an infinite stream). The doc
    timestamps span ~550 s, so a 10 s horizon forces removals between
    the two micro-batches; assert the state operator reports them and
    the final state is far below the distinct-hash count."""
    batch = spark.read.parquet(doc_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_dir)
    )
    q = (
        streaming_exact_dedup(stream, watermark="10 seconds")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "evict_out"))
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progresses, "no state operator progress captured"
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses)
    final_state = progresses[-1]["stateOperators"][0].get("numRowsTotal", 0)
    n_distinct = batch.select(F.md5("text")).distinct().count()
    assert removed > 0
    assert final_state < n_distinct


def test_streaming_near_dedup_against_index(spark, sf_dir, tmp_path):
    """End-to-end streaming ingestion vs the persisted MinHash index:
    batch 1's docs are accepted and indexed; batch 2's near-dup of a
    batch-1 doc is dropped while its fresh docs land; the index grows
    with survivors only."""
    from pyspark.sql import functions as F

    from ureplicator_spark.sources.minhash_index import build_minhash_index
    from ureplicator_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    cols = "doc_id long, text string"
    root = str(tmp_path / "mhidx")
    surv = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    stream_src = str(tmp_path / "incoming")

    # seed the index with a tiny corpus
    seed = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    build_minhash_index(seed, root)

    # batch 1: two fresh docs; batch 2: one fresh + one copy of a
    # SEED doc + one copy of a BATCH-1 doc (arrives as a second file)
    b1 = [(10_001, "alpha beta gamma delta epsilon zeta eta theta"),
          (10_002, "one two three four five six seven eight nine")]
    seed_text = seed.filter(F.col("doc_id") == 0).collect()[0].text
    b2 = [(20_001, "totally novel content that matches nothing else here"),
          (20_002, seed_text),
          (20_003, b1[0][1])]
    spark.createDataFrame(b1, cols).coalesce(1).write.mode("append").parquet(stream_src)
    spark.createDataFrame(b2, cols).coalesce(1).write.mode("append").parquet(stream_src)
    # the file source orders batches by modification time; same-second
    # writes would tie and break the batch-1-before-batch-2 premise,
    # so pin distinct mtimes explicitly
    import os
    import time as _time

    parts = sorted(
        (f for f in os.listdir(stream_src) if f.endswith(".parquet")),
        key=lambda f: os.path.getmtime(os.path.join(stream_src, f)),
    )
    b1_file = next(
        f for f in parts
        if spark.read.parquet(os.path.join(stream_src, f)).filter(
            F.col("doc_id") == 10_001
        ).count() > 0
    )
    now = _time.time()
    for f in parts:
        os.utime(
            os.path.join(stream_src, f),
            (now - 60, now - 60) if f == b1_file else (now, now),
        )

    from ureplicator_spark.streaming.curation import streaming_near_dedup

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_src)
    )
    q = streaming_near_dedup(stream, root, surv, ckpt, available_now=True)
    q.awaitTermination(180)

    landed = {r.doc_id for r in spark.read.parquet(surv).select("doc_id").collect()}
    # batch-1 docs and the genuinely novel doc landed
    assert {10_001, 10_002, 20_001} <= landed
    # the seed copy was dropped against the index
    assert 20_002 not in landed
    # the batch-1 copy was dropped only if batch 1 was indexed first
    # (file order == batch order with maxFilesPerTrigger=1)
    assert 20_003 not in landed
    # survivors' signatures were appended (index covers seed + landed)
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(root + "/signatures").select("doc_id").collect()
    }
    assert landed <= idx_ids and 20_002 not in idx_ids


def test_streaming_shard_feed_continues_cumsum_across_batches(spark, tmp_path):
    """Shard ids keep growing across micro-batches: running the feed
    over two batches must produce exactly the shard layout the BATCH
    operator produces over the concatenation, and a replayed batch id
    must reuse its original offset (idempotent re-land)."""
    import json
    import os
    import time as _time

    from pyspark.sql import functions as F

    from ureplicator_spark.operators.text import token_shard_packing
    from ureplicator_spark.streaming.curation import streaming_shard_feed

    cols = "doc_id long, text string"
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "incoming")
    # 7 tokens per doc, budget 10 -> shards straddle batch boundaries
    b1 = [(i, "w w w w w w w") for i in range(5)]
    b2 = [(i, "w w w w w w w") for i in range(5, 11)]
    spark.createDataFrame(b1, cols).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, cols).coalesce(1).write.mode("append").parquet(src)
    parts = [f for f in os.listdir(src) if f.endswith(".parquet")]
    b1_file = next(
        f for f in parts
        if spark.read.parquet(os.path.join(src, f)).filter(F.col("doc_id") == 0).count()
    )
    now = _time.time()
    for f in parts:
        os.utime(os.path.join(src, f), (now - 60, now - 60) if f == b1_file else (now, now))

    stream = (
        spark.readStream.schema(cols).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = streaming_shard_feed(stream, out, ckpt, budget=10, available_now=True)
    q.awaitTermination(180)

    landed = spark.read.parquet(os.path.join(out, "shards"))
    got = {
        (r.shard_id, r.n_docs, r.total_tokens)
        for r in landed.groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .collect()
    }
    all_docs = spark.createDataFrame(b1 + b2, cols)
    expect = {
        (r.shard_id, r.n_docs, r.total_tokens)
        for r in token_shard_packing(all_docs, budget=10).collect()
    }
    assert got == expect
    # replay contract: the recorded state lets a re-delivered final
    # batch restart from its original offset instead of double-counting
    state = json.load(open(os.path.join(out, "_feed_state.json")))
    assert state["cum"] == 77  # 11 docs x 7 tokens
    assert state["cum_before"] == 35  # 5 docs x 7 tokens before batch 2


@pytest.mark.slow
def test_streaming_cdc_apply_converges_archive(spark, sf_dir, tmp_path):
    """End-to-end CDC loop: archive holds snapshot A; the delta
    between A and target B (computed by snapshot_diff, payloads joined
    back) streams in per-file micro-batches through
    streaming_cdc_apply; the archive must converge to exactly B."""
    from pyspark.sql import functions as F

    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.sources.archive import (
        read_archive,
        snapshot_diff,
        write_archive,
    )
    from ureplicator_spark.streaming.cdc import streaming_cdc_apply

    keys = ["topic", "partition", "offset"]
    rec = FX.records(spark, sf_dir).drop("props")
    # snapshot A: missing every 5th offset; target B: drops every 7th,
    # mutates value_size on every 3rd (ts_sec untouched — dt-stable)
    snap_a = rec.filter(F.col("offset") % 5 != 0)
    snap_b = rec.filter(F.col("offset") % 7 != 0).withColumn(
        "value_size",
        F.when(F.col("offset") % 3 == 0, F.col("value_size") + 1).otherwise(
            F.col("value_size")
        ),
    )
    root = str(tmp_path / "archive")
    write_archive(snap_a, root)

    diff = snapshot_diff(snap_a, snap_b, keys).select(*keys, "change_type")
    payload_cols = [c for c in snap_b.columns if c not in keys]
    delta = (
        diff.filter(F.col("change_type") != "removed")
        .join(snap_b, keys)
        .unionByName(diff.filter(F.col("change_type") == "removed").join(snap_a, keys))
        .select(*keys, *payload_cols, "change_type")
    )
    n_delta = delta.count()
    assert n_delta > 0

    # two files -> two micro-batches under maxFilesPerTrigger=1
    delta_dir = str(tmp_path / "delta")
    delta.filter(F.col("offset") % 2 == 0).coalesce(1).write.parquet(
        delta_dir + "/part_even"
    )
    delta.filter(F.col("offset") % 2 == 1).coalesce(1).write.parquet(
        delta_dir + "/part_odd"
    )
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(delta_dir)
    )
    q = streaming_cdc_apply(
        stream, root, str(tmp_path / "ckpt"), tuple(keys), available_now=True
    )
    q.awaitTermination(300)

    got = read_archive(spark, root).select(*keys, *payload_cols)
    want = snap_b.select(*keys, *payload_cols)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_ivm_matches_recompute_and_skips_replay(spark, sf_dir, tmp_path):
    """IVM: a per-topic (count, total value_size) view maintained from
    the CDC delta stream must equal the from-scratch aggregate of the
    target snapshot; a replayed batch id must be a no-op."""
    from pyspark.sql import functions as F

    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.sources.archive import snapshot_diff
    from ureplicator_spark.streaming.ivm import (
        apply_delta_to_view,
        read_view,
        streaming_view_maintenance,
    )

    keys = ["topic", "partition", "offset"]
    rec = FX.records(spark, sf_dir).select(*keys, "value_size")
    snap_a = rec.filter(F.col("offset") % 5 != 0)
    snap_b = rec.filter(F.col("offset") % 7 != 0).withColumn(
        "value_size",
        F.when(F.col("offset") % 3 == 0, F.col("value_size") + 10).otherwise(
            F.col("value_size")
        ),
    )
    view = str(tmp_path / "view")
    # seed the view with snapshot A's aggregate (the one-off build)
    seed = snap_a.groupBy("topic").agg(
        F.count("*").alias("n_records"),
        F.sum("value_size").cast("long").alias("total"),
    )
    seed.write.parquet(view)

    delta = snapshot_diff(snap_a, snap_b, keys, include_values=True)
    delta_dir = str(tmp_path / "delta")
    delta.filter(F.col("offset") % 2 == 0).coalesce(1).write.parquet(
        delta_dir + "/even"
    )
    delta.filter(F.col("offset") % 2 == 1).coalesce(1).write.parquet(delta_dir + "/odd")

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(delta_dir)
    )
    q = streaming_view_maintenance(
        stream, view, str(tmp_path / "ckpt"), ["topic"], "value_size",
        available_now=True,
    )
    q.awaitTermination(300)

    got = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    want = {
        r.topic: (r.n_records, r.total)
        for r in snap_b.groupBy("topic")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("value_size").cast("long").alias("total"),
        )
        .collect()
    }
    assert got == want

    # replayed batch id (same as the last applied) must be skipped
    applied = apply_delta_to_view(
        spark, view, delta.limit(5), ["topic"], "value_size", batch_id=0
    )
    assert applied is False
    got2 = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    assert got2 == want


def test_streaming_hll_matches_batch_and_replay_is_noop(spark, sf_dir, tmp_path):
    """Streamed register maintenance must equal the one-shot batch
    registers (same estimates), and re-merging an already-applied
    batch must change nothing (MAX-merge idempotence — the replay
    guard IVM needs and sketches don't)."""
    from pyspark.sql import functions as F

    from ureplicator_spark.operators.sketch import hll_gauge
    from ureplicator_spark.sources.parquet import load_table
    from ureplicator_spark.streaming.sketches import (
        hll_estimates,
        merge_registers_batch,
        streaming_hll_maintenance,
    )

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )

    feed_dir = str(tmp_path / "feed")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    for name, part in (("a", half_a), ("b", half_b)):
        part.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        ).coalesce(1).write.parquet(f"{feed_dir}/{name}")

    table = str(tmp_path / "registers")
    stream = (
        spark.readStream.schema("source string, token string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    q = streaming_hll_maintenance(
        stream, table, str(tmp_path / "ckpt"), "source", "token",
        available_now=True,
    )
    q.awaitTermination(300)

    got = {
        r.source: r.est_distinct
        for r in hll_estimates(spark, table, "source").collect()
    }
    want = {
        r.source: r.est_distinct for r in hll_gauge(keyed, "source", "token").collect()
    }
    assert got == want

    # replayed batch: MAX-merge is a no-op
    replay = half_a.select("source", F.explode(F.split("text", " ")).alias("token"))
    merge_registers_batch(spark, table, replay, "source", "token")
    got2 = {
        r.source: r.est_distinct
        for r in hll_estimates(spark, table, "source").collect()
    }
    assert got2 == want


def test_refcounted_distinct_view_retracts_exactly(spark, sf_dir, tmp_path):
    """Exact incremental COUNT(DISTINCT partition) per topic with
    deletions: removing SOME records of a (topic, partition) keeps it
    in the distinct set; removing ALL of them drops it — and the
    maintained counts equal a from-scratch recompute of the target
    snapshot. Replay of an applied batch id is a no-op."""
    from pyspark.sql import functions as F

    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.sources.archive import snapshot_diff
    from ureplicator_spark.streaming.ivm import (
        apply_delta_to_distinct_view,
        distinct_counts,
    )

    keys = ["topic", "partition", "offset"]
    rec = FX.records(spark, sf_dir).select(*keys)
    snap_a = rec
    # B drops EVERY record of (click, partition 2) -> that partition
    # must leave click's distinct set; also thins other partitions
    # (offset % 3) without draining them
    snap_b = rec.filter(
        ~((F.col("topic") == "click") & (F.col("partition") == 2))
    ).filter(F.col("offset") % 3 != 0)

    delta = snapshot_diff(snap_a, snap_b, keys).select(*keys, "change_type")
    view = str(tmp_path / "distinct_view")
    # seed with snapshot A as one "added" batch, then apply the delta
    seed = snap_a.withColumn("change_type", F.lit("added"))
    assert apply_delta_to_distinct_view(spark, view, seed, ["topic"], "partition", 0)
    assert apply_delta_to_distinct_view(spark, view, delta, ["topic"], "partition", 1)

    got = {r.topic: r.n_distinct for r in distinct_counts(spark, view, ["topic"]).collect()}
    want = {
        r.topic: r.n
        for r in snap_b.groupBy("topic")
        .agg(F.countDistinct("partition").alias("n"))
        .collect()
    }
    assert got == want
    assert got["click"] == want["click"] < 4  # partition 2 really dropped

    # replay: same batch id, no change
    assert not apply_delta_to_distinct_view(spark, view, delta, ["topic"], "partition", 1)
    got2 = {r.topic: r.n_distinct for r in distinct_counts(spark, view, ["topic"]).collect()}
    assert got2 == want


def test_ivm_commit_is_crash_atomic_and_preserves_fraction(spark, tmp_path):
    """The replay record must be the SAME atomic event as the data
    commit: a half-written version directory (no _SUCCESS — a crash
    mid-write) must NOT count as applied, and retrying that batch must
    succeed; a committed batch id must be skipped. Fractional sums
    must keep their value domain instead of truncating to long
    (r5 ADVICE items 1 and 5)."""
    from pyspark.sql import functions as F

    from ureplicator_spark.streaming.ivm import apply_delta_to_view, read_view

    delta = spark.createDataFrame(
        [("a", "added", 0.0, 1.5), ("a", "added", 0.0, 2.25), ("b", "added", 0.0, 4.5)],
        "topic string, change_type string, old_v double, new_v double",
    )
    view = str(tmp_path / "view")

    # simulate a crashed batch-0 write: version dir exists, no _SUCCESS
    crashed = tmp_path / "view" / "v0"
    crashed.mkdir(parents=True)
    (crashed / "part-00000.parquet").write_bytes(b"half-written garbage")

    # the retry of batch 0 must apply (the crash left no commit record)
    assert apply_delta_to_view(spark, view, delta, ["topic"], "v", batch_id=0)
    got = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    assert got == {"a": (2, 3.75), "b": (1, 4.5)}  # double, not long

    # a replay of the now-committed batch 0 must be a no-op
    assert not apply_delta_to_view(spark, view, delta, ["topic"], "v", batch_id=0)
    got2 = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    assert got2 == got

    # a change delta adjusts by (new - old), still fractional
    upd = spark.createDataFrame(
        [("a", "changed", 1.5, 2.0), ("b", "removed", 4.5, 0.0)],
        "topic string, change_type string, old_v double, new_v double",
    )
    assert apply_delta_to_view(spark, view, upd, ["topic"], "v", batch_id=1)
    got3 = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    assert got3 == {"a": (2, 4.25)}


def test_ivm_manual_seed_does_not_shadow_streaming_batch_zero(spark, tmp_path):
    """An unmanaged manual apply (batch_id=-1) must advance only the
    version SEQUENCE, not the replay high-water mark: seeding a fresh
    view manually and then starting streaming maintenance must apply
    batch 0 instead of silently skipping it as a replay (r6 ADVICE,
    medium — the old scheme named the manual seed v0 and the version
    namespace doubled as the replay record)."""
    from ureplicator_spark.streaming.ivm import apply_delta_to_view, read_view

    view = str(tmp_path / "view")
    seed = spark.createDataFrame(
        [("a", "added", 0, 10)],
        "topic string, change_type string, old_v long, new_v long",
    )
    # unmanaged manual seed — no batch id
    assert apply_delta_to_view(spark, view, seed, ["topic"], "v")
    b0 = spark.createDataFrame(
        [("a", "added", 0, 5), ("b", "added", 0, 7)],
        "topic string, change_type string, old_v long, new_v long",
    )
    # the FIRST streaming batch must not be mistaken for a replay
    assert apply_delta_to_view(spark, view, b0, ["topic"], "v", batch_id=0)
    got = {r.topic: (r.n_records, r.total) for r in read_view(spark, view).collect()}
    assert got == {"a": (2, 15), "b": (1, 7)}
    # and a true replay of batch 0 is still skipped
    assert not apply_delta_to_view(spark, view, b0, ["topic"], "v", batch_id=0)
    # a later manual apply between streaming batches keeps the mark:
    # batch 0 stays a replay afterwards, batch 1 applies
    assert apply_delta_to_view(spark, view, seed, ["topic"], "v")
    assert not apply_delta_to_view(spark, view, b0, ["topic"], "v", batch_id=0)
    assert apply_delta_to_view(spark, view, b0, ["topic"], "v", batch_id=1)


def test_ivm_total_type_widens_only(spark, tmp_path):
    """A later all-integral delta must not downcast an accumulated
    double total to long (r6 ADVICE, low): the total's type is derived
    from the existing view, widening only."""
    from ureplicator_spark.streaming.ivm import apply_delta_to_view, read_view

    view = str(tmp_path / "view")
    frac = spark.createDataFrame(
        [("a", "added", 0.0, 1.5)],
        "topic string, change_type string, old_v double, new_v double",
    )
    assert apply_delta_to_view(spark, view, frac, ["topic"], "v", batch_id=0)
    ints = spark.createDataFrame(
        [("a", "added", 0, 2)],
        "topic string, change_type string, old_v long, new_v long",
    )
    assert apply_delta_to_view(spark, view, ints, ["topic"], "v", batch_id=1)
    [row] = read_view(spark, view).collect()
    assert row.total == 3.5  # fractional state preserved, not truncated


def test_missing_maintained_views_raise_descriptive_errors(spark, tmp_path):
    """Querying a never-committed maintained view must raise a clear
    FileNotFoundError naming the path, not AttributeError on None
    (r6 ADVICE, low)."""
    import pytest

    from ureplicator_spark.streaming.ivm import distinct_counts
    from ureplicator_spark.streaming.sketches import hll_estimates

    with pytest.raises(FileNotFoundError, match="reference-counted distinct"):
        distinct_counts(spark, str(tmp_path / "nope"), ["topic"])
    with pytest.raises(FileNotFoundError, match="HLL register"):
        hll_estimates(spark, str(tmp_path / "nope2"), "topic")


@pytest.mark.slow
def test_streaming_kmv_matches_batch_and_replay_is_noop(spark, sf_dir, tmp_path):
    """Streamed KMV maintenance must equal the one-shot batch synopsis
    (set-union idempotence: no replay guard needed), and re-merging an
    applied batch must change nothing."""
    from pyspark.sql import functions as F

    from ureplicator_spark.operators.sketch import kmv_registers
    from ureplicator_spark.sources.parquet import load_table
    from ureplicator_spark.streaming.ivm import read_view
    from ureplicator_spark.streaming.sketches import (
        kmv_estimates,
        merge_kmv_batch,
        streaming_kmv_maintenance,
    )

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("source", F.explode(F.split("text", " ")).alias("token"))

    feed_dir = str(tmp_path / "feed")
    for name, part in (
        ("a", docs.filter(F.col("doc_id") % 2 == 0)),
        ("b", docs.filter(F.col("doc_id") % 2 == 1)),
    ):
        part.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        ).coalesce(1).write.parquet(f"{feed_dir}/{name}")

    table = str(tmp_path / "kmv")
    stream = (
        spark.readStream.schema("source string, token string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    streaming_kmv_maintenance(
        stream, table, str(tmp_path / "ckpt"), "source", "token", k=16,
        available_now=True,
    ).awaitTermination(300)

    got = {
        (r.source, r.h) for r in read_view(spark, table).collect()
    }
    want = {
        (r.source, r.h)
        for r in kmv_registers(keyed, "source", "token", 16).collect()
    }
    assert got == want  # streamed synopsis == one-shot batch synopsis

    ests = {r[0]: r.est_distinct for r in kmv_estimates(spark, table, "source", 16).collect()}
    assert ests  # estimates readable

    # live pairwise overlap from the maintained table equals the batch
    # estimator over the one-shot synopsis (same function, same state)
    from ureplicator_spark.operators.sketch import kmv_pairwise_estimates
    from ureplicator_spark.streaming.sketches import kmv_pair_estimates

    live = {tuple(r) for r in kmv_pair_estimates(spark, table, "source", 16).collect()}
    batch = {
        tuple(r)
        for r in kmv_pairwise_estimates(
            kmv_registers(keyed, "source", "token", 16), "source", 16
        ).collect()
    }
    assert live == batch and live

    # replay: re-merging half_a changes nothing (union idempotence)
    half_a_keyed = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("source", F.explode(F.split("text", " ")).alias("token"))
    )
    merge_kmv_batch(spark, table, half_a_keyed, "source", "token", 16)
    again = {(r.source, r.h) for r in read_view(spark, table).collect()}
    assert again == want


@pytest.mark.slow
def test_streaming_hdr_matches_batch_and_replay_is_noop(spark, sf_dir, tmp_path):
    """Streamed HDR quantile-register maintenance must equal the
    one-shot batch build (SUM-merge is exact, not approximate), a
    replayed batch id must no-op (SUM is NOT idempotent — the managed
    high-water mark carries the guard), and the estimate fold must
    equal the batch quantile read."""
    from pyspark.sql import functions as F

    from ureplicator_spark import fixtures as FX
    from ureplicator_spark.operators.sketch import hdr_quantiles, hdr_registers
    from ureplicator_spark.streaming.ivm import read_view
    from ureplicator_spark.streaming.sketches import (
        hdr_quantile_estimates,
        merge_hdr_batch,
        streaming_hdr_maintenance,
    )

    rec = FX.records(spark, sf_dir).select("topic", "value_size")

    feed_dir = str(tmp_path / "feed")
    for name, part in (
        ("a", rec.filter(F.col("value_size") % 2 == 0)),
        ("b", rec.filter(F.col("value_size") % 2 == 1)),
    ):
        part.coalesce(1).write.parquet(f"{feed_dir}/{name}")

    table = str(tmp_path / "hdr")
    stream = (
        spark.readStream.schema("topic string, value_size int")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    streaming_hdr_maintenance(
        stream, table, str(tmp_path / "ckpt"), "value_size", ["topic"],
        available_now=True,
    ).awaitTermination(300)

    got = {
        (r.topic, r.bucket_key): r.cnt for r in read_view(spark, table).collect()
    }
    want = {
        (r.topic, r.bucket_key): r.cnt
        for r in hdr_registers(rec, "value_size", ["topic"]).collect()
    }
    assert got == want and got

    # replayed batch id (<= high-water mark): no-op
    merge_hdr_batch(
        spark, table, rec.limit(50), "value_size", ["topic"], batch_id=0
    )
    again = {
        (r.topic, r.bucket_key): r.cnt for r in read_view(spark, table).collect()
    }
    assert again == want

    # estimate fold == the batch quantile read
    got_q = {
        tuple(r)
        for r in hdr_quantile_estimates(spark, table, ["topic"]).collect()
    }
    want_q = {
        tuple(r)
        for r in hdr_quantiles(
            hdr_registers(rec, "value_size", ["topic"]), ["topic"]
        ).collect()
    }
    assert got_q == want_q and got_q
