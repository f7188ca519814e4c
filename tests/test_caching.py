"""Scoped cache-pin registry (caching.py): ownership-based release.

The contract under test (r6 verdict #5 + advisor thread-safety item):
a pin_scope releases exactly the frames pinned on ITS thread inside
ITS block — never caches pinned by an outer scope, another thread, or
a plain persist() outside the registry.
"""

from __future__ import annotations

import threading

from ureplicator_spark.caching import pin, pin_scope


def _pinned_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pin_scope_releases_own_pins_only(spark):
    baseline = _pinned_count(spark)
    outside = spark.range(10).persist()
    outside.count()
    with pin_scope():
        inner = pin(spark.range(20))
        inner.count()
        assert _pinned_count(spark) == baseline + 2
    # scope released its own pin; the unmanaged persist is untouched
    assert _pinned_count(spark) == baseline + 1
    outside.unpersist(True)
    assert _pinned_count(spark) == baseline


def test_pin_scopes_nest(spark):
    baseline = _pinned_count(spark)
    with pin_scope():
        outer = pin(spark.range(30))
        outer.count()
        with pin_scope():
            inner = pin(spark.range(40))
            inner.count()
            assert _pinned_count(spark) == baseline + 2
        # inner scope released only its own pin
        assert _pinned_count(spark) == baseline + 1
    assert _pinned_count(spark) == baseline


def test_pin_scope_is_thread_local(spark):
    """One thread's scope exit must not unpersist frames pinned by a
    concurrently active scope on another thread — the failure mode of
    the old global getPersistentRDDs() diff."""
    baseline = _pinned_count(spark)
    other_pinned = threading.Event()
    release_other = threading.Event()

    def other_thread():
        with pin_scope():
            df = pin(spark.range(50))
            df.count()
            other_pinned.set()
            release_other.wait(timeout=30)

    t = threading.Thread(target=other_thread)
    t.start()
    assert other_pinned.wait(timeout=30)
    with pin_scope():
        mine = pin(spark.range(60))
        mine.count()
    # my scope exit released my pin; the other thread's is still live
    assert _pinned_count(spark) == baseline + 1
    release_other.set()
    t.join(timeout=30)
    assert _pinned_count(spark) == baseline


def test_pin_without_scope_degrades_to_plain_persist(spark):
    baseline = _pinned_count(spark)
    df = pin(spark.range(70))
    df.count()
    assert _pinned_count(spark) == baseline + 1
    df.unpersist(True)
    assert _pinned_count(spark) == baseline


def test_release_checkpoint_frees_blocks(spark):
    from ureplicator_spark.caching import release_checkpoint

    baseline = _pinned_count(spark)
    df = spark.range(80).selectExpr("id", "id * 2 AS y").localCheckpoint()
    assert _pinned_count(spark) == baseline + 1
    # DataFrame.unpersist is the documented no-op for checkpoints
    df.unpersist(True)
    assert _pinned_count(spark) == baseline + 1
    release_checkpoint(df, blocking=True)
    assert _pinned_count(spark) == baseline
    # releasing a plain (non-checkpoint) frame is a harmless no-op
    release_checkpoint(spark.range(5))


def test_adopt_checkpoint_released_on_scope_exit(spark):
    from ureplicator_spark.caching import adopt_checkpoint

    baseline = _pinned_count(spark)
    with pin_scope(blocking=True):
        df = adopt_checkpoint(spark.range(90).localCheckpoint())
        assert df.count() == 90
        assert _pinned_count(spark) == baseline + 1
    assert _pinned_count(spark) == baseline


def test_iterative_operators_leave_no_pinned_rdds(spark, sf_dir):
    """The bench no-leak contract at operator grain: the CC label-prop
    loop and the BPE merge loop release every per-round localCheckpoint
    (regression: each leaked round pinned one RDD for the session —
    bench_detail 2026-08-15 read 26 after-pass pins)."""
    from pyspark.sql import functions as F

    from ureplicator_spark.operators.bpe import learn_bpe_merges
    from ureplicator_spark.operators.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    baseline = _pinned_count(spark)
    with pin_scope(blocking=True):
        pairs = lsh_candidate_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
        duplicate_clusters(pairs).count()
    assert _pinned_count(spark) == baseline
    with pin_scope(blocking=True):
        assert learn_bpe_merges(docs, num_merges=4).count() > 0
    assert _pinned_count(spark) == baseline
