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
