"""SparkSession construction and runtime tuning.

Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), adaptive broadcast selection, parquet filter pushdown and
column pruning left to Catalyst. On a real cluster the same code runs
unchanged; only ``master`` / executor sizing differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point applies, so the engine
# behaves identically whether the session was built by us or handed to
# us (e.g. the verification driver builds its own).
_RUNTIME_CONFS = {
    # /root/testdata events.parquet stores TIMESTAMP(NANOS) which Spark
    # cannot represent natively; read as long (nanoseconds since epoch).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock math in queries (matches DuckDB's UTC).
    "spark.sql.session.timeZone": "UTC",
    # Runtime adaptivity: coalesce post-shuffle partitions, split skewed
    # joins — essential at 100 TB where static planning is wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


# Strong refs on purpose: pinning the handful of sessions a process
# creates is cheaper than risking an id() alias after GC (a new session
# reusing a dead one's id would silently skip tuning).
_TUNED: list[SparkSession] = []


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Skips sessions already tuned this process: each conf.set is a Py4J
    round-trip and tune() sits on every table-load path."""
    if any(s is spark for s in _TUNED):
        return spark
    _TUNED.append(spark)
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    try:
        # Spark's 200-partition default is wrong for local sessions and
        # can't be AQE-coalesced in stateful streaming stages (state
        # store partitioning is fixed at first checkpoint). Replace the
        # untouched default only — an explicit user setting wins.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cpus = os.environ.get("SPARK_GRAFT_CPUS")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                cpus if cpus and cpus.isdigit() else "32",
            )
    except Exception:  # pragma: no cover
        pass
    return spark


def get_spark(
    app_name: str = "ureplicator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    ``local[$SPARK_GRAFT_CPUS]`` for tests/bench; on a cluster the
    master comes from spark-submit and this builder only sets SQL confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # local[...] puts every executor thread in the driver JVM: an
        # 8g heap showed multi-second GC stalls landing on random bench
        # queries (45-66s totals); 24g holds totals at ~32s on the same
        # workload. Cluster deployments size executors via spark-submit
        # and this default is inert there.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Arrow for the few pandas-UDF paths (multimodal decode).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # STATIC conf (must be set before the JVM's first codegen; a
        # runtime set raises CANNOT_MODIFY_STATIC_CONFIG): the
        # generated-class cache defaults to 100 entries, so a
        # ~250-query session evicts every query's codegen between
        # visits and each revisit recompiles all its stages — the r9
        # "in-bench 1.3-1.5× session drift". Measured: interleaving 40
        # other queries between table_profile_approx reps costs
        # [8.8, 4.0, 3.3] s at the default vs [2.8, 2.8, 2.9] s at
        # 5000. A long-lived multi-tenant cluster wants the same
        # headroom; a few thousand compiled stages is tens of MB of
        # class metadata.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
