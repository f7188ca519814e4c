"""Assignment / validation analytics (ValidationManager,
TopicAssignmentViewBuilder, the rebalancer's ranking logic).

Reference semantics:
  * A9 validation counts by Helix state ONLINE/OFFLINE/ERROR, per
    instance and total (ValidationManager.java:155-230)
  * A10 assignment view: topic → {server → partitions, counts}
    (TopicAssignmentViewBuilder.java:34-82)
  * J5 IdealState ⋈ ExternalView mismatch (ValidationManager.java:167-204)
  * O1 partitions sorted by workload desc
    (AutoRebalanceLiveInstanceChangeListener.java:599-603)
  * O2 least-loaded instance ranking (InstanceTopicPartitionHolder.java:134-173)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_assignments(records: DataFrame, n_instances: int) -> DataFrame:
    """Deterministic assignment table from the record log: one row per
    (topic, partition) with instance and Helix-like state.

    The state rule is an arbitrary-but-fixed function so validation
    queries have ERROR/OFFLINE rows to count (driver fixtures carry no
    Helix metadata).
    """
    tp = records.select("topic", "partition").distinct()
    keyed = tp.withColumn("k", F.col("partition") + F.length("topic"))
    return keyed.select(
        "topic",
        "partition",
        F.concat(F.lit("worker-"), (F.col("k") % n_instances).cast("string")).alias("instance"),
        F.when(F.col("k") % 5 == 0, "ERROR")
        .when(F.col("k") % 5 == 1, "OFFLINE")
        .otherwise("ONLINE")
        .alias("state"),
    )


def validation_counts(assignments: DataFrame) -> DataFrame:
    """A9 (total): partition count per state."""
    return assignments.groupBy("state").agg(F.count("*").alias("n_partitions"))


def validation_by_instance(assignments: DataFrame) -> DataFrame:
    """A9 (per instance): state counts per worker instance."""
    return assignments.groupBy("instance", "state").agg(F.count("*").alias("n_partitions"))


def assignment_view(assignments: DataFrame) -> DataFrame:
    """A10: per instance — partition count + canonical sorted list.

    collect_list order is nondeterministic under parallel aggregation,
    so the list is sort_array'd before joining to a canonical string —
    same trick any engine needs for a deterministic grouped list.
    """
    return assignments.groupBy("instance").agg(
        F.count("*").alias("n_partitions"),
        F.array_join(
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", F.col("topic"), F.col("partition").cast("string"))
                )
            ),
            ",",
        ).alias("serving"),
    )


def ideal_vs_actual(assignments: DataFrame) -> DataFrame:
    """J5: desired (IdealState) vs observed (ExternalView) assignment.

    The derived external view omits ERROR rows (a worker that failed to
    come ONLINE reports nothing), so mismatches are exactly the ERROR
    set — shape-faithful to ValidationManager's full comparison.
    """
    ideal = assignments.select("topic", "partition", "instance")
    actual = assignments.filter(F.col("state") != "ERROR").select(
        "topic", "partition", F.col("instance").alias("actual_instance")
    )
    j = ideal.join(actual, ["topic", "partition"], "full_outer")
    return j.select(
        "topic",
        "partition",
        F.when(F.col("instance").isNull(), "missing-in-ideal")
        .when(F.col("actual_instance").isNull(), "missing-in-external-view")
        .when(F.col("instance") != F.col("actual_instance"), "instance-mismatch")
        .otherwise("match")
        .alias("status"),
    ).filter(F.col("status") != "match")


def top_partitions_by_workload(partition_wl: DataFrame, k: int) -> DataFrame:
    """O1/O3: heaviest-first ranking with a total (deterministic) order."""
    w = Window.orderBy(
        F.col("total_bytes").desc(), F.col("topic"), F.col("partition")
    )
    return (
        partition_wl.select("topic", "partition", "total_bytes")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def least_loaded_ranking(instance_loads: DataFrame) -> DataFrame:
    """O2: the greedy assigner's instance preference order (lightest
    first; ties by partition count then name — TreeSet comparator in
    InstanceTopicPartitionHolder.getTotalWorkloadComparator)."""
    w = Window.orderBy(
        F.col("total_bytes").asc(), F.col("n_partitions").asc(), F.col("instance")
    )
    return instance_loads.select(
        "instance", "total_bytes", "n_partitions"
    ).withColumn("pick_order", F.row_number().over(w))


def greedy_assign(partition_wl: DataFrame, n_instances: int) -> DataFrame:
    """Workload-aware greedy bin-packing: partitions sorted
    heaviest-first, each assigned to the currently least-loaded
    instance (ties → lower instance id) — the reference's auto-balance
    core (AutoRebalanceLiveInstanceChangeListener.java:594-630;
    priority queue in InstanceTopicPartitionHolder.java:134-173; O1
    ordering via TopicPartition.getWorkloadComparator).

    The input is the per-partition workload table — O(#partitions)
    rows, control-plane-sized — so the greedy loop runs DRIVER-side
    over a collected list, exactly like the reference's controller.
    The big-data work (computing the workloads) stays distributed;
    the O(P log I) decision does not need a cluster. Returns a
    DataFrame so downstream validation/backup treat it as data.
    """
    import heapq

    rows = partition_wl.select("topic", "partition", "bytes_per_sec").collect()
    rows.sort(key=lambda r: (-r.bytes_per_sec, r.topic, r.partition))
    heap = [(0.0, i) for i in range(n_instances)]  # (load, instance)
    heapq.heapify(heap)
    out = []
    for r in rows:
        load, inst = heapq.heappop(heap)
        out.append((r.topic, int(r.partition), f"instance-{inst}", float(r.bytes_per_sec)))
        heapq.heappush(heap, (load + float(r.bytes_per_sec), inst))
    spark = partition_wl.sparkSession
    from ureplicator_spark.functions import values_df

    return values_df(
        spark,
        out or [("", -1, "", 0.0)],
        "topic string, partition int, instance string, bytes_per_sec double",
    )


def lag_weighted_instance_view(
    assignments: DataFrame,
    lag_time_df: DataFrame,
    n_instances: int,
    dedicated_ratio: float = 0.5,
) -> DataFrame:
    """Lag-weighted rebalancer analytics: the observable half of the
    reference's dedicated-lagging-instance pass
    (AutoRebalanceLiveInstanceChangeListener.java:482-592) — per
    instance, how much of its serving set is lagging, its
    lag-adjusted workload weight, and whether it would be picked as a
    dedicated instance for lagging partitions.

    Reference semantics re-expressed:
    - a partition is lagging when its lag > 0 (lagTimeMap membership);
    - adjusted weight = 1.0 + min(120, lag_time_minutes) per lagging
      partition, 1.0 otherwise ("1.0 more weight for each minute lag
      up to 2 hour", :571-578);
    - dedicated candidates = up to floor(n_instances * ratio)
      instances that serve >= 1 lagging partition, picked in
      lagging-share order (:530-561; the TreeSet iteration is made
      deterministic here by ranking on share desc, then instance).

    Everything is control-plane-sized: lag table broadcast into the
    assignment join, one per-instance aggregation, one ranking window
    over the instance table."""
    lag = lag_time_df.select(
        "topic", "partition", "lag",
        F.floor(F.col("lag_time_sec") / 60).alias("lag_min"),
    )
    per_part = (
        assignments.join(F.broadcast(lag), ["topic", "partition"], "left")
        .select(
            "instance",
            (F.coalesce(F.col("lag"), F.lit(0)) > 0).cast("int").alias("is_lagging"),
            F.when(
                F.coalesce(F.col("lag"), F.lit(0)) > 0,
                1.0 + F.least(F.lit(120), F.col("lag_min")),
            )
            .otherwise(F.lit(1.0))
            .alias("weight"),
        )
    )
    inst = per_part.groupBy("instance").agg(
        F.count("*").alias("n_partitions"),
        F.sum("is_lagging").cast("long").alias("n_lagging"),
        F.round(F.sum("weight"), 6).alias("adjusted_weight"),
    )
    max_dedicated = int(n_instances * dedicated_ratio)
    w = Window.orderBy(
        (F.col("n_lagging") / F.col("n_partitions")).desc(), F.col("instance")
    )
    return (
        inst.withColumn("rk", F.row_number().over(w))
        .select(
            "instance",
            "n_partitions",
            "n_lagging",
            "adjusted_weight",
            ((F.col("n_lagging") > 0) & (F.col("rk") <= max_dedicated)).alias(
                "is_dedicated_candidate"
            ),
        )
        .orderBy("instance")
    )
