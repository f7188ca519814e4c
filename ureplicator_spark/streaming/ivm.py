"""Incremental view maintenance — keep a grouped COUNT/SUM aggregate
current from a CDC delta stream without ever re-reading the base table.

The classic IVM identity for distributive aggregates: a delta row
adjusts the view by (+1 row, +new value) when added, (-1 row, -old
value) when removed, and (new - old) when changed — so the maintained
table needs the before/after images ``snapshot_diff(...,
include_values=True)`` emits. Per micro-batch the work is
O(delta + |view|): one group-aggregate over the delta and one
full-outer merge against the (group-cardinality-sized) view — the
100 TB base table is never touched. This is the continuous form of the
controller's always-current workload tables (per-topic counts the
reference recomputes from metrics on every rebalance tick).

Effectively-once: foreachBatch is at-least-once, and a Δ-apply is NOT
idempotent, so the view carries the last applied batch id in a
sidecar; a replayed batch id is skipped (the same recorded-offset
discipline as ``streaming/curation.streaming_shard_feed``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _meta_path(view_path: str) -> str:
    return os.path.join(view_path + "_meta", "applied.json")


def _last_applied(view_path: str) -> int:
    try:
        with open(_meta_path(view_path)) as f:
            return json.load(f)["last_batch_id"]
    except (OSError, ValueError, KeyError):
        return -1


def _record_applied(view_path: str, batch_id: int) -> None:
    path = _meta_path(view_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # write-then-rename so a crash mid-write can't leave a truncated
    # marker (same discipline as streaming_shard_feed's state file)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    os.replace(tmp, path)


def apply_delta_to_view(
    spark: SparkSession,
    view_path: str,
    delta: DataFrame,
    group_cols: list[str],
    sum_col: str,
    batch_id: int = -1,
) -> bool:
    """Fold one CDC delta batch (rows: group_cols + change_type +
    ``old_<sum_col>``/``new_<sum_col>`` images) into the maintained
    ``(group_cols..., n_records, total)`` view. Returns False when the
    batch id was already applied (replay skip). Groups whose count
    reaches zero are dropped from the view."""
    if batch_id >= 0 and batch_id <= _last_applied(view_path):
        return False

    d_count = (
        F.when(F.col("change_type") == "added", F.lit(1))
        .when(F.col("change_type") == "removed", F.lit(-1))
        .otherwise(F.lit(0))
    )
    d_sum = (
        F.when(F.col("change_type") == "added", F.col(f"new_{sum_col}"))
        .when(F.col("change_type") == "removed", -F.col(f"old_{sum_col}"))
        .otherwise(F.col(f"new_{sum_col}") - F.col(f"old_{sum_col}"))
    )
    adj = delta.groupBy(*group_cols).agg(
        F.sum(d_count).alias("_dn"), F.sum(d_sum).alias("_ds")
    )

    if os.path.exists(view_path):
        cur = spark.read.parquet(view_path)
    else:
        cur = (
            adj.select(*group_cols)
            .limit(0)
            .withColumn("n_records", F.lit(0).cast("long"))
            .withColumn("total", F.lit(0).cast("long"))
        )
    merged = (
        cur.join(adj, group_cols, "full_outer")
        .select(
            *group_cols,
            (F.coalesce("n_records", F.lit(0)) + F.coalesce("_dn", F.lit(0)))
            .cast("long")
            .alias("n_records"),
            (F.coalesce("total", F.lit(0)) + F.coalesce("_ds", F.lit(0)))
            .cast("long")
            .alias("total"),
        )
        .filter(F.col("n_records") > 0)
        # the overwrite below replaces the directory the plan reads —
        # same eager-materialize-first discipline as compact_archive
        .localCheckpoint()
    )
    merged.write.mode("overwrite").parquet(view_path)
    merged.unpersist()
    if batch_id >= 0:
        _record_applied(view_path, batch_id)
    return True


def streaming_view_maintenance(
    delta_stream: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    group_cols: list[str],
    sum_col: str,
    available_now: bool = False,
):
    """Continuously maintain the grouped aggregate view from a CDC
    delta stream. foreachBatch by design: the merge reads and rewrites
    the same view table, and replay protection needs the batch id."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.head(1):
                apply_delta_to_view(
                    batch_df.sparkSession,
                    view_path,
                    batch_df,
                    group_cols,
                    sum_col,
                    batch_id,
                )
        finally:
            batch_df.unpersist()

    writer = delta_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_delta_to_distinct_view(
    spark: SparkSession,
    view_path: str,
    delta: DataFrame,
    group_cols: list[str],
    key_col: str,
    batch_id: int = -1,
) -> bool:
    """Exact incremental COUNT(DISTINCT key) per group, with DELETION
    support, from a CDC delta — the point on the distinct-count
    spectrum the sketches cannot reach: HLL registers are monotone
    (union-only; a removed key can never leave the sketch), while a
    reference-counted view retracts exactly. The price is the state
    the sketch exists to avoid: O(distinct (group, key)) rows.

    View: ``(group_cols..., key, refcount)``. An ``added`` delta row
    contributes +1 to its (group, key), ``removed`` -1, ``changed``
    0 (the key is part of row identity; a change re-keys via
    delete+insert). A key leaves the distinct set only when its
    refcount reaches zero — removing one of several referencing rows
    correctly keeps it. Same batch-id replay sidecar as
    :func:`apply_delta_to_view` (sum deltas are not idempotent).

    Scale shape per batch: one group-aggregate over the delta + one
    full-outer merge on (group, key) against the view — O(delta +
    view); the base table is never re-read. ``distinct_counts`` folds
    the view to per-group counts (group-cardinality sized)."""
    if batch_id >= 0 and batch_id <= _last_applied(view_path):
        return False

    d = (
        F.when(F.col("change_type") == "added", F.lit(1))
        .when(F.col("change_type") == "removed", F.lit(-1))
        .otherwise(F.lit(0))
    )
    adj = delta.groupBy(*group_cols, key_col).agg(F.sum(d).alias("_d"))

    merge_keys = [*group_cols, key_col]
    if os.path.exists(view_path):
        cur = spark.read.parquet(view_path)
    else:
        cur = adj.select(*merge_keys).limit(0).withColumn(
            "refcount", F.lit(0).cast("long")
        )
    merged = (
        cur.join(adj, merge_keys, "full_outer")
        .select(
            *merge_keys,
            (F.coalesce("refcount", F.lit(0)) + F.coalesce("_d", F.lit(0)))
            .cast("long")
            .alias("refcount"),
        )
        .filter(F.col("refcount") > 0)
        .localCheckpoint()
    )
    merged.write.mode("overwrite").parquet(view_path)
    merged.unpersist()
    if batch_id >= 0:
        _record_applied(view_path, batch_id)
    return True


def distinct_counts(
    spark: SparkSession, view_path: str, group_cols: list[str]
) -> DataFrame:
    """Per-group exact distinct counts from the maintained
    reference-counted view."""
    return (
        spark.read.parquet(view_path)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_distinct"))
        .orderBy(*group_cols)
    )
