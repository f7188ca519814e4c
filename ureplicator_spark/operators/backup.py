"""Cluster state backup (S12) — the ClusterInfoBackupManager analog.

Reference dumps IdealState + partition assignment JSON to file/git
daily (controller/core/ClusterInfoBackupManager.java:88-134,
FileBackUpHandler.java:37-60). Here: any control-plane DataFrame
snapshots to a timestamped JSON directory; restore reads it back.
Partitioned single-file-per-snapshot keeps the backup cheap at any
cluster size (these tables are O(#partitions), not O(#records)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def backup_state(df: DataFrame, base_dir: str, name: str, snapshot_id: str) -> str:
    """Write a JSON snapshot: ``<base>/<name>/snapshot=<id>/``."""
    path = os.path.join(base_dir, name, f"snapshot={snapshot_id}")
    df.coalesce(1).write.mode("overwrite").json(path)
    return path


def restore_state(spark: SparkSession, base_dir: str, name: str, snapshot_id: str) -> DataFrame:
    return spark.read.json(os.path.join(base_dir, name, f"snapshot={snapshot_id}"))


def list_snapshots(spark: SparkSession, base_dir: str, name: str) -> list[str]:
    root = os.path.join(base_dir, name)
    if not os.path.isdir(root):
        return []
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(root) if d.startswith("snapshot=")
    )
