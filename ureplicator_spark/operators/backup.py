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


def backup_versioned(df: DataFrame, base_dir: str, name: str, version: str | None = None) -> str:
    """GitBackUpHandler analog (controller/core/GitBackUpHandler.java:1,
    ClusterInfoBackupManager.java:88-134): where FileBackUpHandler
    overwrites one snapshot per id, the git handler keeps every commit
    as history. Here each call appends an immutable
    ``<base>/<name>/version=<utc-timestamp>/`` directory; versions sort
    lexicographically = chronologically, restore defaults to HEAD, and
    ``prune_versions`` is the shallow-clone analog."""
    import time

    if version is None:
        version = time.strftime("%Y%m%dT%H%M%S", time.gmtime()) + f"-{int(time.time() * 1e6) % 1_000_000:06d}"
    path = os.path.join(base_dir, name, f"version={version}")
    df.coalesce(1).write.mode("errorifexists").json(path)
    return version


def list_versions(base_dir: str, name: str) -> list[str]:
    root = os.path.join(base_dir, name)
    if not os.path.isdir(root):
        return []
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(root) if d.startswith("version=")
    )


def restore_version(
    spark: SparkSession, base_dir: str, name: str, version: str | None = None
) -> DataFrame:
    """Read one backup version; ``version=None`` → latest (git HEAD)."""
    versions = list_versions(base_dir, name)
    if not versions:
        raise FileNotFoundError(f"no versions under {base_dir}/{name}")
    if version is None:
        version = versions[-1]
    return spark.read.json(os.path.join(base_dir, name, f"version={version}"))


def prune_versions(base_dir: str, name: str, keep: int) -> list[str]:
    """Drop all but the newest ``keep`` versions; returns those removed."""
    import shutil

    versions = list_versions(base_dir, name)
    doomed = versions[:-keep] if keep > 0 else versions
    for v in doomed:
        shutil.rmtree(os.path.join(base_dir, name, f"version={v}"), ignore_errors=True)
    return doomed
