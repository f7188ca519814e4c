"""Generic right-to-be-forgotten rewrites for standing index sections.

Every standing index in this engine persists per-item rows derived
from user content (raw vectors, PQ codes, chunk hashes, perceptual
fingerprints, shingle signatures) — an RTBF request must remove them
wherever they live, not just from the source corpus. The two shapes:

* partitioned section → :func:`rewrite_partitioned_without`:
  dynamic-overwrite ONLY the partitions that actually hold the doomed
  ids (the lexical-index delete discipline), removing dirs emptied
  entirely. Idempotent — once the rows are gone the affected-partition
  set is empty and a re-run no-ops, which is what makes the delete
  crash-repairable with no intent machinery when the section carries
  no derived stats.
* plain (unpartitioned) section → :func:`rewrite_plain_without`:
  filtered full-section rewrite via localCheckpoint (sections using
  this shape are bytes-per-item small by design — fingerprints,
  signatures).

Aggregated sketch sections (KMV registers, HLL registers, CMS
counters) are NOT decrementable — a member's contribution cannot be
subtracted from a min-hash register set. RTBF on those means rebuild
from the surviving corpus; deletes that encounter them must say so
rather than silently leave them stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.caching import release_checkpoint
from ureplicator_spark.fsutil import delete_recursive, fs_exists


def rewrite_partitioned_without(
    spark: SparkSession,
    path: str,
    part_col: str,
    id_col: str,
    ids: list[int],
) -> tuple[int, int]:
    """Remove every row with ``id_col`` in ``ids`` from the
    ``part_col``-partitioned parquet at ``path``: dynamic-overwrite
    only the partitions that held doomed rows, drop dirs emptied
    entirely. Returns (partitions_rewritten, removed_dirs)."""
    data = spark.read.parquet(path)
    doomed = data.filter(F.col(id_col).isin(ids))
    parts = sorted(r[0] for r in doomed.select(part_col).distinct().collect())
    if not parts:
        return 0, 0
    survivors = (
        data.filter(F.col(part_col).isin(parts))
        .filter(~F.col(id_col).isin(ids))
        .localCheckpoint()
    )
    kept = {r[0] for r in survivors.select(part_col).distinct().collect()}
    old_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy(part_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    release_checkpoint(survivors)

    emptied = [p for p in parts if p not in kept]
    for p in emptied:
        delete_recursive(spark, f"{path}/{part_col}={p}")
    return len(parts), len(emptied)


def rewrite_plain_without(
    spark: SparkSession,
    path: str,
    id_col: str,
    ids: list[int],
) -> int:
    """Filtered full rewrite of an UNPARTITIONED parquet section.
    localCheckpoint first — the survivors must be materialized off the
    files about to be overwritten. Returns rows removed. No-ops (and
    returns 0) when the section is absent or holds none of ``ids``."""
    if not fs_exists(spark, path):
        return 0
    data = spark.read.parquet(path)
    n_doomed = data.filter(F.col(id_col).isin(ids)).count()
    if n_doomed == 0:
        return 0
    survivors = data.filter(~F.col(id_col).isin(ids)).localCheckpoint()
    survivors.write.mode("overwrite").parquet(path)
    release_checkpoint(survivors)
    return n_doomed
