"""Clustered data layout — min/max-stat skipping via sorted writes.

The engine's third layout tool, completing the family:

* ``archive.py`` partitions by low-cardinality columns → DIRECTORY
  pruning (reads touch only matching ``topic=/dt=`` paths);
* ``bucketed.py`` hash-buckets by join key → shuffle-free co-located
  joins;
* this module CLUSTERS rows so parquet footer statistics (per-file /
  per-row-group min/max) become tight, and selective scans skip whole
  files: Spark's parquet reader drops any row group whose [min, max]
  cannot satisfy a pushed predicate. Partition directories cannot hold
  high-cardinality keys (small-file explosion); clustering is how a
  high-cardinality column gets pruning.

Two clusterings:

* ``range_cluster_write`` — 1-D: ``repartitionByRange`` + sort on one
  key. Perfect spans on that key (disjoint file ranges, so a point or
  range predicate touches the minimal file set); other columns get no
  help.
* ``zorder_write`` — multi-D: sort by the Morton (Z-order) interleave
  of 2-4 columns' bits, the technique behind Delta/Iceberg ``OPTIMIZE
  ZORDER BY``. Each file then covers a small hyper-rectangle of the
  key space, so point/range predicates on ANY of the clustered columns
  skip ~(1 - n_files^(-(k-1)/k)) of the files instead of none —
  the right trade when several columns are query-selective.

Scale shape: one pass over the data either way — a range exchange plus
in-partition sort (the same cost profile as any big sort, spillable,
no driver involvement). The z-key is pure Catalyst bit math (codegen,
no UDF); the min/max normalization constants come from a 1-row
aggregate broadcast into the projection. At 100 TB this is the
standard nightly OPTIMIZE pass over yesterday's partition, not a
whole-corpus rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "__zorder_key"


def range_cluster_write(
    df: DataFrame, path: str, col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Write ``df`` as ``n_files`` parquet files with DISJOINT sorted
    ranges of ``col`` — footer min/max spans partition the key space,
    so a point predicate on ``col`` touches exactly one file and a
    range predicate touches only overlapping files."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """Morton interleave of ``cols`` (2-4 numeric columns) as a single
    long sort key.

    Each column is min/max-normalized to ``bits`` unsigned bits (the
    1-row min/max aggregate is computed once and folded into the
    expression as literals — no join in the write plan), then bit b of
    column i lands at interleaved position ``b*len(cols)+i``. Rows
    close in z-key are close in EVERY clustered dimension, which is
    what makes per-file stats tight on all of them."""
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key clusters 2-4 columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit a signed long")
    # one tiny job: min/max per column → literals in the z expression
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        if row[f"mn_{c}"] is None:
            raise ValueError(
                f"cannot z-order on {c!r}: column is empty or all NULL "
                "(no min/max to normalize against)"
            )
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = float(row[f"mn_{c}"]), float(row[f"mx_{c}"])
        span = mx - mn if mx > mn else 1.0
        scaled = F.least(
            F.lit(top).cast("long"),
            ((F.col(c).cast("double") - mn) / span * top).cast("long"),
        )
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``: each of
    the ``n_files`` output files covers one contiguous z-range = one
    small hyper-rectangle of the clustered key space. An empty input
    (the nightly OPTIMIZE pass on a day with no data) writes the empty
    output directly instead of failing key construction."""
    if df.isEmpty():
        df.write.mode(mode).parquet(path)
        return
    (
        df.withColumn(_ZKEY, zorder_key(df, cols, bits))
        .repartitionByRange(n_files, F.col(_ZKEY))
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode(mode)
        .parquet(path)
    )
