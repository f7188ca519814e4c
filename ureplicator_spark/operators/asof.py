"""As-of (most-recent-at-or-before) join — a temporal lookup Spark has
no built-in operator for.

The reference does this implicitly: WorkloadInfoRetriever serves "the
freshest workload sample at or before now" per topic
(uReplicator-Common/.../WorkloadInfoRetriever.java:145-168), and
`calculateLagTime` pairs a lag observation with that sample
(controller/core/HelixMirrorMakerManager.java:398-420). Generalized
here as a first-class operator.

Scale design: NOT a theta join (`l.ts >= r.ts` alone would be an
O(n·m) broadcast-nested-loop). Instead the classic union-and-carry
formulation: tag both sides, union, sort per key by (ts, side), and
carry the last seen right-side value forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key, one per-key sort — the same cost profile as a
groupBy, no cross product, survives 100 TB given sane key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (left-outer semantics: unmatched left rows keep NULLs).

    ``tolerance``: optional max staleness — matches older than
    ``left_ts - tolerance`` are nulled out (WorkloadInfoRetriever's
    freshness cutoff, :209-237).
    """
    on = list(on)
    value_cols = list(value_cols)

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).cast("long").alias("_asof_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("_r_ts"),
    )
    left_only = [c for c in left.columns if c not in on]
    rhs = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.col(right_ts).cast("long").alias("_asof_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).cast("long").alias("_r_ts"),
    ).select(*lhs.columns)  # align column order for union

    # right rows sort before left rows at equal ts, so ties match (>=)
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
        F.col("_asof_ts"),
    )
    out = carried.filter(F.col("_side") == 1)

    fresh: Column = F.lit(True)
    if tolerance is not None:
        fresh = F.col("_m_ts") >= F.col("_asof_ts") - F.lit(tolerance)
    return out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(fresh, F.col(f"_m_{c}")).otherwise(F.lit(None)).alias(c)
            for c in value_cols
        ],
    )
