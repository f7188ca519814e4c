"""Range (interval-containment) join — point-in-range lookup.

The reference's partial-replication routes are exactly this shape: a
record belongs to a route iff its offset falls in the route's
per-partition ``[startingOffset, endingOffset)`` bound
(uReplicator-Worker/.../WorkerInstance.java:189-206;
PartitionOffsetInfo.java:29-78). Generalized to any
(key-equal, start <= point < end) join.

Scale design: the range table is control-plane-sized (O(#partitions ×
#routes)), so the join BROADCASTS it and the probe side never
shuffles — Catalyst turns the compound predicate into a
BroadcastHashJoin on the equality keys with the range bounds as a
post-join filter. For a large, non-broadcastable range table the
standard bucketing trick applies (explode ranges into fixed-width
buckets, equi-join on (key, bucket), re-filter) — not needed for any
reference-shaped workload, so not implemented speculatively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    on: Sequence[str],
    point: str,
    start: str,
    end: str,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the range row(s) with equal ``on`` keys and
    ``start <= left[point] < end``. Ranges broadcast; duplicate key
    columns are dropped from the range side.
    """
    cond = F.lit(True)
    for k in on:
        cond = cond & (left[k] == ranges[k])
    cond = cond & (left[point] >= ranges[start]) & (left[point] < ranges[end])
    out = left.join(F.broadcast(ranges), cond, how)
    for k in on:
        out = out.drop(ranges[k])
    return out
