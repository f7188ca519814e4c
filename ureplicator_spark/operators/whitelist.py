"""Topic set algebra for auto-whitelisting (AutoTopicWhitelistingManager).

Reference semantics (AutoTopicWhitelistingManager.java:160-203):
  * J3/U1 candidates must exist in BOTH clusters (``retainAll`` ∩)
  * U2 minus already-whitelisted, minus ZK blacklist (``removeAll``)
  * P7 minus topics matching the exclude regex
  * J4/U3 plus topics whose Helix partition count mismatches the source

All tiny-table ops; Catalyst turns intersect/except into hash
semi/anti joins and broadcasts every side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def whitelist_candidates(
    src_topics: DataFrame,
    dst_topics: DataFrame,
    current_whitelist: DataFrame,
    blacklist: DataFrame,
    exclude_regex: str,
) -> DataFrame:
    """(src ∩ dst) − current − blacklist − regex-excluded."""
    cand = src_topics.intersect(dst_topics)          # U1/J3
    cand = cand.exceptAll(current_whitelist)         # U2
    cand = cand.join(blacklist, "topic", "left_anti")  # U2 (blacklist)
    return cand.filter(~F.col("topic").rlike(exclude_regex))  # P7


def partition_count_mismatch(
    dst_counts: DataFrame, src_partition_count: int
) -> DataFrame:
    """J4: destination topics whose partition count ≠ the source's."""
    return dst_counts.filter(F.col("num_partitions") != src_partition_count).select(
        "topic", "num_partitions"
    )
