"""Skew-mitigation: salted two-phase aggregation.

AQE (`spark.sql.adaptive.skewJoin`, enabled in session.tune) already
splits skewed SHUFFLE partitions at runtime — that is the default
answer. Manual salting still matters in two places AQE can't reach:
streaming aggregations (AQE is disabled for stateful queries) and
single-hot-key aggregations where even a split partition funnels into
one reducer for the final combine. The reference's analog problem is
one hot topic dominating a worker's workload (the reason for its
workload-aware bin-packing, AutoRebalanceLiveInstanceChangeListener
.java:594-630); here the hot key is spread over ``n_salt`` reducers
first, then merged.

Only algebraic aggregates (sum/count/min/max) decompose this way;
they cover the engine's control-plane metrics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase groupBy: partial agg on (keys + salt), merge on keys.

    ``aggs``: output_name -> (fn, column) with fn in sum|count|min|max.
    Results are identical to the direct groupBy (all four are
    associative+commutative); the hot key's partial work fans out over
    ``n_salt`` reducers.
    """
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, c) in aggs.items()]
    )
