"""Physical-plan inspection and assertions.

The scale contract of every operator is encoded as checkable plan
properties (tests/test_plans.py):
  * filters/projection reach the parquet scan (PushedFilters, ReadSchema)
  * small sides broadcast (BroadcastHashJoin, no all-pairs shuffles)
  * shuffle counts stay at the operator's theoretical minimum

Catalyst owns the strategy; these helpers make regressions (a lost
pushdown, an accidental cartesian, an extra Exchange) fail CI instead
of surfacing as a 10× slowdown at 100 TB.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_shuffles(df: DataFrame) -> int:
    """Data-moving exchanges (broadcast exchanges excluded)."""
    plan = plan_string(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def count_broadcast_joins(df: DataFrame) -> int:
    return plan_string(df).count("BroadcastHashJoin")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    n = count_broadcast_joins(df)
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, plan has {n}:\n{plan_string(df)}"


def assert_max_shuffles(df: DataFrame, limit: int) -> None:
    n = count_shuffles(df)
    assert n <= limit, f"expected ≤{limit} shuffles, plan has {n}:\n{plan_string(df)}"


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside some PushedFilters: [...] list."""
    plan = plan_string(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; PushedFilters={pushed}"


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clauses — verify column pruning reached the scan."""
    return re.findall(r"ReadSchema: struct<[^>]*>", plan_string(df))
