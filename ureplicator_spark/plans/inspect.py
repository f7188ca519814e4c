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
    """Data-moving exchanges (broadcast exchanges excluded).

    Counted from simple-mode explain, where each shuffle prints as
    ``Exchange hashpartitioning(...)`` etc. on one line (formatted mode
    splits operator and arguments, so one-line regexes undercount)."""
    plan = plan_string(df, mode="simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def executed_plan_string(df: DataFrame) -> str:
    """Run the plan to completion (noop sink) and return the FINAL
    adaptive physical plan — under AQE the pre-execution explain shows
    `isFinalPlan=false` placeholders without codegen markers or runtime
    join rewrites."""
    df.collect()  # a sink write would finalize a SEPARATE queryExecution
    full = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # keep only the final section or every operator counts twice
    return full.split("== Initial Plan ==")[0]


def count_codegen_stages(df: DataFrame) -> int:
    """Distinct WholeStageCodegen stages (simple mode marks operators
    inside a codegen stage as ``*(n)``)."""
    plan = plan_string(df, mode="simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


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
