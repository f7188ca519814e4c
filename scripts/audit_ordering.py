"""Audit every registry query for a deterministic final ordering.

The round driver's value hash proved order-SENSITIVE for at least one
query (split_assignment, round 4), so every (queries(), oracle_sql())
pair must end in an explicit, total ORDER BY on BOTH sides.

Checks per query:
  * Spark side: the analyzed logical plan's top non-projection node is
    a global Sort.
  * Oracle side: the SQL text ends with a top-level ORDER BY (outside
    any parentheses / CTE body).

Prints one line per flagged query; exits 0 always (report tool).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")


def sql_has_tail_order_by(sql: str) -> bool:
    """True if the outermost query ends with ORDER BY ... [LIMIT n]."""
    s = sql.strip().rstrip(";").strip()
    # strip a trailing LIMIT
    s = re.sub(r"\s+LIMIT\s+\d+\s*$", "", s, flags=re.I)
    # find the last ORDER BY that sits at paren depth 0
    depth = 0
    last_top_order = -1
    upper = s.upper()
    i = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("ORDER BY", i):
            last_top_order = i
        i += 1
    if last_top_order < 0:
        return False
    # everything after must contain no new SELECT/UNION at depth 0
    tail = upper[last_top_order:]
    return "SELECT" not in re.sub(r"\([^)]*\)", "", tail)


def spark_plan_tail_sort(df) -> bool:
    """True if the analyzed plan has a global Sort above any real op."""
    p = df._jdf.queryExecution().analyzed()
    # Walk down through no-op wrappers (Project of attributes only,
    # SubqueryAlias) to find the first materially-ordering node.
    jvm_cls = lambda n: n.getClass().getSimpleName()
    node = p
    while True:
        name = jvm_cls(node)
        if name == "Sort":
            return bool(getattr(node, "global")())
        if name in ("Project", "SubqueryAlias", "GlobalLimit", "LocalLimit"):
            node = node.children().head()
            continue
        return False


def main() -> None:
    from ureplicator_spark.queries import QUERIES
    from ureplicator_spark.session import get_spark

    spark = get_spark("audit-ordering")
    flagged = []
    for name, (fn, sql) in QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            s_ok = spark_plan_tail_sort(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK BUILD ERROR {e}")
            continue
        o_ok = sql_has_tail_order_by(sql) if sql else None
        if not s_ok or (sql and not o_ok):
            flagged.append((name, s_ok, o_ok))
            print(f"{name}: spark_sorted={s_ok} oracle_sorted={o_ok}")
    print(f"\n{len(flagged)} of {len(QUERIES)} queries lack deterministic ordering")


if __name__ == "__main__":
    main()
