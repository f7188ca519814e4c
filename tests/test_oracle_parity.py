"""The correctness gate, run locally: every registered query must
hash-match its DuckDB oracle at sf0.001 and sf0.01 (the driver runs
sf0.01). Mirrors the driver's CORRECTNESS check.

``PARITY_SF01=1`` additionally gates every query at sf0.1 — the scale
the bench runs at; slower, so opt-in rather than per-commit.
"""

from __future__ import annotations

import os

import pytest

from ureplicator_spark.queries import QUERIES
from tests.oracle_harness import cdc_cached_sql, compare

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
if os.environ.get("PARITY_SF01"):
    SF_DIRS.append("/root/testdata/sf0.1")


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
@pytest.mark.parametrize("sf", SF_DIRS)
def test_query_matches_oracle(spark, name, sf):
    fn, sql = QUERIES[name]
    df = fn(spark, sf)
    assert df.count() >= 0  # runs
    if sql is None:
        pytest.skip("no SQL oracle (non-SQL-expressible op); rows-only check")
    # CDC pair: run against the per-session cached chunk reconstruction
    # (the ~25 s recursive walk at sf0.1 otherwise runs twice per sweep)
    sql = cdc_cached_sql(name, sf) or sql
    problems = compare(df, sql, sf)
    assert not problems, f"{name}@{sf}: " + "; ".join(problems)
