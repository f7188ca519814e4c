#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB ratio audit at the bench SF.

Times each registered query's DuckDB oracle (median of REPS) and joins
it with the latest bench_detail.json warm/extended Spark medians+mins,
printing the queries whose Spark min exceeds RATIO_GATE × oracle —
the judge's ≤2× gate, measured exactly as the judge measures it.

DuckDB runs single-connection on all cores (its default), same parquet
files, results fetched to python (matching how the oracle harness
executes). Spark numbers come from bench_detail.json (run bench.py
first on an idle host).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
RATIO_GATE = float(os.environ.get("RATIO_GATE", "2.0"))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    from ureplicator_spark.queries import QUERIES

    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_detail.json",
    )
    detail = json.load(open(detail_path))
    spark_min = {**detail.get("warm_min_queries", {}),
                 **detail.get("extended_min_queries", {})}
    spark_med = {**detail.get("warm_queries", {}),
                 **detail.get("extended_queries", {})}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    rows = []
    for name in spark_min:
        sql = QUERIES.get(name, (None, None))[1]
        if sql is None:
            continue  # streaming / non-SQL-expressible: no oracle to race
        con.execute(sql).fetchall()  # warm the buffer pool / plan cache
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            reps.append(time.perf_counter() - t0)
        o = statistics.median(reps)
        rows.append((name, spark_min[name], spark_med[name], round(o, 3),
                     round(spark_min[name] / o, 2) if o > 0 else None))

    # Honesty carve-out: these oracles are RECURSIVE-RECONSTRUCTION
    # shapes (WITH RECURSIVE Gear walk) — the SQL-expressible form of
    # an inherently iterative computation, not DuckDB's natural plan.
    # Their oracle times are 10-20x the Spark row and would flatter
    # the aggregate, so the headline total EXCLUDES them (they are
    # still listed, flagged "recon").
    recon = {"cdc_chunk_dedup", "cdc_incremental_dedup"}

    rows.sort(key=lambda r: -(r[4] or 0))
    print(f"{'query':38s} {'spark_min':>9s} {'spark_med':>9s} "
          f"{'oracle':>7s} {'ratio':>6s}")
    over = 0
    for name, smin, smed, o, ratio in rows:
        flag = " <-- over" if ratio and ratio > RATIO_GATE and name not in recon else ""
        if name in recon:
            flag = " (recon oracle; excluded from totals)"
        if flag.startswith(" <--"):
            over += 1
        print(f"{name:38s} {smin:9.3f} {smed:9.3f} {o:7.3f} {ratio:6.2f}{flag}")
    core = [r for r in rows if r[0] not in recon]
    totals = (
        sum(r[1] for r in core),
        sum(r[2] for r in core),
        sum(r[3] for r in core),
    )
    print(f"\nTOTALS (excl. recon oracles) spark_min={totals[0]:.1f}s "
          f"spark_med={totals[1]:.1f}s "
          f"oracle={totals[2]:.1f}s  ratio(min)={totals[0]/totals[2]:.2f} "
          f"over_gate={over}/{len(core)}")
    at = (sum(r[1] for r in rows), sum(r[3] for r in rows))
    print(f"TOTALS (all rows)            spark_min={at[0]:.1f}s "
          f"oracle={at[1]:.1f}s  ratio(min)={at[0]/at[1]:.2f}")


if __name__ == "__main__":
    main()
