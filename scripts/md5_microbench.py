"""Two-engine per-row md5+conv microbenchmark (r10 verdict task #4).

Pins the irreducible engine delta behind `approx_distinct_orders`'s
register-build floor: both engines hash the SAME 600 k lineitem order
keys with the SAME portable construction (md5 → first 15 hex chars →
bigint), isolated from the sketch by differencing against a
scan+fold baseline (SUM(length(k))). min-of-5, interleaved, one
session per engine (bench-measurement discipline, SCALE.md).

Usage: python scripts/md5_microbench.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 5


def _min_time(fn, reps: int = REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def duckdb_times() -> tuple[float, float, int]:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW keys AS SELECT CAST(l_orderkey AS VARCHAR) AS k "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    n = con.execute("SELECT COUNT(*) FROM keys").fetchone()[0]
    base = _min_time(lambda: con.execute("SELECT SUM(length(k)) FROM keys").fetchone())
    hashed = _min_time(
        lambda: con.execute(
            "SELECT SUM(('0x' || substr(md5(k), 1, 15))::BIGINT % 1000003) FROM keys"
        ).fetchone()
    )
    con.close()
    return base, hashed, n


def spark_times() -> tuple[float, float, int]:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from ureplicator_spark.functions import md5_long
    from ureplicator_spark.session import get_spark
    from ureplicator_spark.sources.parquet import load_table

    spark = get_spark("md5-microbench")
    keys = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    n = keys.count()  # warm the scan
    base = _min_time(lambda: keys.agg(F.sum(F.length("k"))).collect())
    hashed = _min_time(
        lambda: keys.agg(F.sum(md5_long(F.col("k")) % 1000003)).collect()
    )
    spark.stop()
    return base, hashed, n


def main() -> None:
    db, dh, n = duckdb_times()
    sb, sh, n2 = spark_times()
    assert n == n2
    print(f"rows: {n}")
    print(f"duckdb: baseline {db:.3f}s  md5 {dh:.3f}s  delta {dh - db:.3f}s "
          f"= {(dh - db) / n * 1e9:.0f} ns/row")
    print(f"spark : baseline {sb:.3f}s  md5 {sh:.3f}s  delta {sh - sb:.3f}s "
          f"= {(sh - sb) / n * 1e9:.0f} ns/row")


if __name__ == "__main__":
    main()
