"""Optimization measurement helper (plans round via $PLANS_ROUND, default r13).

Usage:
  python scripts/opt_measure.py before q1 q2 ...   # time + dump plans/<round>/<q>_before.txt
  python scripts/opt_measure.py after  q1 q2 ...   # time + dump plans/<round>/<q>_after.txt
  python scripts/opt_measure.py time   q1 q2 ...   # time only (no plan dump)

Each query is timed with the noop sink (guide §1.4) inside pin_scope,
REPS times (default 5), printing all reps + min. Plan dumps are
``explain("formatted")`` of the same DataFrame (pre-execution formatted
plan; the executed AQE plan counts live in PLAN_REPORT.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("OPT_REPS", "5"))


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    assert mode in ("before", "after", "time")

    from ureplicator_spark.caching import pin_scope
    from ureplicator_spark.plans.inspect import plan_string
    from ureplicator_spark.queries import QUERIES
    from ureplicator_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (same as bench.py)
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    rnd = os.environ.get("PLANS_ROUND", "r13")
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", rnd)
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = QUERIES[name][0]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        reps = []
        for _ in range(REPS):
            with pin_scope():
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(reps)} reps={reps}", flush=True)
        if mode in ("before", "after"):
            with pin_scope():
                p = plan_string(fn(spark, SF_DIR), mode="formatted")
            with open(os.path.join(plans_dir, f"{name}_{mode}.txt"), "w") as fh:
                fh.write(p)
    spark.stop()


if __name__ == "__main__":
    main()
