#!/usr/bin/env python
"""Warm-sequential floor experiment (r6 verdict task #7).

Question: the 34-query warm sequential pass costs ~0.65 s/query at
sf0.1 — how much of that is AQE re-planning / shuffle-partition count
(config-addressable) vs Spark's per-query fixed cost (irreducible)?

Method: the same warm pass as bench.py (noop sink, pin_scope per run)
under three configs, REPS medians per query:
  A. baseline  — AQE on, shuffle.partitions=32 (the engine defaults)
  B. aqe_off   — AQE off
  C. aqe_off_sp8 — AQE off, shuffle.partitions=8

Output: one JSON line with per-config totals + per-query medians.
Findings go to SCALE.md.
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


def main() -> None:
    from bench import BENCH_QUERIES
    from ureplicator_spark.caching import pin_scope
    from ureplicator_spark.queries import QUERIES
    from ureplicator_spark.session import get_spark

    spark = get_spark("floor-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in QUERIES]  # skips ivf (needs index)

    def one_pass() -> dict[str, float]:
        out = {}
        for name in names:
            with pin_scope():
                t0 = time.perf_counter()
                QUERIES[name][0](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name] = time.perf_counter() - t0
        return out

    configs = {
        "baseline": {"spark.sql.adaptive.enabled": "true",
                     "spark.sql.shuffle.partitions": "32"},
        "aqe_off": {"spark.sql.adaptive.enabled": "false",
                    "spark.sql.shuffle.partitions": "32"},
        "aqe_off_sp8": {"spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "8"},
    }
    one_pass()  # warmup: codegen + plan caches
    results = {}
    for label, confs in configs.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        one_pass()  # re-warm under this config (plans re-derive)
        runs = [one_pass() for _ in range(REPS)]
        med = {n: round(statistics.median(r[n] for r in runs), 3) for n in names}
        results[label] = {"total": round(sum(med.values()), 3), "queries": med}
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
