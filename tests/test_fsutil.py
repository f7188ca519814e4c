"""fsutil: size-derived files_per_partition (r13, guide §6).

The knob existed since r12 with a hardcoded local default of 1; r13
derives it from the source relation's physical input bytes so a
100 TB corpus gets ceil(bytes / (n_partitions · 512 MB)) writer
splits per partition directory while local fixtures keep exactly one
file per directory (bench/file-count behavior unchanged).
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ureplicator_spark.fsutil import derived_files_per_partition
from ureplicator_spark.sources.parquet import load_table


def test_local_fixtures_stay_single_file(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assert derived_files_per_partition(emb, 8) == 1
    # the local fast path must not resolve a deferred partition count
    assert derived_files_per_partition(emb, lambda: 1 / 0) == 1


def test_derivation_scales_with_bytes_and_clamps(spark):
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    files = [p.removeprefix("file:") for p in emb.inputFiles()]
    total = sum(__import__("os").path.getsize(p) for p in files)
    target = 64 << 10
    import math

    want = max(1, math.ceil(total / (2 * target)))
    assert derived_files_per_partition(emb, 2, target_bytes=target) == want
    # cap bounds runaway estimates
    assert derived_files_per_partition(emb, 1, target_bytes=1, cap=16) == 16
    # plans with no file inputs fall back to the conservative 1
    assert derived_files_per_partition(spark.range(10), 4) == 1


def test_multi_file_clustered_write_keeps_rows_and_bounds_files(spark, tmp_path):
    """files_per_partition = F bounds each partition directory at F
    files (each part value spans at most F deterministic xxhash splits
    — SPARK-38388; two splits that hash to the same shuffle task merge
    into one file, so the count is ≤ F, approaching F as the shuffle
    partition count grows) and must not change the rows a reader
    sees. At least one directory must actually split, or the knob is
    dead."""
    from ureplicator_spark.fsutil import cluster_for_partitioned_write

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("part"), F.col("id").alias("k")
    )
    root = str(tmp_path / "t")
    # KB-scale test data: AQE would (correctly) coalesce the clustered
    # exchange back to one task and one file per dir — turn it off so
    # the at-scale split behavior is observable
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        cluster_for_partitioned_write(
            df, "part", "k", 3
        ).write.mode("overwrite").partitionBy("part").parquet(root)
    finally:
        spark.conf.set(coalesce_key, prev)
    back = spark.read.parquet(root)
    assert back.count() == 1000
    assert sorted(
        tuple(r) for r in back.select("part", "k").collect()
    ) == sorted((i % 4, i) for i in range(1000))
    counts = [
        len(glob.glob(d + "/*.parquet")) for d in glob.glob(root + "/part=*")
    ]
    assert len(counts) == 4
    assert all(1 <= n <= 3 for n in counts), counts
    assert max(counts) > 1, counts
