"""Partitioned record archive — replay-from-archive with partition
pruning.

The reference replays from Kafka retention only; an archive sink
(replicated log → parquet partitioned by topic/date) extends replay
beyond retention, and Hive-style partitioning makes bounded replays
(S3/T10) and per-topic analytics prune to exactly the directories they
need — at 100 TB a single-topic single-day replay reads one partition
directory, not the log.

Layout: ``<root>/topic=<t>/dt=<yyyy-MM-dd>/*.parquet``. Partition
columns are low-cardinality by construction (topics × days), so no
small-file explosion; within a partition, files arrive sized by the
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_archive(records: DataFrame, root: str, mode: str = "append") -> None:
    """Append records partitioned by (topic, dt). ``dt`` derives from
    the record timestamp (epoch seconds → UTC date)."""
    (
        records.withColumn("dt", F.to_date(F.timestamp_seconds("ts_sec")))
        .write.mode(mode)
        .partitionBy("topic", "dt")
        .parquet(root)
    )


def read_archive(
    spark: SparkSession,
    root: str,
    topic: str | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Pruned archive scan: topic/date predicates hit PartitionFilters
    (directory pruning), never file contents.

    ``merge_schema=True`` unions column sets across partition files
    (absent columns read as NULL) — a record schema that grew a header
    field mid-retention is the normal case for a long-lived archive.
    Off by default: schema merging reads every file's footer up front,
    which on a 100 TB archive is a full metadata sweep you only pay
    when drift is actually possible."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(root)
    if topic is not None:
        df = df.filter(F.col("topic") == topic)
    if date_from is not None:
        df = df.filter(F.col("dt") >= F.lit(date_from).cast("date"))
    if date_to is not None:
        df = df.filter(F.col("dt") < F.lit(date_to).cast("date"))
    return df


def compact_archive(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    topic: str | None = None,
) -> list[tuple[str, str, int, int]]:
    """Small-file compaction: rewrite each (topic, dt) partition whose
    file count exceeds its size-justified target into
    ``ceil(bytes/target_bytes)`` files.

    Streaming archives accumulate one file per micro-batch per
    partition; at 100 TB that is millions of KB-sized files whose
    open/footer cost dominates every scan (Spark packs them into
    splits, but each file still pays an open + footer read). Classic
    log-compaction pass, expressed Spark-side:

      * work list comes from the partition DIRECTORY listing + file
        status (driver-side metadata only — no data read);
      * each partition rewrites independently via a pruned scan →
        ``repartition(n)`` → overwrite of just that directory
        (``partitionOverwriteMode=dynamic``), so compaction never
        touches partitions it is not shrinking and can run
        incrementally (``topic=`` filter) next to readers;
      * rewrite preserves rows exactly (no dedup here — offsets are
        already unique per partition by construction).

    Returns [(topic, dt, n_files_before, n_files_after), ...] for the
    partitions rewritten. Uses the Hadoop FS API through the JVM so it
    works on any FileSystem implementation (local, HDFS, S3A), same
    discipline as streaming/offsets.py's compactor."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(root).getFileSystem(conf)
    if not fs.exists(Path(root)):
        return []

    work: list[tuple[str, str, int, int, int]] = []
    for tdir in fs.listStatus(Path(root)):
        if not tdir.isDirectory():
            continue
        tname = tdir.getPath().getName()
        if not tname.startswith("topic="):
            continue
        tval = tname.split("=", 1)[1]
        if topic is not None and tval != topic:
            continue
        for ddir in fs.listStatus(tdir.getPath()):
            if not ddir.isDirectory():
                continue
            dname = ddir.getPath().getName()
            if not dname.startswith("dt="):
                continue
            files = [
                st
                for st in fs.listStatus(ddir.getPath())
                if not st.isDirectory()
                and not st.getPath().getName().startswith(("_", "."))
            ]
            total = sum(st.getLen() for st in files)
            n_target = max(1, -(-total // target_bytes))
            if len(files) > n_target:
                work.append((tval, dname.split("=", 1)[1], len(files), n_target, total))

    if not work:
        return []

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done: list[tuple[str, str, int, int]] = []
    try:
        for tval, dval, n_before, n_target, _total in work:
            part = (
                spark.read.parquet(root)
                .filter((F.col("topic") == tval) & (F.col("dt") == F.lit(dval).cast("date")))
                # eager localCheckpoint: materialize the partition into
                # executor storage BEFORE the overwrite — Spark refuses
                # to overwrite a path its input plan still reads, and
                # the checkpoint also makes the rewrite crash-safe
                # (source rows live in memory/disk blocks, not the
                # directory being replaced)
                .repartition(n_target)
                .localCheckpoint()
            )
            (
                part.write.mode("overwrite")
                .partitionBy("topic", "dt")
                .parquet(root)
            )
            part.unpersist()
            done.append((tval, dval, n_before, n_target))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return done
