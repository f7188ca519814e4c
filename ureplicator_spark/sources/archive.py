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

from ureplicator_spark.caching import release_checkpoint


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
            release_checkpoint(part)  # .unpersist is a no-op for checkpoints
            done.append((tval, dval, n_before, n_target))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return done


def _anti_by_keys(left: DataFrame, right_keys: DataFrame, keys: list[str]) -> DataFrame:
    """left_anti join on ``keys`` with NULL-SAFE equality: a nullable
    key column (e.g. a round-robin ``partition``) must still identify
    its row — under plain equality NULL never matches NULL, so a
    replayed record with a null key would silently duplicate instead
    of replacing."""
    r = right_keys
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[k])
        cond = c if cond is None else (cond & c)
    return left.join(r, cond, "left_anti")


def _semi_by_keys(left: DataFrame, right_keys: DataFrame, keys: list[str]) -> DataFrame:
    """left_semi twin of :func:`_anti_by_keys` (null-safe)."""
    r = right_keys
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[k])
        cond = c if cond is None else (cond & c)
    return left.join(r, cond, "left_semi")


def upsert_archive(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: tuple[str, ...] = ("topic", "partition", "offset"),
) -> dict:
    """MERGE-style upsert: replace-or-insert records by key, rewriting
    ONLY the (topic, dt) partitions the updates touch — the CDC /
    late-correction pattern (a re-delivered record with a fixed
    payload, a backfilled day) expressed with dynamic partition
    overwrite instead of a table format's transaction log.

    Scale shape: the touched-partition list is bounded by topics×days
    in the update batch (driver-side, metadata-sized); the read side
    statically prunes to exactly those directories; survivors come
    from one anti-join keyed on the record identity; the rewrite is
    crash-safe via the same eager localCheckpoint-then-overwrite
    discipline as ``compact_archive``. Untouched partitions are never
    read, never rewritten. At-least-once replays make this idempotent:
    re-upserting the same batch replaces rows with identical ones.

    Contract: a record's event time (its ``dt``) is stable — the key
    identifies the row, the update corrects its payload. An update
    that MOVES a record across days would leave the old version in a
    partition this batch never reads; such corrections must be issued
    as delete+insert, or the batch must include a row for the old day.

    Returns ``{"partitions": n, "replaced": r, "inserted": i}``.
    """
    from functools import reduce
    from operator import or_

    # collapse duplicate-keyed rows within the batch FIRST: the
    # anti-join removes the archived copy by key, so two updates for
    # one key would otherwise BOTH append — violating the unique-
    # identity invariant this function exists to enforce. The winner
    # among same-key rows is arbitrary (dropDuplicates); a CDC feed
    # that needs last-write-wins must carry a version column and
    # pre-reduce on it before calling.
    up = updates.dropDuplicates(list(keys)).withColumn(
        "dt", F.to_date(F.timestamp_seconds("ts_sec"))
    )
    pairs = [(r.topic, str(r.dt)) for r in up.select("topic", "dt").distinct().collect()]
    if not pairs:
        return {"partitions": 0, "replaced": 0, "inserted": 0}

    pred = reduce(
        or_,
        [
            (F.col("topic") == t) & (F.col("dt") == F.lit(d).cast("date"))
            for t, d in pairs
        ],
    )
    existing = spark.read.parquet(root).filter(pred)
    key_list = list(keys)
    survivors = _anti_by_keys(existing, up.select(*key_list).distinct(), key_list)
    n_existing = existing.count()
    n_survivors = survivors.count()
    n_updates = up.count()

    merged = (
        survivors.unionByName(up)
        # eager localCheckpoint BEFORE the overwrite — same reason as
        # compact_archive: the input plan must stop reading the
        # directories being replaced, and the blocks make the rewrite
        # crash-safe.
        .localCheckpoint()
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("topic", "dt").parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    release_checkpoint(merged)  # .unpersist is a no-op for checkpoints
    replaced = n_existing - n_survivors
    return {
        "partitions": len(pairs),
        "replaced": replaced,
        "inserted": n_updates - replaced,
    }


def delete_from_archive(
    spark: SparkSession,
    root: str,
    delete_keys: DataFrame,
    keys: tuple[str, ...] = ("topic", "partition", "offset"),
) -> dict:
    """Targeted record deletion — the right-to-be-forgotten pass a
    training-data archive must support. ``delete_keys`` carries just
    the key columns; the archive is scanned ONCE to find which
    (topic, dt) partitions actually hold matching rows, and only those
    are rewritten (same localCheckpoint + dynamic-overwrite discipline
    as upsert/compact).

    The edge dynamic overwrite cannot express: a partition whose every
    row is deleted produces no output rows, so the overwrite never
    touches it — those directories are removed explicitly through the
    Hadoop FS API (works on local/HDFS/S3A alike).

    Scale shape: the key set broadcasts (deletion batches are small
    relative to the corpus); the discovery pass is one semi join that
    prunes to nothing on partitions without matches; the rewrite reads
    only affected directories. Returns ``{"partitions": n,
    "deleted": d, "removed_dirs": k}``.
    """
    from functools import reduce
    from operator import or_

    key_list = list(keys)
    kdf = delete_keys.select(*key_list).distinct()
    archive = spark.read.parquet(root)
    hits = _semi_by_keys(archive, F.broadcast(kdf), key_list)
    pairs = [(r.topic, str(r.dt)) for r in hits.select("topic", "dt").distinct().collect()]
    if not pairs:
        return {"partitions": 0, "deleted": 0, "removed_dirs": 0}

    pred = reduce(
        or_,
        [
            (F.col("topic") == t) & (F.col("dt") == F.lit(d).cast("date"))
            for t, d in pairs
        ],
    )
    existing = archive.filter(pred)
    survivors = _anti_by_keys(existing, F.broadcast(kdf), key_list).localCheckpoint()
    n_deleted = existing.count() - survivors.count()
    kept_pairs = {
        (r.topic, str(r.dt)) for r in survivors.select("topic", "dt").distinct().collect()
    }

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy("topic", "dt").parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    release_checkpoint(survivors)  # .unpersist is a no-op for checkpoints

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(root).getFileSystem(conf)
    emptied = [p for p in pairs if p not in kept_pairs]
    for t, d in emptied:
        fs.delete(Path(f"{root}/topic={t}/dt={d}"), True)
        # a topic whose last day was purged must not linger as an
        # empty topic= directory
        tdir = Path(f"{root}/topic={t}")
        if fs.exists(tdir) and len(fs.listStatus(tdir)) == 0:
            fs.delete(tdir, True)
    # deleting the LAST record leaves a _SUCCESS-only root every
    # subsequent parquet read would crash on (UNABLE_TO_INFER_SCHEMA);
    # remove it — an ABSENT root is the canonical empty-archive state
    # (write_archive / the streaming sinks recreate it on next data).
    if len(fs.globStatus(Path(f"{root}/topic=*"))) == 0:
        fs.delete(Path(root), True)
    return {"partitions": len(pairs), "deleted": n_deleted, "removed_dirs": len(emptied)}


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    include_values: bool = False,
) -> DataFrame:
    """Snapshot-to-snapshot CDC: classify every key as ``added`` /
    ``removed`` / ``changed`` between two versions of a table, with
    the list of differing columns. The audit view a versioned archive
    (``operators/backup.py`` history, or two ``read_archive`` roots)
    answers "what changed between yesterday's snapshot and today's?"
    without a table format's commit log — the reference's validation
    story compares ideal vs actual state the same way
    (uReplicator-Controller/.../ValidationManager.java:134-206);
    this generalizes it to arbitrary keyed tables.

    Unchanged keys are dropped, so the output is delta-sized, not
    table-sized. ``compare`` defaults to every non-key column shared
    by both sides (schema drift: a column only one side has is
    ignored — pass it explicitly to surface it as always-changed).
    ``include_values=True`` additionally emits ``old_<c>``/``new_<c>``
    before/after images per compare column (Debezium-style), which is
    what incremental view maintenance needs to retract aggregate
    contributions.

    Scale shape: ONE full-outer shuffle join on the key (both sides
    hash-partition; at 100 TB each side prunes to its snapshot
    directories first), change classification is pure map-side column
    compare (null-safe, so NULL→value transitions count as changes),
    and the delta output is what a downstream incremental consumer
    ingests. No collect, no window, no skew pivot (keys are unique
    per snapshot by contract).
    """
    if compare is None:
        shared = set(old.columns) & set(new.columns)
        compare = [c for c in old.columns if c in shared and c not in keys]

    o = old.select(*keys, *compare)
    n = new.select(*keys, *compare)
    for c in keys + compare:
        o = o.withColumnRenamed(c, f"_o_{c}")
        n = n.withColumnRenamed(c, f"_n_{c}")
    cond = [F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in keys]
    j = o.join(n, cond, "full_outer")

    # key columns are non-null by contract, so side presence reduces to
    # the first key column's null-ness after the outer join
    in_old = F.col(f"_o_{keys[0]}").isNotNull()
    in_new = F.col(f"_n_{keys[0]}").isNotNull()
    diffs = [
        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in compare
    ]
    any_diff = diffs[0] if diffs else F.lit(False)
    for d in diffs[1:]:
        any_diff = any_diff | d
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    changed_cols = F.when(
        in_old & in_new,
        F.concat_ws(
            ",", *[F.when(d, F.lit(c)) for c, d in zip(compare, diffs)]
        ),
    ).otherwise(F.lit(""))
    # before/after images (Debezium-style): old_<c> is NULL on added
    # rows, new_<c> on removed — exactly what downstream incremental
    # view maintenance needs to retract SUM/COUNT contributions
    value_cols = (
        [F.col(f"_o_{c}").alias(f"old_{c}") for c in compare]
        + [F.col(f"_n_{c}").alias(f"new_{c}") for c in compare]
        if include_values
        else []
    )
    return (
        j.select(
            *[
                F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change_type"),
            changed_cols.alias("changed_cols"),
            *value_cols,
        )
        .filter(F.col("change_type").isNotNull())
    )
