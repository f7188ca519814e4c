"""Persisted CDC chunk-hash index — incremental binary-payload dedup.

`operators/multimodal.cdc_chunk_dedup` chunks the whole corpus per
query run. A production pipeline ingests payload batches into a
100 TB media corpus; re-chunking the corpus per batch is the cost
this index removes: the corpus is chunked ONCE per snapshot and only
its chunk IDENTITIES (md5, length — never the bytes) are persisted,
bucket-partitioned by hash prefix so an incremental probe scans only
the buckets the new batch's chunks map to (the partition-pruned
probe discipline of `lexical_index.py` postings).

Layout:

    <root>/chunks/bucket=<b>/   (chunk_hash, media_id, chunk_idx, length)

Append is O(batch): new payloads are chunked and their identity rows
land in their bucket partitions; existing files are never rewritten —
the same snapshot-then-append discipline as `ivf_index.py` /
`minhash_index.py` / `lexical_index.py`, completing the incremental-
index family for the binary/multimodal path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6f

from ureplicator_spark.caching import pin
from ureplicator_spark.operators.multimodal import cdc_chunk_payloads

N_BUCKETS = 64

# explicit read schema: an index built from an empty corpus slice has
# no parquet footers to infer from (only _SUCCESS), and the probe must
# still work against it (returning zero pairs, not a schema error)
CHUNK_INDEX_SCHEMA = (
    "media_id long, chunk_idx int, start int, length int,"
    " chunk_hash string, bucket int"
)


def read_chunk_index(spark: SparkSession, root: str) -> DataFrame:
    """The persisted chunk-identity rows, schema-pinned so empty
    indexes read as empty frames."""
    return spark.read.schema(CHUNK_INDEX_SCHEMA).parquet(root + "/chunks")


def _bucketed_chunks(media: DataFrame, **chunk_kw) -> DataFrame:
    return cdc_chunk_payloads(media, **chunk_kw).withColumn(
        "bucket",
        # conv returns a STRING — cast before the modulo (ANSI-safe)
        (
            F.conv(F.substring("chunk_hash", 1, 4), 16, 10).cast("long")
            % F.lit(N_BUCKETS)
        ).cast("int"),
    )


def build_chunk_index(
    media: DataFrame,
    root: str,
    mode: str = "overwrite",
    files_per_bucket: int | None = None,
    **chunk_kw,
) -> None:
    """One corpus pass: chunk every payload, persist identity rows
    bucket-partitioned. Payload bytes never leave the scan stage.
    Rows are clustered by bucket before the write (one file per
    bucket directory at this scale; ``files_per_bucket`` splits each
    bucket deterministically for corpora where one writer task per
    bucket is too coarse) — the unclustered write scattered every
    bucket across every task: 2048 files / 6.3 s vs 64 / 1.9 s at
    sf0.1."""
    from ureplicator_spark.fsutil import (
        cluster_for_partitioned_write,
        derived_files_per_partition,
    )

    if files_per_bucket is None:
        # size-derived (guide §6): stays 1 at local SFs, grows with the
        # corpus so bucket files stay in the 128 MB-1 GB band at scale
        files_per_bucket = derived_files_per_partition(media, N_BUCKETS)
    cluster_for_partitioned_write(
        _bucketed_chunks(media, **chunk_kw), "bucket", "chunk_hash", files_per_bucket
    ).write.mode(mode).partitionBy("bucket").parquet(root + "/chunks")


def append_to_chunk_index(media: DataFrame, root: str, **chunk_kw) -> None:
    """Add a batch's chunk identities — the daily post-ingest step.
    Append-only: no rewrite of existing bucket files."""
    build_chunk_index(media, root, mode="append", **chunk_kw)


def compact_chunk_index(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[tuple[int, int, int]]:
    """Small-file compaction for the chunk store: rewrite each
    ``chunks/bucket=<b>`` partition whose file count exceeds its
    size-justified target into ``ceil(bytes/target_bytes)`` files.

    The index is append-only — every daily `append_to_chunk_index`
    (and every micro-batch of the streaming maintainer) lands one
    file per task per bucket, so at 100 TB the bucket directories
    accumulate thousands of KB-sized files whose open/footer cost
    dominates every probe scan. Same classic log-compaction pass as
    `archive.compact_archive` (its reference analog is the offset-log
    compactor, streaming/offsets.py): the work list is driver-side
    directory metadata only; each oversized bucket rewrites
    independently via a pruned scan → repartition → dynamic partition
    overwrite of just that bucket directory, so compaction never
    touches buckets it is not shrinking and can run next to probes of
    other buckets. Rows are preserved exactly — identities are
    content-addressed and may legitimately repeat across media, so no
    dedup happens here.

    Returns [(bucket, n_files_before, n_files_after), ...]."""
    from ureplicator_spark.caching import release_checkpoint

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    chunks = root + "/chunks"
    fs = Path(chunks).getFileSystem(conf)
    if not fs.exists(Path(chunks)):
        return []

    work: list[tuple[int, int, int]] = []
    for bdir in fs.listStatus(Path(chunks)):
        if not bdir.isDirectory():
            continue
        bname = bdir.getPath().getName()
        if not bname.startswith("bucket="):
            continue
        files = [
            st
            for st in fs.listStatus(bdir.getPath())
            if not st.isDirectory()
            and not st.getPath().getName().startswith(("_", "."))
        ]
        total = sum(st.getLen() for st in files)
        n_target = max(1, -(-total // target_bytes))
        if len(files) > n_target:
            work.append((int(bname.split("=", 1)[1]), len(files), n_target))

    if not work:
        return []

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done: list[tuple[int, int, int]] = []
    try:
        for bucket, n_before, n_target in work:
            part = (
                read_chunk_index(spark, root)
                .filter(F.col("bucket") == bucket)
                # eager localCheckpoint: materialize the bucket into
                # executor storage BEFORE the overwrite (Spark refuses
                # to overwrite a path its input plan still reads, and
                # the rewrite becomes crash-safe)
                .repartition(n_target)
                .localCheckpoint()
            )
            part.write.mode("overwrite").partitionBy("bucket").parquet(chunks)
            release_checkpoint(part)
            done.append((bucket, n_before, n_target))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return done


def incremental_payload_dedup(
    spark: SparkSession,
    root: str,
    new_media: DataFrame,
    **chunk_kw,
) -> DataFrame:
    """Chunk-level overlap of a NEW payload batch against the
    persisted corpus index: (new_media, corpus_media, shared_chunks,
    shared_bytes, containment) where containment = shared chunk bytes
    / the new payload's total chunk bytes (1.0 = fully contained).

    The batch is chunked locally (it is small); the corpus is NEVER
    re-chunked. The probe collects the batch's <=``N_BUCKETS`` bucket
    ids (a scalar driver list, like the lexical index's query-token
    buckets) and statically prunes the bucket partitions before the
    chunk_hash equi-join. Self-pairs are excluded so re-probing after
    an append stays clean. Duplicate chunk copies within one corpus
    payload count once (distinct on the pair + chunk identity) so
    containment never exceeds 1."""
    # pin, not persist/finally: the returned frame is lazy, so the pin
    # must outlive this function and die with the caller's pin_scope
    # (see caching.py) — the minhash_index.incremental_dedup pattern.
    new_chunks = pin(_bucketed_chunks(new_media, **chunk_kw))
    buckets = [r["bucket"] for r in new_chunks.select("bucket").distinct().collect()]
    idx = read_chunk_index(spark, root).filter(F.col("bucket").isin(buckets))
    new_tot = new_chunks.groupBy("media_id").agg(F.sum("length").alias("new_bytes"))
    shared = (
        new_chunks.alias("n")
        .join(
            idx.alias("c"),
            (F.col("n.bucket") == F.col("c.bucket"))
            & (F.col("n.chunk_hash") == F.col("c.chunk_hash"))
            & (F.col("n.media_id") != F.col("c.media_id")),
        )
        .select(
            F.col("n.media_id").alias("new_media"),
            F.col("c.media_id").alias("corpus_media"),
            F.col("n.chunk_idx").alias("new_chunk_idx"),
            F.col("n.length").alias("length"),
        )
        # one credit per NEW chunk occurrence per corpus doc, even
        # if the corpus doc holds several copies of the chunk
        .distinct()
    )
    return (
        shared.groupBy("new_media", "corpus_media")
        .agg(
            F.count("*").alias("shared_chunks"),
            F.sum("length").alias("shared_bytes"),
        )
        .join(new_tot.withColumnRenamed("media_id", "new_media"), "new_media")
        .select(
            "new_media",
            "corpus_media",
            "shared_chunks",
            "shared_bytes",
            round6f(F.col("shared_bytes") / F.col("new_bytes")).alias(
                "containment"
            ),
        )
        .orderBy("new_media", "corpus_media")
    )


def delete_from_chunk_index(
    spark: SparkSession, root: str, media_ids: list[int]
) -> dict:
    """Right-to-be-forgotten for the CDC chunk index: chunk hashes are
    content-derived identities of a payload's byte ranges. Partition-
    pruned rewrite of only the hash buckets holding the doomed items'
    chunks. Chunk boundaries are per-payload local state, so removal
    is exact (deleted-index ≡ rebuild-on-survivors row-for-row) and
    idempotent; no derived stats exist."""
    from ureplicator_spark.sources.rewrite import rewrite_partitioned_without

    ids = [int(i) for i in media_ids]
    rewritten, removed = rewrite_partitioned_without(
        spark, root + "/chunks", "bucket", "media_id", ids
    )
    return {"buckets_rewritten": rewritten, "removed_dirs": removed}
