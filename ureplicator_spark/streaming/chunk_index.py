"""Streaming CDC chunk-index maintenance — keep the persisted
binary-payload dedup index (`sources/chunk_index.py`) current as
media batches arrive, without ever re-chunking the corpus.

A multimodal ingest pipeline lands payload batches continuously; the
dedup probe (`incremental_payload_dedup`) needs the chunk-identity
index to include everything already accepted. Rebuild-per-batch is
O(corpus) per batch — the non-scalable strawman. This maintainer is
O(batch): each micro-batch is chunked once (Gear CDC over Arrow
batches, payload bytes never leave the scan stage) and its identity
rows append partition-wise into their hash-prefix buckets
(`append_to_chunk_index`) — existing bucket files are never
rewritten, the same incremental discipline as the IVF/MinHash/lexical
index maintainers and the ref-counted IVM views (O(delta) per batch).

Replay contract (the ann_index.py marker pattern): a marker directory
(``fsutil.batch_marker`` — namespaced by checkpoint identity so a
fresh checkpoint's restarted batch ids never collide with an earlier
run's markers) is created AFTER the batch's
rows land, so a replayed micro-batch (restart from checkpoint
re-delivers the last uncommitted batch) finds its marker and no-ops
instead of appending duplicate chunk identities. A crash BETWEEN
append and marker leaves one at-least-once window — the engine's
documented T1 posture; the dedup probe is insensitive to it (shared
chunks are counted once per (new, corpus) pair via distinct), and an
offline repair is a bucket-local ``dropDuplicates`` over
(chunk_hash, media_id, chunk_idx).

The batch frame is persisted across the maintainer's two actions
(isEmpty gate + chunk-and-append) so a non-deterministic source
cannot yield different data to each — the streaming/sketches.py
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ureplicator_spark.fsutil import (
    batch_already_applied,
    batch_marker,
    mkdirs,
)
from ureplicator_spark.sources.chunk_index import append_to_chunk_index


def maintain_chunk_index(
    media_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **chunk_kw,
) -> StreamingQuery:
    """Run the maintainer over a streaming (media_id, payload) frame.
    The index at ``root`` must already exist (``build_chunk_index`` on
    the initial corpus snapshot)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            if batch_already_applied(spark, root, checkpoint_dir, batch_id):
                return  # replayed batch: already applied, no-op
            append_to_chunk_index(
                batch_df.select("media_id", "payload"), root, **chunk_kw
            )
            mkdirs(spark, batch_marker(root, checkpoint_dir, batch_id))
        finally:
            batch_df.unpersist()

    writer = (
        media_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("chunk-index-maintenance")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
