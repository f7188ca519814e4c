"""Streaming perceptual-fingerprint index maintenance — keep the
persisted media dedup index (`sources/media_index.py`) current as
payload batches arrive, without re-hashing the corpus.

Fingerprints are PER-ITEM local state (no global order, no corpus
statistic), so the maintainer is the simplest of the index family:
each micro-batch is hashed once (map-only mapInPandas over Arrow
batches — payload bytes never leave the scan stage) and its 16-byte
(media_id, dhash) rows append to the hash sections
(`append_to_media_index`); appended state is PROVABLY equal to a full
rebuild over old ∪ batch, so the incremental re-encode probe
(`incremental_media_dedup`) sees exactly the index a snapshot build
would produce.

Replay contract (the chunk_index.py / ann_index.py marker pattern): a
marker directory namespaced by checkpoint identity is created AFTER
the batch's rows land, so a replayed micro-batch (restart from
checkpoint re-delivers the last uncommitted batch) finds its marker
and no-ops instead of appending duplicate hash rows. A crash BETWEEN
append and marker leaves one at-least-once window — the engine's
documented T1 posture; the probe is insensitive to it (pairs are
DISTINCT per (new, corpus) id pair), and the offline repair is a
``dropDuplicates`` over the 16-byte rows.

The batch frame is persisted across the maintainer's two actions
(isEmpty gate + hash-and-append) so a non-deterministic source cannot
yield different data to each — the streaming/sketches.py discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ureplicator_spark.fsutil import (
    batch_already_applied,
    batch_marker,
    mkdirs,
)
from ureplicator_spark.sources.media_index import append_to_media_index


def maintain_media_index(
    media_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the maintainer over a streaming (media_id, payload) frame.
    The index at ``root`` must already exist (``build_media_index`` on
    the initial corpus snapshot)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            if batch_already_applied(spark, root, checkpoint_dir, batch_id):
                return  # replayed batch: already applied, no-op
            append_to_media_index(batch_df.select("media_id", "payload"), root)
            mkdirs(spark, batch_marker(root, checkpoint_dir, batch_id))
        finally:
            batch_df.unpersist()

    writer = (
        media_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("media-index-maintenance")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
