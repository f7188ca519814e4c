"""Streaming lexical (BM25) index maintenance — keep the persisted
inverted index (`sources/lexical_index.py`) current as documents
arrive, without ever re-tokenizing the corpus.

Per micro-batch: tokenize ONLY the batch, append its postings to the
tb-bucketed layout, and fold its df / corpus-scalar deltas into the
versioned stats views — O(batch) work, the same incremental discipline
as the IVF maintainer (`streaming/ann_index.py`) and the IVM views.

Replay contract: unlike the HLL register MAX-merge, df deltas are
+sums (NOT idempotent), so a replayed micro-batch would double-count
df AND duplicate postings rows. The marker-directory guard from
ann_index covers both in one check: ``<root>/_applied_batches/b<id>``
is created only after the batch's postings and stats commits land, so
a checkpoint-restart re-delivery no-ops. A crash between append and
marker leaves the engine's documented at-least-once window (T1
posture, commit-after-flush).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ureplicator_spark.fsutil import (
    batch_already_applied,
    batch_marker,
    mkdirs,
)
from ureplicator_spark.sources.lexical_index import (
    N_TOKEN_BUCKETS,
    append_to_lexical_index,
)


def maintain_lexical_index(
    documents_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    n_buckets: int = N_TOKEN_BUCKETS,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the maintainer over a streaming documents frame (needs
    doc_id + text). Works against an empty root (first batch seeds the
    stats views) or one pre-seeded by ``build_lexical_index``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the batch is consumed by multiple actions (isEmpty,
        # the postings write, a second tokenize for the stats deltas);
        # without it the micro-batch source recomputes per action —
        # extra scans, and for a non-deterministic source the postings
        # and df stats could derive from DIFFERENT data (the same
        # reason streaming/sketches.streaming_kmv_maintenance pins its
        # batch; r7 advisor).
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            if batch_already_applied(spark, root, checkpoint_dir, batch_id):
                return  # replayed batch: postings + stats already applied
            append_to_lexical_index(spark, root, batch_df, n_buckets)
            mkdirs(spark, batch_marker(root, checkpoint_dir, batch_id))
        finally:
            batch_df.unpersist()

    writer = (
        documents_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("lexical-index-maintenance")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_positional_index(
    documents_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    n_buckets: int = N_TOKEN_BUCKETS,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming maintenance for the POSITIONAL section (exact-phrase
    retrieval): per micro-batch, tokenize only the batch and append
    its (token, doc_id, pos) rows — O(batch), the corpus is never
    re-tokenized. Phrase results are insensitive to duplicated rows
    (the intersection counts DISTINCT offsets), but a replayed batch
    would still break the append ≡ rebuild row-level equality and
    bloat the section, so the same marker-directory guard applies:
    a checkpoint-restart re-delivery no-ops."""
    from ureplicator_spark.sources.lexical_index import append_to_positional_index

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            if batch_already_applied(spark, root, checkpoint_dir, batch_id):
                return  # replayed batch: positions already appended
            append_to_positional_index(spark, root, batch_df, n_buckets)
            mkdirs(spark, batch_marker(root, checkpoint_dir, batch_id))
        finally:
            batch_df.unpersist()

    writer = (
        documents_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("positional-index-maintenance")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
