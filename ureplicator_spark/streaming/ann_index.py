"""Streaming IVF index maintenance — keep the persisted ANN index
(`sources/ivf_index.py`) current as embeddings arrive, without ever
rebuilding it.

A training-data pipeline embeds documents continuously; the search
index must absorb them at arrival cadence. Rebuild-per-batch is
O(corpus) per batch — the non-scalable strawman. This maintainer is
O(batch): each micro-batch broadcast-assigns its vectors to the
existing centroid lists and appends partition-wise
(`append_to_ivf_index`), exactly the incremental discipline of the
MinHash index twin (`sources/minhash_index.py` — corpus never
re-shingled) and the ref-counted IVM views (`streaming/ivm.py` —
O(delta) per batch).

Replay contract (same family as ivm.py's version-dir commit): a
marker directory (``fsutil.batch_marker`` — namespaced by checkpoint
identity so a fresh checkpoint's restarted batch ids never collide
with a previous run's markers) is created
AFTER the batch's rows land, so a replayed micro-batch (restart from
checkpoint re-delivers the last uncommitted batch) finds its marker
and no-ops instead of appending duplicates. A crash BETWEEN append and
marker leaves one at-least-once window — the engine's documented T1
posture (commit-after-flush); consumers needing exactly-once read
through a vec_id dedup or rebuild the tail list.

Centroid drift: appends never move centroids. When list sizes skew
(`list_stats` exposes them), retrain+rebuild with
``build_ivf_index(trained=True)`` — at 100 TB that is a scheduled
offline job, not a per-batch concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6f
from pyspark.sql.streaming import StreamingQuery

from ureplicator_spark.fsutil import (
    batch_already_applied,
    batch_marker,
    mkdirs,
)
from ureplicator_spark.sources.ivf_index import append_to_ivf_index


def _maintainer(
    embeddings_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    append_fn,
    name: str,
    available_now: bool,
) -> StreamingQuery:
    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if batch_already_applied(spark, root, checkpoint_dir, batch_id):
            return  # replayed batch: already applied, no-op
        append_fn(spark, root, batch_df.select("vec_id", "embedding"))
        mkdirs(spark, batch_marker(root, checkpoint_dir, batch_id))

    writer = (
        embeddings_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_ivf_index(
    embeddings_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the maintainer over a streaming (vec_id, embedding) frame.
    The index at ``root`` must already exist (``build_ivf_index`` on
    the initial corpus — the quantizer needs training data)."""
    return _maintainer(
        embeddings_stream,
        root,
        checkpoint_dir,
        append_to_ivf_index,
        "ivf-index-maintenance",
        available_now,
    )


def maintain_ivfpq_index(
    embeddings_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Same contract for the compressed index: new vectors are encoded
    with the persisted coarse/PQ quantizers (FAISS ``add``) and their
    codes appended to the probed-list layout — O(batch) per batch,
    replay-safe via the marker commit."""
    from ureplicator_spark.sources.pq_index import append_to_ivfpq_index

    return _maintainer(
        embeddings_stream,
        root,
        checkpoint_dir,
        append_to_ivfpq_index,
        "ivfpq-index-maintenance",
        available_now,
    )


def list_stats(spark: SparkSession, root: str) -> DataFrame:
    """Per-centroid-list occupancy — the skew gauge that schedules a
    quantizer retrain (balanced lists keep probed-partition reads even;
    a hot list degrades toward brute force over that list)."""
    vectors = spark.read.parquet(root + "/vectors")
    total = vectors.count()
    return (
        vectors.groupBy("cent_id")
        .agg(F.count("*").alias("n_vecs"))
        .select(
            "cent_id",
            "n_vecs",
            round6f(F.col("n_vecs") / F.lit(float(total or 1))).alias("share"),
        )
        .orderBy("cent_id")
    )
