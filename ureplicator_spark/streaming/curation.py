"""Streaming corpus curation — the training-data operators applied to
a document STREAM instead of a static table.

A crawl/ingest pipeline rarely lands as a finished parquet corpus; it
arrives continuously. The batch curation operators in
``operators/text.py`` are stateless column expressions, so they lift
onto Structured Streaming unchanged; this module packages the two
shapes that need streaming-specific care:

* ``quality_gated_stream`` — per-document gates (length, top-token
  share, duplicate-2gram share) as a map-only streaming filter. No
  state, no watermark: each micro-batch is gated independently, so
  throughput scales with executors exactly like the batch path.
* ``streaming_exact_dedup`` — content-hash dedup across micro-batches
  via ``dropDuplicatesWithinWatermark``: Spark keeps one state row per
  distinct hash and EVICTS it once the watermark passes the hash's
  last-seen event time (state is O(distinct-in-horizon), never
  O(stream)). Plain ``dropDuplicates(keys)`` without the event-time
  column in the key set never evicts — state grows with every distinct
  hash ever seen, unbounded on an infinite stream. Exactly the
  reference's at-least-once model: late duplicates beyond the horizon
  pass and are swept by the batch dedup over the landed corpus.

Both return DataFrames ready for ``writeStream`` so callers own sink
and trigger policy (same convention as streaming/replication.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_quality_columns(docs: DataFrame) -> DataFrame:
    """Columnar quality signals computable without any aggregation —
    the streaming-safe subset of ``operators.text.repetition_stats``
    (per-doc aggs are replaced by array expressions over the token
    array, all inside codegen)."""
    toks = F.split("text", " +")
    distinct_ratio = F.size(F.array_distinct(toks)) / F.size(toks)
    return docs.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
    )


def quality_gated_stream(
    doc_stream: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 2000,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Map-only streaming quality gate: keep documents passing the
    length and token-diversity rules. Stateless → unlimited scale-out."""
    gated = doc_quality_columns(doc_stream)
    return gated.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    )


def streaming_exact_dedup(
    doc_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cross-micro-batch exact dedup on the content hash. State holds
    one row per distinct hash and is evicted once the watermark passes
    that hash's last-seen event time — the eviction contract plain
    ``dropDuplicates`` does NOT provide unless the event-time column is
    part of the dedup key (which would stop deduplicating across
    timestamps). Duplicates arriving farther apart than the watermark
    horizon are both emitted (at-least-once; batch dedup sweeps them)."""
    hashed = doc_stream.withColumn("content_hash", F.md5("text"))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
