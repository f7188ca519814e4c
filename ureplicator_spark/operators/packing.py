"""Training-sequence packing — the last-mile operator of a
pretraining data pipeline: concatenate the corpus in a deterministic
document order and cut it into fixed token-capacity training
sequences (the GPT-style "concatenate and chunk" loader shape), with
documents that cross a sequence boundary split into fragments.

Sibling of ``text.shard_assignments`` (whole-doc token-budget shard
layout): both ride the SAME two-phase distributed prefix sum
(``text.doc_token_offsets`` — per-bucket totals, a window over the
bucket-cardinality table, bucket-local cumsum; no global-ordering
window ever sees the corpus). Packing differs in semantics: capacity
is exact, so a document straddling a boundary is SPLIT and the
operator accounts the fragments — what the trainer's loader does
when it packs tokenized docs into fixed-length model sequences.

The oracle for the registry query runs the naive single global
window (`SUM(n) OVER (ORDER BY doc_id)`) — exactly the plan shape
this implementation exists to avoid: on Spark that is Exchange
SinglePartition over the corpus, one task holding 100 TB. Here the
only single-partition stage operates on the bucket-total table
(corpus/4096 rows — plan-asserted in tests/test_packing.py).

Explode fan-out is bounded per doc by ceil(n_tokens/capacity)+1, so
the packed output is O(corpus_tokens/capacity + n_docs) rows; all
arithmetic is integer (integer DIV, exact past 2^53 global offsets),
hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.operators.text import doc_token_offsets


def pack_sequences(
    documents: DataFrame, capacity: int = 2048, token_offset: int = 0
) -> DataFrame:
    """Per-training-sequence packing stats for fixed ``capacity``:
    (seq_id, n_docs, n_fragments, seq_tokens) where n_fragments counts
    documents cut at either boundary of the sequence and seq_tokens
    is the filled budget (== capacity everywhere but the tail)."""
    cap = F.lit(int(capacity)).cast("long")
    spans = doc_token_offsets(documents, token_offset).withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr(f"start div {int(capacity)}"),
                F.expr(f"(end - 1) div {int(capacity)}"),
            )
        ),
    )
    lo = F.col("seq_id") * cap
    hi = (F.col("seq_id") + 1) * cap
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                ((F.col("start") < lo) | (F.col("end") > hi)).cast("long")
            ).alias("n_fragments"),
            F.sum(
                F.least(F.col("end"), hi) - F.greatest(F.col("start"), lo)
            ).alias("seq_tokens"),
        )
        .orderBy("seq_id")
    )
