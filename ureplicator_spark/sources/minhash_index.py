"""Persisted MinHash-LSH signature index — incremental dedup at scale.

`operators/dedup.lsh_candidate_pairs` shingles and signs the whole
corpus per query run. A production pipeline ingests daily batches into
a 100 TB corpus; re-signing the corpus per batch is the cost this
index removes: signatures are built ONCE per corpus snapshot and
persisted, then each new batch is signed (it is small), banded, and
joined against ONLY the matching band partitions.

Layout:

    <root>/signatures/              (doc_id, m0..m{K-1}) wide rows
    <root>/bands/band=<b>/          (doc_id, band_hash) banded rows

The band table is partitioned by band id so an incremental probe scans
the band directories with partition pruning; the join key is
(band, band_hash), the same bucket-local topology as the in-query LSH
pass — never all-pairs. Appending a deduped batch's signatures keeps
the index current (`append_to_minhash_index`), the same
snapshot-then-append discipline as `ivf_index.py`.

Hash portability: signatures come from `operators/dedup.minhash_wide`
(shuffle-free array fold), so index contents equal what the oracle
computes over the same documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark.caching import pin
from ureplicator_spark.operators.dedup import N_BANDS, N_MINHASH, minhash_wide


def _banded(wide: DataFrame, n_bands: int, n_hashes: int) -> DataFrame:
    rows_per_band = n_hashes // n_bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.band_hash").alias("band_hash"),
    )


def build_minhash_index(
    documents: DataFrame,
    root: str,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
    mode: str = "overwrite",
) -> None:
    """One corpus pass: persist wide signatures + band-partitioned
    banding rows. The signature build itself is shuffle-free (array
    fold); the only exchange is the band-partitioned write."""
    wide = minhash_wide(documents, n_hashes).persist()
    wide.write.mode(mode).parquet(root + "/signatures")
    _banded(wide, n_bands, n_hashes).write.mode(mode).partitionBy("band").parquet(
        root + "/bands"
    )
    wide.unpersist()


def append_to_minhash_index(
    documents: DataFrame,
    root: str,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> None:
    """Add a (deduped) batch's signatures to the index — the daily
    post-ingest step. Append-only: no rewrite of existing rows."""
    build_minhash_index(documents, root, n_bands, n_hashes, mode="append")


def incremental_dedup(
    spark: SparkSession,
    root: str,
    new_documents: DataFrame,
    n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against the persisted corpus
    index: (new_doc, corpus_doc, est_jaccard).

    The batch is signed locally (small), banded, and joined against
    the band table on (band, band_hash) — bucket-local, partition-
    pruned on band, and the corpus signature table is touched only for
    the candidates' Jaccard estimate. The corpus is NEVER re-shingled.
    Self-pairs (a doc already indexed under the same id) are excluded
    so re-running over an appended index stays clean."""
    idx_bands = spark.read.parquet(root + "/bands")
    idx_wide = spark.read.parquet(root + "/signatures")

    wide_new = pin(minhash_wide(new_documents, n_hashes))
    banded_new = _banded(wide_new, n_bands, n_hashes)

    cand = (
        banded_new.alias("n")
        .join(
            idx_bands.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_hash") == F.col("c.band_hash"))
            & (F.col("n.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"), F.col("c.doc_id").alias("corpus_doc")
        )
        .distinct()
    )
    wn = wide_new.select(
        F.col("doc_id").alias("new_doc"),
        *[F.col(f"m{s}").alias(f"a{s}") for s in range(n_hashes)],
    )
    wc = idx_wide.select(
        F.col("doc_id").alias("corpus_doc"),
        *[F.col(f"m{s}").alias(f"b{s}") for s in range(n_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        for s in range(n_hashes)
    )
    # no forced broadcast: the batch is usually small (AQE broadcasts
    # it at runtime) but nothing guarantees it — a forced hint would
    # OOM on a backfill-sized batch
    return (
        cand.join(wn, "new_doc")
        .join(wc, "corpus_doc")
        .select(
            "new_doc",
            "corpus_doc",
            F.round(matches / F.lit(float(n_hashes)), 6).alias("est_jaccard"),
        )
        .orderBy("new_doc", "corpus_doc")
    )
