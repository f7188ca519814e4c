"""Right-to-be-forgotten across the standing indexes.

Every standing index persists per-item rows derived from user content
(raw vectors, PQ codes, chunk hashes, perceptual fingerprints); an
RTBF request must remove them wherever they live. Contract per index:
after delete, the section equals a FRESH build over the surviving
items (exact where the section is per-item local state), a repeated
delete is a no-op, and searches no longer return the deleted ids.
The lexical/positional deletes have their own pins in
tests/test_lexical_index.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ureplicator_spark.sources.parquet import load_table


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _rows(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_ivf_delete_equals_rebuild_on_survivors(spark, emb, tmp_path):
    from ureplicator_spark.sources.ivf_index import (
        build_ivf_index,
        delete_from_ivf_index,
        search_ivf_index,
    )

    doomed = [r.vec_id for r in emb.select("vec_id").limit(7).collect()]
    root = str(tmp_path / "ivf")
    build_ivf_index(emb, root, n_centroids=8)
    out = delete_from_ivf_index(spark, root, doomed)
    assert out["lists_rewritten"] >= 1

    # vectors section == fresh build over survivors AGAINST THE SAME
    # centroid model (assignment depends only on the centroid table,
    # which delete leaves untouched)
    vecs = spark.read.parquet(root + "/vectors")
    assert vecs.filter(F.col("vec_id").isin(doomed)).head(1) == []
    survivors = emb.filter(~F.col("vec_id").isin(doomed))
    assert vecs.count() == survivors.count()

    # search never returns a deleted id; queries drawn from survivors
    queries = survivors.orderBy("vec_id").limit(3)
    got = search_ivf_index(spark, root, queries, k=3)
    assert got.filter(F.col("c_id").isin(doomed)).head(1) == []
    assert got.head(1)

    again = delete_from_ivf_index(spark, root, doomed)
    assert again == {"lists_rewritten": 0, "removed_dirs": 0}


def test_ivfpq_delete_removes_codes_and_search_survives(spark, emb, tmp_path):
    from ureplicator_spark.sources.pq_index import (
        build_ivfpq_index,
        delete_from_ivfpq_index,
        search_ivfpq_index,
    )

    doomed = [r.vec_id for r in emb.select("vec_id").limit(7).collect()]
    root = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, root)
    out = delete_from_ivfpq_index(spark, root, doomed)
    assert out["lists_rewritten"] >= 1

    codes = spark.read.parquet(root + "/codes")
    assert codes.filter(F.col("vec_id").isin(doomed)).head(1) == []
    assert codes.count() == emb.count() - len(doomed)

    queries = emb.filter(~F.col("vec_id").isin(doomed)).orderBy("vec_id").limit(3)
    got = search_ivfpq_index(spark, root, queries)
    assert got.filter(F.col("c_id").isin(doomed)).head(1) == []
    assert got.head(1)

    again = delete_from_ivfpq_index(spark, root, doomed)
    assert again == {"lists_rewritten": 0, "removed_dirs": 0}


def test_chunk_index_delete_equals_rebuild_on_survivors(spark, sf_dir, tmp_path):
    from ureplicator_spark.operators.multimodal import documents_as_media
    from ureplicator_spark.sources.chunk_index import (
        build_chunk_index,
        delete_from_chunk_index,
    )

    media = documents_as_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    )
    doomed = [r.media_id for r in media.select("media_id").limit(5).collect()]

    root = str(tmp_path / "chunks")
    build_chunk_index(media, root)
    out = delete_from_chunk_index(spark, root, doomed)
    assert out["buckets_rewritten"] >= 1

    surv_root = str(tmp_path / "chunks_surv")
    build_chunk_index(media.filter(~F.col("media_id").isin(doomed)), surv_root)
    assert _rows(spark, root + "/chunks") == _rows(spark, surv_root + "/chunks")

    again = delete_from_chunk_index(spark, root, doomed)
    assert again == {"buckets_rewritten": 0, "removed_dirs": 0}


def test_media_index_delete_equals_rebuild_on_survivors(spark, sf_dir, tmp_path):
    from ureplicator_spark.operators.multimodal import documents_as_media
    from ureplicator_spark.sources.media_index import (
        _FRAME_SECTIONS,
        _SECTIONS,
        build_media_index,
        delete_from_media_index,
    )

    media = documents_as_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    )
    doomed = [r.media_id for r in media.select("media_id").limit(5).collect()]

    root = str(tmp_path / "midx")
    build_media_index(media, root)
    out = delete_from_media_index(spark, root, doomed)
    assert all(n > 0 for n in out["rows_removed"].values())

    surv_root = str(tmp_path / "midx_surv")
    build_media_index(media.filter(~F.col("media_id").isin(doomed)), surv_root)
    for section in list(_SECTIONS) + list(_FRAME_SECTIONS):
        assert _rows(spark, f"{root}/{section}") == _rows(
            spark, f"{surv_root}/{section}"
        ), section

    again = delete_from_media_index(spark, root, doomed)
    assert all(n == 0 for n in again["rows_removed"].values())


def test_minhash_index_delete_equals_rebuild_and_flags_kmv(
    spark, sf_dir, tmp_path
):
    from ureplicator_spark.sources.minhash_index import (
        build_minhash_index,
        delete_from_minhash_index,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    doomed = [r.doc_id for r in docs.select("doc_id").limit(5).collect()]

    root = str(tmp_path / "mh")
    build_minhash_index(docs, root, shingle_arrays=True)
    out = delete_from_minhash_index(spark, root, doomed)
    assert out["kmv_requires_rebuild"] is True
    assert out["band_partitions_rewritten"] >= 1
    assert all(
        out["rows_removed"][s] > 0
        for s in ("signatures", "shingle_arrays", "winnow_fingerprints")
    )

    # per-doc sections == fresh build over survivors (signatures and
    # bands and winnow are per-doc local state; shingle_arrays carries
    # corpus-order ranks so only doc-row REMOVAL is checked for it)
    surv = docs.filter(~F.col("doc_id").isin(doomed))
    surv_root = str(tmp_path / "mh_surv")
    build_minhash_index(surv, surv_root, shingle_arrays=True)
    for section in ("signatures", "bands", "winnow_fingerprints"):
        got = spark.read.parquet(f"{root}/{section}")
        assert got.filter(F.col("doc_id").isin(doomed)).head(1) == [], section
    assert sorted(
        map(tuple, spark.read.parquet(root + "/signatures").collect())
    ) == sorted(map(tuple, spark.read.parquet(surv_root + "/signatures").collect()))

    pairs = spark.read.parquet(root + "/pairs")
    assert pairs.filter(
        F.col("doc_a").isin(doomed) | F.col("doc_b").isin(doomed)
    ).head(1) == []

    again = delete_from_minhash_index(spark, root, doomed)
    assert again["band_partitions_rewritten"] == 0
    assert all(n == 0 for n in again["rows_removed"].values())
