"""Tests for operator variants not covered by the SQL oracle gate:
scale-path equivalences, approximate aggregates, backup/restore,
multimodal plumbing.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ureplicator_spark import fixtures as FX
from ureplicator_spark.operators import backup as BK
from ureplicator_spark.operators import multimodal as MM
from ureplicator_spark.operators import similarity as SIM
from ureplicator_spark.operators.text import tokens
from ureplicator_spark.sources.parquet import load_table


def test_cosine_knn_arrays_matches_relational(spark, sf_dir):
    """The zip_with production variant must equal the oracle-matched
    relational formulation row for row."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {(r.q_id, r.rank): r.c_id for r in SIM.cosine_knn(emb).collect()}
    b = {(r.q_id, r.rank): r.c_id for r in SIM.cosine_knn_arrays(emb).collect()}
    assert a == b and len(a) == 30


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """SURVEY §7 approximate-aggregate path: HLL++ vs exact distinct."""
    tok = tokens(load_table(spark, sf_dir, "documents"))
    row = tok.agg(
        F.countDistinct("token").alias("exact"),
        F.approx_count_distinct("token", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(2, 0.05 * row.exact)


def test_backup_and_restore_roundtrip(spark, sf_dir, tmp_path):
    """S12: assignment snapshot → JSON → restore with identical rows
    (FileBackUpHandler.java:37-60 analog)."""
    from ureplicator_spark.operators.assignment import derive_assignments

    asg = derive_assignments(FX.records(spark, sf_dir), FX.N_INSTANCES)
    path = BK.backup_state(asg, str(tmp_path), "assignments", "20260813")
    assert path.endswith("snapshot=20260813")
    back = BK.restore_state(spark, str(tmp_path), "assignments", "20260813")
    assert back.count() == asg.count()
    orig = {tuple(r) for r in asg.select("topic", "partition", "instance", "state").collect()}
    rest = {
        tuple(r)
        for r in back.select(
            "topic", F.col("partition").cast("int"), "instance", "state"
        ).collect()
    }
    assert orig == rest
    assert BK.list_snapshots(spark, str(tmp_path), "assignments") == ["20260813"]


def test_multimodal_decode_plumbing(spark, sf_dir):
    """mapInPandas decode stub: schema-stable, one output row per
    payload, deterministic fake features."""
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = MM.decode_features(media)
    assert feats.schema == MM.FEATURE_SCHEMA
    assert feats.count() == media.count()
    row = feats.filter(F.col("media_id") == 0).collect()[0]
    assert row.n_bytes > 0 and len(row.feature) == 3
    assert row.feature[0] == float(row.n_bytes)  # deterministic stub


def test_frame_sample_row_counts(spark, sf_dir):
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = MM.frame_sample(media, 100)
    expected = media.select(
        F.sum(F.floor((F.col("n_bytes") - 1) / 100) + 1).alias("n")
    ).collect()[0].n
    assert frames.count() == expected


def test_md5_long_matches_python(spark):
    """Portable hash sanity: Spark md5_long == python hashlib-derived."""
    from ureplicator_spark.functions import md5_long

    df = spark.createDataFrame([("hello",)], "s string").select(md5_long("s").alias("h"))
    expected = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert df.collect()[0].h == expected
