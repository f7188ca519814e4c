"""Opt-in live-broker end-to-end replication test.

The reference proves count preservation through a real embedded
ZK+Kafka pair (uReplicator-Worker/src/test/.../WorkerInstanceTest.java:
74-107 produces to the source topic; :131-137 asserts the destination
consumer sees every record). This sandbox has no broker, so the same
invariant is checked here ONLY when the operator points the suite at
one:

    KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_kafka_e2e.py

Requirements when opted in: a reachable broker with topic auto-admin
rights, the ``kafka-python`` client for produce/consume, and the Spark
Kafka connector on the session classpath (e.g. ``PYSPARK_SUBMIT_ARGS=
"--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>
pyspark-shell"``). Without KAFKA_BOOTSTRAP every test here is skipped
— the rest of the suite covers the replicate transform and the option
builders against file-stream analogs.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live-broker E2E is opt-in: set KAFKA_BOOTSTRAP=host:9092",
)

N_RECORDS = 200
N_PARTITIONS = 2


def _require_clients():
    try:
        from kafka import KafkaConsumer, KafkaProducer
        from kafka.admin import KafkaAdminClient, NewTopic
    except ImportError:
        pytest.skip("kafka-python not installed (needed to produce/verify)")
    return KafkaProducer, KafkaConsumer, KafkaAdminClient, NewTopic


def _require_connector(spark):
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "connector-probe").load()
    except Exception as exc:  # DATA_SOURCE_NOT_FOUND when jar missing
        if "kafka" in str(exc).lower() and "source" in str(exc).lower():
            pytest.skip("spark-sql-kafka connector not on the classpath")
        raise


def test_live_replication_preserves_counts_and_payloads(spark, tmp_path):
    """WorkerInstanceTest's invariant on a real broker: every record
    produced to the source topic arrives on the renamed destination
    topic exactly as many times (at-least-once lower bound == upper
    bound here because the run is quiescent), with payloads intact."""
    KafkaProducer, KafkaConsumer, KafkaAdminClient, NewTopic = _require_clients()
    _require_connector(spark)

    from ureplicator_spark.streaming.replication import ReplicationJob, Route

    run_id = uuid.uuid4().hex[:8]
    src, dst = f"urs-e2e-src-{run_id}", f"urs-e2e-dst-{run_id}"

    admin = KafkaAdminClient(bootstrap_servers=BOOTSTRAP)
    admin.create_topics(
        [
            NewTopic(src, num_partitions=N_PARTITIONS, replication_factor=1),
            NewTopic(dst, num_partitions=N_PARTITIONS, replication_factor=1),
        ]
    )
    try:
        producer = KafkaProducer(bootstrap_servers=BOOTSTRAP, acks="all")
        for i in range(N_RECORDS):
            producer.send(
                src,
                key=str(i % N_PARTITIONS).encode(),
                value=f"payload-{i}".encode(),
                partition=i % N_PARTITIONS,
            )
        producer.flush()

        job = ReplicationJob(
            spark,
            Route(
                src_cluster="e2e-src",
                dst_cluster="e2e-dst",
                topic_mapping={src: dst},
                partition_counts={dst: N_PARTITIONS},
            ),
            checkpoint_dir=str(tmp_path / "ckpt"),
            source_kind="kafka",
            bootstrap_servers=BOOTSTRAP,
            topics=[src],
        )
        query = job.start_kafka()
        try:
            consumer = KafkaConsumer(
                dst,
                bootstrap_servers=BOOTSTRAP,
                auto_offset_reset="earliest",
                consumer_timeout_ms=2000,
            )
            got: list[bytes] = []
            deadline = time.monotonic() + 90
            while len(got) < N_RECORDS and time.monotonic() < deadline:
                for msg in consumer:
                    got.append(msg.value)
            assert len(got) == N_RECORDS, (
                f"destination saw {len(got)}/{N_RECORDS} records"
            )
            assert sorted(got) == sorted(
                f"payload-{i}".encode() for i in range(N_RECORDS)
            )
        finally:
            query.stop()
    finally:
        admin.delete_topics([src, dst])
        admin.close()
