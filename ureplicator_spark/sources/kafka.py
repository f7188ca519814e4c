"""Kafka source/sink option builders.

Mirrors the reference's engineered configs (BASELINE.md):
  * ordering: ``max.in.flight.requests.per.connection=1``,
    ``acks=all``, unbounded retries (ProducerThread.java:84-88) — the
    reference logs that overriding these risks reordering/data loss.
  * throughput: ``batch.size=262144``, ``linger.ms=1000``
    (config/producer.properties:38-39).
  * S2 manual assignment + seek → ``assign`` + per-partition
    ``startingOffsets`` JSON; S3 bounded scan → ``endingOffsets``.
  * T4 rate limit → ``maxOffsetsPerTrigger`` (per-trigger row cap).

The container has no Kafka broker or connector jar, so these builders
are exercised by unit tests on the option dicts; on a real cluster
pass ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
"""

from __future__ import annotations

import json

# Reference producer defaults (ProducerThread.java:84-88; producer.properties)
ORDERING_SINK_OPTIONS = {
    "kafka.max.in.flight.requests.per.connection": "1",
    "kafka.acks": "all",
    "kafka.retries": str(2**31 - 1),
    "kafka.batch.size": "262144",
    "kafka.linger.ms": "1000",
    "kafka.buffer.memory": "167772160",
}


def source_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    pattern: str | None = None,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: dict[str, dict[str, int]] | str = "earliest",
    ending_offsets: dict[str, dict[str, int]] | str | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Build Kafka source options (S1/S2/S3/T4/T9).

    Exactly one of ``topics`` (subscribe), ``pattern``
    (subscribePattern — T9 dynamic topic pickup), ``assign`` (S2 manual
    assignment) must be given.
    """
    if sum(x is not None for x in (topics, pattern, assign)) != 1:
        raise ValueError("exactly one of topics/pattern/assign required")
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics is not None:
        opts["subscribe"] = ",".join(topics)
    if pattern is not None:
        opts["subscribePattern"] = pattern
    if assign is not None:
        opts["assign"] = json.dumps(assign)
    opts["startingOffsets"] = (
        starting_offsets if isinstance(starting_offsets, str) else json.dumps(starting_offsets)
    )
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets if isinstance(ending_offsets, str) else json.dumps(ending_offsets)
        )
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def sink_options(bootstrap_servers: str, preserve_order: bool = True) -> dict[str, str]:
    """Kafka sink options with the reference's ordering contract (T2)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if preserve_order:
        opts.update(ORDERING_SINK_OPTIONS)
    return opts


def starting_offsets_json(checkpoints: dict[tuple[str, int], int]) -> str:
    """S8→S2 bridge: per-(topic, partition) committed offsets → the
    Kafka source's startingOffsets JSON ({"topic": {"0": 1234}})."""
    out: dict[str, dict[str, int]] = {}
    for (topic, partition), offset in checkpoints.items():
        out.setdefault(topic, {})[str(partition)] = offset
    return json.dumps(out)
