"""Canonical schemas.

Data plane: the Kafka record (reference: the only data unit —
uReplicator-Worker DefaultMessageTransformer.java:44-56 reads exactly
topic/partition/offset/timestamp/key/value/headers and emits the same
shape; payloads are opaque bytes, config/consumer.properties:33-34).
This is byte-for-byte the schema of Spark's built-in Kafka source.

Control plane: typed metadata beans (SURVEY.md §1.2) as small tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Spark Kafka source/sink schema (= reference ConsumerRecord surface).
KAFKA_RECORD = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# TopicPartition (uReplicator-Common TopicPartition.java:41-67)
TOPIC_PARTITION = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("pipeline", T.StringType(), True),
    ]
)

# PartitionOffsetInfo (uReplicator-Worker PartitionOffsetInfo.java:21-79)
PARTITION_OFFSET_INFO = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("fetch_offset", T.LongType(), True),
        T.StructField("consume_offset", T.LongType(), True),
        T.StructField("starting_offset", T.LongType(), True),
        T.StructField("ending_offset", T.LongType(), True),
    ]
)

# TopicWorkload (uReplicator-Common TopicWorkload.java:22-41)
TOPIC_WORKLOAD = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("bytes_per_second", T.DoubleType(), False),
        T.StructField("msgs_per_second", T.DoubleType(), False),
        T.StructField("partitions", T.IntegerType(), True),
        T.StructField("last_update", T.LongType(), True),
    ]
)

# TopicPartitionLag (uReplicator-Common modules/TopicPartitionLag.java)
TOPIC_PARTITION_LAG = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("latest_offset", T.LongType(), True),
        T.StructField("commit_offset", T.LongType(), True),
        T.StructField("lag", T.LongType(), True),
    ]
)

# Instance assignment (InstanceTopicPartitionHolder.java:30-47)
ASSIGNMENT = T.StructType(
    [
        T.StructField("instance", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("state", T.StringType(), True),  # ONLINE/OFFLINE/ERROR
        T.StructField("route", T.StringType(), True),  # "@src@dst@id"
    ]
)

TOPIC_MAPPING = T.StructType(
    [
        T.StructField("src_topic", T.StringType(), False),
        T.StructField("dst_topic", T.StringType(), False),
    ]
)

PARTITION_COUNTS = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("num_partitions", T.IntegerType(), False),
    ]
)
