"""uReplicator-Spark: a PySpark-native engine with the query and
data-processing capabilities of uber/uReplicator, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

The reference (uber/uReplicator) is a Kafka cross-cluster replication
service. Its capabilities decompose into (SURVEY.md):

1. data plane  — ordered per-partition record replication with
   transform (topic rename / partition remap / drop) and checkpointed
   offsets  → Structured Streaming Kafka source/sink + DataFrame
   transforms (``streaming/``, ``operators/replicate.py``).
2. control plane — lag / no-progress / workload / validation /
   whitelist analytics over operational metadata → DataFrame
   aggregations (``operators/``).
3. REST API surface → the :class:`Engine` Python facade (``api.py``).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"

from ureplicator_spark.session import get_spark, tune  # noqa: F401
