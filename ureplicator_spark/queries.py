"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_builder, duckdb_oracle_sql) pair.

``QUERIES[name] = (fn, sql)`` where ``fn(spark, sf_dir) -> DataFrame``
and ``sql`` is ANSI SQL DuckDB runs over the same parquet views. The
driver hash-compares both result sets (order-insensitive, columns
sorted by name) — so every computed column is aliased identically on
both sides, doubles are rounded/decimal-cast identically, and only
engine-portable primitives (integer math, md5, length/substr) feed
grouping keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark import fixtures as FX
from ureplicator_spark.functions import md5_long
from ureplicator_spark.operators import assignment as ASG
from ureplicator_spark.operators import lag as LAG
from ureplicator_spark.operators import replicate as R
from ureplicator_spark.operators import whitelist as WL
from ureplicator_spark.operators import workload as WKL

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _with(*parts: str) -> str:
    """WITH cte1, cte2 ... SELECT-body (last arg is the body)."""
    *ctes, body = parts
    return "WITH " + ",\n".join(ctes) + "\n" + body


# ---------------------------------------------------------------------------
# Data plane: replicate transform (S1/S3, P1-P4, J1) over the record log
# ---------------------------------------------------------------------------

_REPLICATE_SQL = f"""
WITH {FX.RECORDS_CTE},
{FX.TOPIC_MAPPING_CTE},
{FX.PARTITION_COUNTS_CTE}
SELECT r.topic AS src_topic,
       r."partition" AS src_partition,
       r."offset" AS offset,
       COALESCE(m.dst_topic, r.topic) AS topic_out,
       CASE WHEN pc.num_partitions IS NOT NULL AND r."partition" >= 0
            THEN r."partition" % pc.num_partitions ELSE NULL END AS partition_out,
       CASE WHEN r.ts_sec <= 0 THEN NULL ELSE r.ts_sec END AS ts_out,
       r.value_size AS value_size
FROM records r
LEFT JOIN topic_mapping m ON r.topic = m.src_topic
LEFT JOIN partition_counts pc ON COALESCE(m.dst_topic, r.topic) = pc.topic
WHERE NOT r.topic = 'error'
"""


@register("replicate_transform", _REPLICATE_SQL)
def q_replicate_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename + P2 remap + P3 ts-normalize + P4 drop + J1 broadcast map."""
    rec = FX.records(spark, sf_dir)
    out = R.replicate_transform(
        rec,
        FX.topic_mapping(spark),
        FX.partition_counts(spark),
        drop_predicate=F.col("topic") == "error",
    )
    return out.select(
        F.col("topic").alias("src_topic"),
        F.col("partition").alias("src_partition"),
        F.col("offset"),
        F.col("dst_topic").alias("topic_out"),
        F.col("dst_partition").alias("partition_out"),
        F.col("ts_sec").alias("ts_out"),
        F.col("value_size"),
    )


_BOUNDED_SQL = f"""
WITH {FX.RECORDS_CTE}
SELECT topic, "partition" AS partition,
       COUNT(*) AS n_records,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset,
       CAST(SUM(value_size) AS BIGINT) AS total_bytes
FROM records
WHERE "offset" >= 100 AND "offset" < 600
GROUP BY topic, "partition"
"""


@register("bounded_replication", _BOUNDED_SQL)
def q_bounded_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/T10: bounded [start, end) per-partition replication counts."""
    rec = FX.records(spark, sf_dir)
    out = R.bounded_counts(rec, 100, 600)
    return out.withColumn("total_bytes", F.col("total_bytes").cast("long"))


# ---------------------------------------------------------------------------
# Control plane: lag / no-progress (J2, A1, A2, F6)
# ---------------------------------------------------------------------------

_COMMITTED_CTE = f"""
committed AS (
  SELECT topic, "partition", MAX("offset") AS commit_offset
  FROM records WHERE ts_sec <= {FX.SNAPSHOT_T1}
  GROUP BY topic, "partition"
)
""".strip()

_LATEST_CTE = """
latest AS (
  SELECT topic, "partition", MAX("offset") AS latest_offset
  FROM records GROUP BY topic, "partition"
)
""".strip()

_LAG_SQL = _with(
    FX.RECORDS_CTE,
    _COMMITTED_CTE,
    _LATEST_CTE,
    """
SELECT l.topic, l."partition" AS partition, l.latest_offset,
       COALESCE(c.commit_offset, -1) AS commit_offset,
       GREATEST(0, l.latest_offset - GREATEST(COALESCE(c.commit_offset, 0), 0)) AS lag
FROM latest l LEFT JOIN committed c USING (topic, "partition")
""",
)


@register("consumer_lag", _LAG_SQL)
def q_consumer_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 latest ⋈ committed + A1/F6 clamped lag per partition."""
    rec = FX.records(spark, sf_dir)
    return LAG.consumer_lag(
        LAG.latest_offsets(rec), LAG.committed_offsets(rec, FX.SNAPSHOT_T1)
    )


_NO_PROGRESS_SQL = _with(
    FX.RECORDS_CTE,
    f"""
c1 AS (SELECT topic, "partition", MAX("offset") AS commit_t1
       FROM records WHERE ts_sec <= {FX.SNAPSHOT_T1} GROUP BY topic, "partition")
""".strip(),
    f"""
c2 AS (SELECT topic, "partition", MAX("offset") AS commit_t2
       FROM records WHERE ts_sec <= {FX.SNAPSHOT_T2} GROUP BY topic, "partition")
""".strip(),
    _LATEST_CTE,
    """
SELECT l.topic, l."partition" AS partition, c2.commit_t2,
       GREATEST(0, l.latest_offset - COALESCE(c2.commit_t2, 0)) AS lag
FROM latest l
LEFT JOIN c1 USING (topic, "partition")
LEFT JOIN c2 USING (topic, "partition")
WHERE c1.commit_t1 IS NOT NULL AND c1.commit_t1 = c2.commit_t2
  AND GREATEST(0, l.latest_offset - COALESCE(c2.commit_t2, 0)) > 0
""",
)


@register("no_progress", _NO_PROGRESS_SQL)
def q_no_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: commit offset stagnant between two monitor snapshots, lag > 0."""
    rec = FX.records(spark, sf_dir)
    return LAG.no_progress(rec, FX.SNAPSHOT_T1, FX.SNAPSHOT_T2)


# ---------------------------------------------------------------------------
# Control plane: workload (A4-A8, T7)
# ---------------------------------------------------------------------------

_WINDOWS_CTE = f"""
ww AS (
  SELECT topic, ts_sec - (ts_sec % {FX.WINDOW_SEC}) AS window_start,
         ROUND(CAST(SUM(value_size) AS BIGINT) / {FX.WINDOW_SEC}.0, 6) AS bytes_per_sec,
         ROUND(COUNT(*) / {FX.WINDOW_SEC}.0, 6) AS msgs_per_sec
  FROM records GROUP BY topic, ts_sec - (ts_sec % {FX.WINDOW_SEC})
)
""".strip()

_WINDOWS_SQL = _with(FX.RECORDS_CTE, _WINDOWS_CTE, "SELECT * FROM ww")


@register("workload_windows", _WINDOWS_SQL)
def q_workload_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/T7: tumbling 10-min per-topic ingestion rates from the log."""
    return WKL.workload_windows(FX.records(spark, sf_dir))


_LOOKBACK_SEC = 25 * 3600  # reference coarse lookback (WorkloadInfoRetriever.java:59-64)

_MAX_LOOKBACK_SQL = _with(
    FX.RECORDS_CTE,
    _WINDOWS_CTE,
    "topics AS (SELECT DISTINCT topic FROM records UNION SELECT 'newtopic')",
    "h AS (SELECT MAX(window_start) AS max_ws FROM ww)",
    f"""
fresh AS (
  SELECT topic, MAX(bytes_per_sec) AS max_bytes_per_sec,
         MAX(msgs_per_sec) AS max_msgs_per_sec
  FROM ww, h WHERE window_start >= max_ws - {_LOOKBACK_SEC}
  GROUP BY topic
)
""".strip(),
    f"""
SELECT t.topic,
       COALESCE(f.max_bytes_per_sec, {FX.DEFAULT_BYTES_PER_SEC}) AS max_bytes_per_sec,
       COALESCE(f.max_msgs_per_sec, {FX.DEFAULT_MSGS_PER_SEC}) AS max_msgs_per_sec
FROM topics t LEFT JOIN fresh f USING (topic)
""",
)


@register("workload_max_lookback", _MAX_LOOKBACK_SQL)
def q_workload_max_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-topic max rate within lookback; engineered defaults else."""
    rec = FX.records(spark, sf_dir)
    topics = rec.select("topic").distinct().union(
        spark.createDataFrame([("newtopic",)], "topic string")
    ).distinct()
    return WKL.max_workload_lookback(
        WKL.workload_windows(rec), topics, _LOOKBACK_SEC
    )


_PARTITION_WL_CTE = """
partition_wl AS (
  SELECT topic, "partition",
         CAST(SUM(value_size) AS BIGINT) AS total_bytes,
         COUNT(*) AS total_msgs
  FROM records GROUP BY topic, "partition"
)
""".strip()

_SPAN_CTE = "span AS (SELECT CAST(MAX(ts_sec) - MIN(ts_sec) AS BIGINT) AS span_sec FROM records)"

_PARTITION_WL_SQL = _with(
    FX.RECORDS_CTE,
    _PARTITION_WL_CTE,
    _SPAN_CTE,
    """
SELECT topic, "partition" AS partition, total_bytes, total_msgs,
       ROUND(total_bytes / span_sec, 6) AS bytes_per_sec,
       ROUND(total_msgs / span_sec, 6) AS msgs_per_sec
FROM partition_wl, span
""",
)


@register("partition_workload", _PARTITION_WL_SQL)
def q_partition_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(topic, partition) exact totals + span rates (TopicWorkload)."""
    return WKL.partition_workload(FX.records(spark, sf_dir))


_INSTANCE_CTE = f"""
loads AS (
  SELECT 'worker-' || CAST(("partition" + length(topic)) % {FX.N_INSTANCES} AS VARCHAR) AS instance,
         CAST(SUM(total_bytes) AS BIGINT) AS total_bytes,
         CAST(SUM(total_msgs) AS BIGINT) AS total_msgs,
         COUNT(*) AS n_partitions
  FROM partition_wl GROUP BY 1
)
""".strip()

_INSTANCE_LOAD_SQL = _with(
    FX.RECORDS_CTE, _PARTITION_WL_CTE, _INSTANCE_CTE, "SELECT * FROM loads"
)


@register("instance_load", _INSTANCE_LOAD_SQL)
def q_instance_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: Σ workload per worker instance."""
    return WKL.instance_load(
        WKL.partition_workload(FX.records(spark, sf_dir)), FX.N_INSTANCES
    )


_OVERLOADED_SQL = _with(
    FX.RECORDS_CTE,
    _PARTITION_WL_CTE,
    _INSTANCE_CTE,
    "g AS (SELECT CAST(SUM(total_bytes) AS BIGINT) AS grand_bytes, COUNT(*) AS n_instances FROM loads)",
    """
SELECT instance, total_bytes, n_partitions,
       (total_bytes * n_instances * 5) > (grand_bytes * 6) AS overloaded
FROM loads, g
""",
)


@register("overloaded_instances", _OVERLOADED_SQL)
def q_overloaded_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: load > avg × 1.2, in exact integer arithmetic."""
    return WKL.overloaded_instances(
        WKL.instance_load(
            WKL.partition_workload(FX.records(spark, sf_dir)), FX.N_INSTANCES
        )
    )


_EXPECTED_WORKERS_SQL = _with(
    FX.RECORDS_CTE,
    """
g AS (SELECT CAST(SUM(value_size) AS BIGINT) AS grand_bytes,
             CAST(MAX(ts_sec) - MIN(ts_sec) AS BIGINT) AS span_sec
      FROM records)
""".strip(),
    f"""
SELECT ROUND(grand_bytes / span_sec, 6) AS total_bytes_per_sec,
       CAST(ROUND((grand_bytes / span_sec) / {float(FX.MAX_WORKLOAD_PER_WORKER)}, 0) AS INT) + 1 AS expected_workers
FROM g
""",
)


@register("expected_workers", _EXPECTED_WORKERS_SQL)
def q_expected_workers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: round(total bytes/s ÷ 8 MiB) + 1."""
    return WKL.expected_workers(FX.records(spark, sf_dir))


# ---------------------------------------------------------------------------
# Control plane: assignment / validation (A9, A10, J5, O1, O2)
# ---------------------------------------------------------------------------

_ASSIGNMENTS_CTE = f"""
assignments AS (
  SELECT topic, "partition",
         'worker-' || CAST(("partition" + length(topic)) % {FX.N_INSTANCES} AS VARCHAR) AS instance,
         CASE WHEN ("partition" + length(topic)) % 5 = 0 THEN 'ERROR'
              WHEN ("partition" + length(topic)) % 5 = 1 THEN 'OFFLINE'
              ELSE 'ONLINE' END AS state
  FROM (SELECT DISTINCT topic, "partition" FROM records)
)
""".strip()

_VALIDATION_SQL = _with(
    FX.RECORDS_CTE,
    _ASSIGNMENTS_CTE,
    'SELECT state, COUNT(*) AS n_partitions FROM assignments GROUP BY state',
)


@register("validation_counts", _VALIDATION_SQL)
def q_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: ONLINE/OFFLINE/ERROR partition counts."""
    return ASG.validation_counts(
        ASG.derive_assignments(FX.records(spark, sf_dir), FX.N_INSTANCES)
    )


_VALIDATION_BY_INSTANCE_SQL = _with(
    FX.RECORDS_CTE,
    _ASSIGNMENTS_CTE,
    'SELECT instance, state, COUNT(*) AS n_partitions FROM assignments GROUP BY instance, state',
)


@register("validation_by_instance", _VALIDATION_BY_INSTANCE_SQL)
def q_validation_by_instance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 per-instance state counts."""
    return ASG.validation_by_instance(
        ASG.derive_assignments(FX.records(spark, sf_dir), FX.N_INSTANCES)
    )


_ASSIGNMENT_VIEW_SQL = _with(
    FX.RECORDS_CTE,
    _ASSIGNMENTS_CTE,
    """
SELECT instance, COUNT(*) AS n_partitions,
       array_to_string(list_sort(list(topic || ':' || CAST("partition" AS VARCHAR))), ',') AS serving
FROM assignments GROUP BY instance
""",
)


@register("assignment_view", _ASSIGNMENT_VIEW_SQL)
def q_assignment_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-instance canonical serving list."""
    return ASG.assignment_view(
        ASG.derive_assignments(FX.records(spark, sf_dir), FX.N_INSTANCES)
    )


_IDEAL_VS_ACTUAL_SQL = _with(
    FX.RECORDS_CTE,
    _ASSIGNMENTS_CTE,
    "ideal AS (SELECT topic, \"partition\", instance FROM assignments)",
    "actual AS (SELECT topic, \"partition\", instance AS actual_instance FROM assignments WHERE state <> 'ERROR')",
    """
SELECT topic, "partition" AS partition,
       CASE WHEN i.instance IS NULL THEN 'missing-in-ideal'
            WHEN a.actual_instance IS NULL THEN 'missing-in-external-view'
            WHEN i.instance <> a.actual_instance THEN 'instance-mismatch'
            ELSE 'match' END AS status
FROM ideal i FULL JOIN actual a USING (topic, "partition")
WHERE CASE WHEN i.instance IS NULL THEN 'missing-in-ideal'
           WHEN a.actual_instance IS NULL THEN 'missing-in-external-view'
           WHEN i.instance <> a.actual_instance THEN 'instance-mismatch'
           ELSE 'match' END <> 'match'
""",
)


@register("ideal_vs_actual", _IDEAL_VS_ACTUAL_SQL)
def q_ideal_vs_actual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: IdealState vs ExternalView full-outer mismatch set."""
    return ASG.ideal_vs_actual(
        ASG.derive_assignments(FX.records(spark, sf_dir), FX.N_INSTANCES)
    )


_TOP_PARTITIONS_SQL = _with(
    FX.RECORDS_CTE,
    _PARTITION_WL_CTE,
    """
SELECT topic, "partition" AS partition, total_bytes, rank FROM (
  SELECT topic, "partition", total_bytes,
         ROW_NUMBER() OVER (ORDER BY total_bytes DESC, topic, "partition") AS rank
  FROM partition_wl
) WHERE rank <= 5
""",
)


@register("top_partitions_by_workload", _TOP_PARTITIONS_SQL)
def q_top_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3: heaviest partitions first (deterministic total order)."""
    return ASG.top_partitions_by_workload(
        WKL.partition_workload(FX.records(spark, sf_dir)), 5
    )


_LEAST_LOADED_SQL = _with(
    FX.RECORDS_CTE,
    _PARTITION_WL_CTE,
    _INSTANCE_CTE,
    """
SELECT instance, total_bytes, n_partitions,
       ROW_NUMBER() OVER (ORDER BY total_bytes ASC, n_partitions ASC, instance) AS pick_order
FROM loads
""",
)


@register("least_loaded_ranking", _LEAST_LOADED_SQL)
def q_least_loaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: greedy assigner's instance preference order."""
    return ASG.least_loaded_ranking(
        WKL.instance_load(
            WKL.partition_workload(FX.records(spark, sf_dir)), FX.N_INSTANCES
        )
    )


# ---------------------------------------------------------------------------
# Control plane: whitelist set algebra (U1-U3, J3, J4, P7)
# ---------------------------------------------------------------------------

_WHITELIST_SQL = _with(
    FX.RECORDS_CTE,
    FX.SRC_EXTRA_TOPICS_CTE,
    FX.DST_TOPICS_CTE,
    FX.TOPIC_MAPPING_CTE,
    FX.BLACKLIST_CTE,
    "src_topics AS (SELECT DISTINCT topic FROM records UNION SELECT topic FROM src_extra_topics)",
    "current_wl AS (SELECT src_topic AS topic FROM topic_mapping)",
    f"""
SELECT topic FROM (
  SELECT topic FROM src_topics INTERSECT SELECT topic FROM dst_topics
) cand
WHERE topic NOT IN (SELECT topic FROM current_wl)
  AND topic NOT IN (SELECT topic FROM blacklist)
  AND NOT regexp_matches(topic, '{FX.EXCLUDE_REGEX}')
""",
)


@register("whitelist_candidates", _WHITELIST_SQL)
def q_whitelist_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2/J3/P7: (src ∩ dst) − whitelisted − blacklist − regex."""
    rec = FX.records(spark, sf_dir)
    src = rec.select("topic").distinct().union(FX.src_extra_topics(spark)).distinct()
    current = FX.topic_mapping(spark).select(F.col("src_topic").alias("topic"))
    return WL.whitelist_candidates(
        src, FX.dst_topics(spark), current, FX.blacklist(spark), FX.EXCLUDE_REGEX
    )


_MISMATCH_SQL = _with(
    FX.PARTITION_COUNTS_CTE,
    f"SELECT topic, num_partitions FROM partition_counts WHERE num_partitions <> {FX.N_SRC_PARTITIONS}",
)


@register("partition_count_mismatch", _MISMATCH_SQL)
def q_partition_count_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: destination topics whose partition count ≠ source count."""
    return WL.partition_count_mismatch(FX.partition_counts(spark), FX.N_SRC_PARTITIONS)


# ---------------------------------------------------------------------------
# Scalar functions (F1, F3, F4, F5)
# ---------------------------------------------------------------------------

_ROUTES = ["@sjc1a@sjc1-agg1@0", "@sjc1a@dca1a@1", "@dca2@dca3@0"]

_ROUTE_PARSE_SQL = (
    "SELECT route, split_part(route, '@', 2) AS src, split_part(route, '@', 3) AS dst, "
    "CAST(split_part(route, '@', 4) AS INT) AS route_id, "
    "substr(split_part(route, '@', 2), 1, 3) = substr(split_part(route, '@', 3), 1, 3) AS same_region "
    "FROM (VALUES " + ", ".join(f"('{r}')" for r in _ROUTES) + ") AS t(route)"
)


@register("route_parse", _ROUTE_PARSE_SQL)
def q_route_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 route string parse + F4 same-region prefix test."""
    from ureplicator_spark.functions import route_parse, same_region

    routes = spark.createDataFrame([(r,) for r in _ROUTES], "route string")
    parsed = routes.select("route", *route_parse("route"))
    return parsed.select(
        "route", "src", "dst", "route_id", same_region("src", "dst").alias("same_region")
    )


_FETCHER_SQL = _with(
    FX.RECORDS_CTE,
    f"""
SELECT topic, "partition" AS partition,
       CAST((('0x' || substr(md5(topic || '-' || CAST("partition" AS VARCHAR)), 1, 15))::BIGINT) % {FX.N_INSTANCES} AS INT) AS fetcher_id
FROM (SELECT DISTINCT topic, "partition" FROM records)
""",
)


@register("fetcher_routing", _FETCHER_SQL)
def q_fetcher_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: hash(topic-partition) % numFetchers thread routing (portable md5)."""
    tp = FX.records(spark, sf_dir).select("topic", "partition").distinct()
    key = F.concat_ws("-", F.col("topic"), F.col("partition").cast("string"))
    return tp.select(
        "topic",
        "partition",
        F.pmod(md5_long(key), F.lit(FX.N_INSTANCES)).cast("int").alias("fetcher_id"),
    )


_JSON_SQL = _with(
    FX.RECORDS_CTE,
    """
SELECT topic,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM records GROUP BY topic
""",
)


@register("json_payload_extract", _JSON_SQL)
def q_json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON payload field extraction + aggregation."""
    rec = FX.records(spark, sf_dir)
    return rec.groupBy("topic").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("long").alias("sum_k"),
        F.count("*").alias("n"),
    )
