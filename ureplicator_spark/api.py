"""Engine — the Python API mirroring the reference's REST surface
(SURVEY.md §2.10). Each GET endpoint is a DataFrame-returning method;
each POST/DELETE mutates the route/topic registry.

Controller routes → methods:
  POST/DELETE /topics[/{topic}]      → add_topic / delete_topic
  GET  /topics                       → topics()
  GET  /offset/{topic}/{partition}   → offsets()
  GET  /noprogress                   → no_progress()
  GET  /validation                   → validate() / validation_counts()
  GET  /instances                    → assignment_view()
  GET  /admin/workloadinfo           → workload() / expected_workers()
  GET/POST/DELETE /blacklist         → blacklist ops
  PUT  /ratelimiter?messagerate=     → set_rate()
  GET  /health                       → health()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ureplicator_spark import fixtures as FX
from ureplicator_spark.operators import assignment as ASG
from ureplicator_spark.operators import lag as LAG
from ureplicator_spark.operators import whitelist as WL
from ureplicator_spark.operators import workload as WKL
import threading

from ureplicator_spark.session import tune
from ureplicator_spark.streaming.replication import (
    ReplicationJob,
    Route,
    RouteRegistry,
)


class Engine:
    """Facade over a record log (Kafka or record-shaped storage) +
    route registry. ``log_df`` must expose the engine record view:
    (topic, partition, offset, ts_sec, value_size)."""

    def __init__(
        self,
        spark: SparkSession,
        log_df: DataFrame | None = None,
        analytics_dir: str | None = None,
    ) -> None:
        self.spark = tune(spark)
        self.log = log_df
        # data directory the registry queries read (GET /query/<name>)
        self.analytics_dir = analytics_dir
        self.routes = RouteRegistry(spark)
        self._topics: dict[str, dict] = {}
        self._blacklist: set[str] = set()
        self._rate: int | None = None
        self._autobalancing = True
        # The REST facade serves from ThreadingHTTPServer threads;
        # every control-plane mutation and snapshot read goes through
        # this lock so concurrent admin calls can't interleave a
        # half-applied topic/blacklist/rate update. RLock because
        # snapshot methods (topics/blacklist) are also called from
        # locked mutators' callers.
        self._mutex = threading.RLock()

    # -- autobalancing toggle (POST /admin/{enable,disable}_autobalancing,
    #    GET /admin/autobalancing_status; AdminRestletResource.java:60-89) --
    def enable_autobalancing(self) -> None:
        with self._mutex:
            self._autobalancing = True

    def disable_autobalancing(self) -> None:
        with self._mutex:
            self._autobalancing = False

    def autobalancing_status(self) -> bool:
        with self._mutex:
            return self._autobalancing

    # -- topic management (POST/DELETE /topics) ----------------------------
    def _push_topics(self) -> None:
        """Propagate the topic table to every live ControlDoc: running
        dynamic routes rename/remap with the NEW mapping and partition
        counts at their next batch — the reference's runtime topic
        expand reconciled without a restart
        (ConsumerFetcherThread.java:183-206). Counts are keyed by the
        DESTINATION topic (the P2 remap joins on dst_topic)."""
        mapping = {t: v["dst"] for t, v in self._topics.items()}
        counts = {
            v["dst"]: v["partitions"]
            for v in self._topics.values()
            if v["partitions"] is not None
        }
        for job in self.routes.jobs.values():
            if job.control is not None:
                job.control.set_topics(mapping, counts)

    def add_topic(self, topic: str, dst_topic: str | None = None, partitions: int | None = None) -> None:
        with self._mutex:
            self._topics[topic] = {"dst": dst_topic or topic, "partitions": partitions}
            self._push_topics()

    def expand_topic(self, topic: str, partitions: int) -> None:
        with self._mutex:
            if topic not in self._topics:
                raise KeyError(topic)
            self._topics[topic]["partitions"] = partitions
            self._push_topics()

    def delete_topic(self, topic: str) -> None:
        with self._mutex:
            self._topics.pop(topic, None)
            self._push_topics()

    def topics(self) -> DataFrame:
        with self._mutex:
            rows = [(t, v["dst"], v["partitions"]) for t, v in self._topics.items()]
        return self.spark.createDataFrame(
            rows or [("", "", None)], "topic string, dst_topic string, partitions int"
        )

    # -- routes (manager /topics?src=&dst=) ---------------------------------
    def add_route(self, job: ReplicationJob) -> None:
        self.routes.add(job)

    def create_route(
        self,
        src_cluster: str,
        dst_cluster: str,
        route_id: int,
        source_path: str,
        checkpoint_dir: str,
        out_path: str,
        control_path: str | None = None,
        available_now: bool = False,
    ) -> dict:
        """Create AND start a replication route from request parameters
        — the Manager's whole route-creation flow
        (TopicManagementRestletResource.java:148-221 builds the route
        from the POSTed src/dst/routeid and hands it to
        ControllerHelixManager.java:1110-1206 to instantiate), which
        until r8 existed only as the Python ``ReplicationJob`` path.

        The route starts under a LIVE ControlDoc seeded with the
        engine's current control plane (rate, blacklist, topic
        topology), so a route created over REST is immediately
        steerable by ``PUT /ratelimiter`` / ``POST /blacklist`` /
        ``PUT /topics`` with no restart — identical posture to routes
        started via ``start_dynamic`` directly. Raises ``ValueError``
        on a duplicate route name (the reference 409s).

        Concurrency/failure posture (r8 advisor): the name is RESERVED
        under the engine mutex, but the streaming-query start runs
        OUTSIDE it — a query start takes seconds and the src/
        checkpoint/out paths come straight from the untrusted REST
        body, so holding the lock would stall every other
        control-plane call behind one slow or doomed create. If the
        start fails, the reservation is rolled back so the name does
        not 409 forever for a route that never ran."""
        from ureplicator_spark.streaming.dynamic import ControlDoc

        with self._mutex:
            route = Route(
                src_cluster=src_cluster,
                dst_cluster=dst_cluster,
                route_id=int(route_id),
                topic_mapping={t: v["dst"] for t, v in self._topics.items()},
                partition_counts={
                    v["dst"]: v["partitions"]
                    for v in self._topics.values()
                    if v["partitions"] is not None
                },
            )
            if route.name in self.routes.jobs:
                raise ValueError(f"route {route.name} already exists")
            job = ReplicationJob(
                self.spark,
                route,
                checkpoint_dir=checkpoint_dir,
                source_kind="files",
                source_path=source_path,
            )
            control = ControlDoc(control_path or f"{checkpoint_dir}/control.json")
            if self._rate is not None:
                control.set_rate(self._rate)
            if self._blacklist:
                control.set_blacklist(sorted(self._blacklist))
            # reserve the name while holding the lock; start outside it
            self.routes.add(job)
        try:
            job.start_dynamic(out_path, control, available_now=available_now)
        except BaseException:
            with self._mutex:
                # drop the dead reservation (remove() also stops the
                # query defensively if the start half-succeeded)
                self.routes.remove(route.name)
            raise
        with self._mutex:
            # push current topology into the new route's doc (same
            # propagation every control-plane mutation does)
            self._push_topics()
            return {
                "route": route.name,
                "src_cluster": src_cluster,
                "dst_cluster": dst_cluster,
                "route_id": int(route_id),
                "active": bool(job.query and job.query.isActive),
            }

    # -- rate limiting (PUT /ratelimiter) -----------------------------------
    def set_rate(self, records_per_trigger: int) -> dict:
        """Set the replication rate for all routes, matching the
        reference's live Guava RateLimiter swap
        (RateLimiterResource.java:41-62, FetcherManager.java:101-123)
        wherever it can be matched:

        * Routes started with ``start_dynamic`` carry a live
          ``ControlDoc`` — the new rate is written there and the
          running query applies it at its NEXT micro-batch, no restart
          (``applied_live_routes``).
        * Option-configured routes (``maxOffsetsPerTrigger`` /
          ``maxFilesPerTrigger``) read their options at query START:
          the new rate applies to routes created afterwards, while
          running ones keep the old rate until restarted from
          checkpoint (``running_routes_pending_restart``)."""
        with self._mutex:
            self._rate = records_per_trigger
            pending, live = [], []
            for job in self.routes.jobs.values():
                job.route.max_records_per_trigger = records_per_trigger
                if job.control is not None:
                    job.control.set_rate(records_per_trigger)
                    if job.query is not None and job.query.isActive:
                        live.append(job.route.name)
                elif job.query is not None and job.query.isActive:
                    pending.append(job.route.name)
            return {
                "rate": records_per_trigger,
                "applied_to_new_routes": True,
                "applied_live_routes": sorted(live),
                "running_routes_pending_restart": sorted(pending),
            }

    # -- blacklist (GET/POST/DELETE /blacklist) ------------------------------
    def _push_blacklist(self) -> None:
        """Propagate the current blacklist to every live ControlDoc —
        running dynamic routes drop the topic at their next batch
        (P7 live, the reference's non-stop whitelist reconciliation)."""
        topics = sorted(self._blacklist)
        for job in self.routes.jobs.values():
            if job.control is not None:
                job.control.set_blacklist(topics)

    def blacklist_add(self, topic: str) -> None:
        with self._mutex:
            self._blacklist.add(topic)
            self._push_blacklist()

    def blacklist_remove(self, topic: str) -> None:
        with self._mutex:
            self._blacklist.discard(topic)
            self._push_blacklist()

    def blacklist(self) -> DataFrame:
        with self._mutex:
            rows = [(t,) for t in sorted(self._blacklist)]
        return self.spark.createDataFrame(rows or [("",)], "topic string")

    # -- analytics over the log ---------------------------------------------
    def _require_log(self) -> DataFrame:
        if self.log is None:
            raise ValueError("Engine needs log_df for analytics")
        return self.log

    def offsets(self, as_of_sec: int | None = None) -> DataFrame:
        log = self._require_log()
        latest = LAG.latest_offsets(log)
        if as_of_sec is None:
            return latest
        return LAG.consumer_lag(latest, LAG.committed_offsets(log, as_of_sec))

    def lag(self, as_of_sec: int) -> DataFrame:
        log = self._require_log()
        return LAG.consumer_lag(
            LAG.latest_offsets(log), LAG.committed_offsets(log, as_of_sec)
        )

    def no_progress(self, t1_sec: int, t2_sec: int) -> DataFrame:
        return LAG.no_progress(self._require_log(), t1_sec, t2_sec)

    def workload(self) -> DataFrame:
        return WKL.workload_windows(self._require_log())

    def instance_load(self, n_instances: int = FX.N_INSTANCES) -> DataFrame:
        return WKL.instance_load(
            WKL.partition_workload(self._require_log()), n_instances
        )

    def expected_workers(self) -> DataFrame:
        return WKL.expected_workers(self._require_log())

    def validate(self) -> DataFrame:
        return ASG.validation_counts(
            ASG.derive_assignments(self._require_log(), FX.N_INSTANCES)
        )

    def validate_by_instance(self) -> DataFrame:
        """GET /validation/instance — A9 per worker instance."""
        return ASG.validation_by_instance(
            ASG.derive_assignments(self._require_log(), FX.N_INSTANCES)
        )

    def assignment_view(self) -> DataFrame:
        return ASG.assignment_view(
            ASG.derive_assignments(self._require_log(), FX.N_INSTANCES)
        )

    def whitelist_candidates(self, dst_topics: DataFrame, exclude_regex: str = FX.EXCLUDE_REGEX) -> DataFrame:
        log = self._require_log()
        src = log.select("topic").distinct()
        current = self.topics().select("topic").filter(F.col("topic") != "")
        bl = self.blacklist().filter(F.col("topic") != "")
        return WL.whitelist_candidates(src, dst_topics, current, bl, exclude_regex)

    def workload_percentiles(self) -> DataFrame:
        """Per-topic payload-size distribution (capacity signal) —
        served from the mergeable HDR sketch (r11): bounded register
        state per topic, SUM-mergeable across partitions/windows, and
        integer-exact reads, so the endpoint answers at any log size
        without a per-topic sort (the exact interpolated twin stays in
        the gated `workload_percentiles` registry query)."""
        from ureplicator_spark.operators.sketch import hdr_quantiles, hdr_registers

        log = self._require_log()
        regs = hdr_registers(log, "value_size", ["topic"])
        # every quantile column keeps its _est suffix: all four are
        # HDR-bucket upper bounds (<= 2^-5 relative error high), NOT
        # exact order statistics — the name is the estimate contract
        return hdr_quantiles(regs, ["topic"], percentiles=(50, 95, 99, 100)).select(
            "topic",
            "p50_est",
            "p95_est",
            "p99_est",
            # hi bound of the top bucket: >= exact max, within 2^-5
            F.col("p100_est").alias("max_size_est"),
            "n_records",
        )

    # -- state backup (S12, ClusterInfoBackupManager) -------------------------
    def backup(self, base_dir: str, snapshot_id: str) -> list[str]:
        """Snapshot assignment + topic registry to JSON (daily-dump
        analog, ClusterInfoBackupManager.java:88-134)."""
        from ureplicator_spark.operators.backup import backup_state

        paths = [
            backup_state(
                ASG.derive_assignments(self._require_log(), FX.N_INSTANCES),
                base_dir, "assignments", snapshot_id,
            ),
            backup_state(self.topics(), base_dir, "topics", snapshot_id),
        ]
        return paths

    def restore(self, base_dir: str, name: str, snapshot_id: str) -> DataFrame:
        from ureplicator_spark.operators.backup import restore_state

        return restore_state(self.spark, base_dir, name, snapshot_id)

    # -- archive (replay beyond retention) ------------------------------------
    def archive(self, root: str) -> None:
        from ureplicator_spark.sources.archive import write_archive

        write_archive(self._require_log(), root)

    def replay(self, root: str, topic: str | None = None,
               date_from: str | None = None, date_to: str | None = None) -> DataFrame:
        from ureplicator_spark.sources.archive import read_archive

        return read_archive(self.spark, root, topic, date_from, date_to)

    # -- health (GET /health) -------------------------------------------------
    def health(self) -> dict:
        active = [j for j in self.routes.jobs.values() if j.query and j.query.isActive]
        return {
            "status": "OK",
            "n_topics": len(self._topics),
            "n_routes": len(self.routes.jobs),
            "n_active_queries": len(active),
            "rate_limit": self._rate,
        }

    # -- analytics passthrough (GET /query[/name]) ----------------------------
    def query_names(self) -> list[str]:
        """Every registered analytics query (SURVEY §2 inventory)."""
        from ureplicator_spark.queries import QUERIES

        return sorted(QUERIES)

    def run_query(self, name: str, limit: int = 1000) -> DataFrame:
        """Run one registered analytics query against the engine's
        configured data directory — the 'engine face' of the registry:
        a reference user's REST habit extended to the full analytic
        surface. ``limit`` caps the driver materialization (REST
        responses are control-plane-sized by contract; large results
        belong in a sink, not an HTTP body)."""
        from ureplicator_spark.queries import QUERIES

        if self.analytics_dir is None:
            raise ValueError("engine has no analytics_dir configured")
        if name not in QUERIES:
            raise KeyError(f"unknown query {name!r}")
        fn, _sql = QUERIES[name]
        return fn(self.spark, self.analytics_dir).limit(limit)

    def _pinned_rdds(self) -> dict:
        """Currently persisted RDDs, id → JavaRDD handle (read-only
        introspection — the hygiene tests gauge block-store growth
        with it)."""
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        return {e.getKey(): e.getValue() for e in jmap.entrySet().toArray()}

    def collect_query(self, name: str, limit: int = 1000) -> list:
        """``run_query`` + collect inside a cache-pin scope — the
        materializing form the REST layer uses.

        Release is OWNERSHIP-based, not global: operators persist
        shared intermediates through ``caching.pin``, which registers
        the handle with this call's thread-local ``pin_scope``; the
        scope releases exactly those handles after the collect. The
        previous implementation diffed the session-global
        ``getPersistentRDDs`` set, which under ThreadingHTTPServer /
        concurrent streaming foreachBatch handlers could unpersist
        RDDs pinned mid-job by ANOTHER thread (round-6 advisor) —
        a thread-local scope cannot, by construction, touch caches
        pinned by other threads."""
        from ureplicator_spark.caching import pin_scope

        with pin_scope():
            return self.run_query(name, limit=limit).collect()

    def collect_sql(self, query: str, limit: int = 1000) -> list:
        """``sql`` + collect. No cache hygiene needed: the statement is
        structurally restricted to read-only SELECT/WITH over the
        registered parquet views (``sql``'s subquery wrapper), so it
        can neither reach the Python operators that pin caches nor
        issue CACHE TABLE — there is nothing to release."""
        return self.sql(query, limit=limit).collect()

    def explain_query(self, name: str, mode: str = "formatted") -> str:
        """EXPLAIN for a registered query: the physical plan the engine
        would execute against its configured data directory — the
        plan-introspection face of the registry (what PLAN_REPORT.md
        audits in bulk, exposed per-query for operators). ``mode`` is
        any Spark explain mode (``simple``/``extended``/``codegen``/
        ``cost``/``formatted``)."""
        from ureplicator_spark.queries import QUERIES

        if self.analytics_dir is None:
            raise ValueError("engine has no analytics_dir configured")
        if name not in QUERIES:
            raise KeyError(f"unknown query {name!r}")
        if mode not in {"simple", "extended", "codegen", "cost", "formatted"}:
            raise ValueError(f"unknown explain mode {mode!r}")
        from ureplicator_spark.plans.inspect import plan_string

        fn, _sql = QUERIES[name]
        return plan_string(fn(self.spark, self.analytics_dir), mode=mode)

    def sql(self, query: str, limit: int = 1000) -> DataFrame:
        """Ad-hoc Spark SQL over the engine's registered tables (the
        driver fixture views) — the free-form complement of the named
        registry, completing the user-facing query language. Read-only
        by contract: only SELECT / WITH statements are accepted (a
        query service, not a DDL endpoint); results are row-capped
        like every REST response.

        Enforcement is structural, not lexical: the statement is
        wrapped as a subquery (``SELECT * FROM ( ... )``) before
        parsing, and no DML/DDL can appear inside a subquery — a
        prefix check alone is bypassable ("WITH s AS (...) INSERT
        OVERWRITE DIRECTORY ..." starts with WITH but writes files).
        The prefix check stays only for a friendlier error message."""
        if self.analytics_dir is None:
            raise ValueError("engine has no analytics_dir configured")
        head = query.lstrip().split(None, 1)
        if not head or head[0].upper() not in ("SELECT", "WITH"):
            raise ValueError("only SELECT/WITH statements are accepted")
        from ureplicator_spark.sources.parquet import register_views

        register_views(self.spark, self.analytics_dir)
        return self.spark.sql(f"SELECT * FROM (\n{query}\n) __readonly_q").limit(limit)
