"""HTTP/REST facade over ``Engine`` — the reference's user-facing
query language (controller/rest/ControllerRestApplication.java:40-72,
AdminRestletResource.java, TopicManagementRestletResource.java).

The reference serves control-plane queries over Restlet; here the same
routes are served by a stdlib ``ThreadingHTTPServer`` (no extra
dependencies) delegating to the Engine's DataFrame methods. DataFrame
responses are materialized to JSON row lists — every endpoint returns
control-plane-sized results (O(#topics·#partitions)), never record
data, so the collect is bounded by design, exactly like the
reference's controller heap.

Routes:
  GET    /health                       → Engine.health()
  GET    /query                        → registered analytics query names
  GET    /query/{name}[?limit=N]       → run one registry query (capped rows)
  GET    /query/{name}/plan[?mode=M]   → EXPLAIN (physical plan text)
  POST   /sql {sql, limit?}            → ad-hoc SELECT over registered tables
  POST   /routes {src_cluster,dst_cluster,route_id,source_path,
                  checkpoint_dir,out_path[,control_path,available_now]}
                                        → create + start a live route
  GET    /routes                        → route registry
  GET    /routes/{r}/batches            → per-batch decision log
  DELETE /routes/{r}                    → stop + drop a route
  GET    /topics                       → topics registry
  POST   /topics        {topic,dst_topic?,partitions?} → add_topic
  PUT    /topics        {topic,partitions}             → expand_topic
  DELETE /topics/{topic}                → delete_topic
  GET    /offset/{topic}/{partition}    → one partition's latest offset
  GET    /offsets[?as_of_sec=]          → latest (or lag vs commit)
  GET    /noprogress?t1_sec=&t2_sec=    → stalled partitions
  GET    /validation                    → assignment validation counts
  GET    /instances                     → assignment view
  GET    /instances/{instance}          → one instance's assignment
  GET    /admin/workloadinfo            → windowed workload
  GET    /admin/expected_workers        → worker-count estimate
  GET    /admin/autobalancing_status    → autobalancing flag
  POST   /admin/{enable,disable}_autobalancing → toggle
  GET    /blacklist                     → blacklist rows
  POST   /blacklist     {topic}         → blacklist_add
  DELETE /blacklist/{topic}             → blacklist_remove
  PUT    /ratelimiter?messagerate=N     → set_rate
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.api import Engine


def _rows(rows: list) -> list[dict]:
    return [row.asDict(recursive=True) for row in rows]


def _df_rows(df: DataFrame) -> list[dict]:
    return _rows(df.collect())


class _Handler(BaseHTTPRequestHandler):
    engine: Engine  # set by serve()

    # -- plumbing ----------------------------------------------------------
    def log_message(self, fmt: str, *args) -> None:  # silence stderr
        pass

    def _send(self, code: int, payload) -> None:
        # default=str: analytics rows carry dates/decimals/arrays the
        # stdlib encoder rejects; stringifying is the REST-safe fallback
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        try:
            return json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError:
            return {}

    def _route(self, method: str) -> None:
        url = urlparse(self.path)
        # unquote AFTER splitting so %2F inside a segment (e.g. a route
        # name) cannot inject extra path components
        parts = [unquote(p) for p in url.path.split("/") if p]
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            handled = self._dispatch(method, parts, q)
        except (KeyError, ValueError) as e:
            self._send(404, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — a handler bug must
            # surface as HTTP 500, not kill the connection thread and
            # leave the client with a dropped socket.
            self._send(500, {"error": f"{type(e).__name__}: {e}"})
            return
        if handled is None:
            self._send(404, {"error": f"no route {method} {url.path}"})
        else:
            self._send(*handled)

    # -- routing table -----------------------------------------------------
    def _dispatch(self, method: str, parts: list[str], q: dict):
        eng = self.engine
        key = (method, parts[0] if parts else "")
        if key == ("GET", "health"):
            return 200, eng.health()
        if key == ("GET", "query"):
            if len(parts) == 1:
                return 200, {"queries": eng.query_names()}
            if len(parts) == 3 and parts[2] == "plan":
                mode = q.get("mode", "formatted")
                return 200, {
                    "query": parts[1],
                    "mode": mode,
                    "plan": eng.explain_query(parts[1], mode=mode),
                }
            limit = int(q.get("limit", "1000"))
            # collect_query releases any caches the query pinned —
            # unbounded REST traffic must not grow the block store
            return 200, _rows(eng.collect_query(parts[1], limit=limit))
        if key == ("POST", "sql"):
            b = self._body()
            return 200, _rows(eng.collect_sql(b["sql"], limit=int(b.get("limit", 1000))))
        if key == ("GET", "routes") and len(parts) == 1:
            return 200, _df_rows(eng.routes.to_df().filter(F.col("route") != ""))
        if key == ("POST", "routes"):
            # route creation over REST — the Manager flow
            # (TopicManagementRestletResource.java:148-221): build the
            # route from the request, start it live-controlled. Paths
            # (source, checkpoint, sink) come from the request body the
            # way the reference takes them from the controller config.
            b = self._body()
            try:
                created = eng.create_route(
                    src_cluster=b["src_cluster"],
                    dst_cluster=b["dst_cluster"],
                    route_id=b.get("route_id", 0),
                    source_path=b["source_path"],
                    checkpoint_dir=b["checkpoint_dir"],
                    out_path=b["out_path"],
                    control_path=b.get("control_path"),
                    available_now=bool(b.get("available_now", False)),
                )
            except ValueError as e:  # duplicate route → 409 like the ref
                return 409, {"error": str(e)}
            return 201, created
        if key == ("GET", "routes") and len(parts) == 3 and parts[2] == "batches":
            # per-batch decision log of a live dynamic route: rows
            # written, applied rate, blacklist, sleep — control-plane
            # sized by construction (one dict per micro-batch)
            job = eng.routes.jobs.get(parts[1])
            if job is None:
                raise KeyError(parts[1])
            log = job.dynamic_sink.log if job.dynamic_sink is not None else []
            return 200, {"route": parts[1], "batches": log}
        if key == ("DELETE", "routes") and len(parts) == 2:
            # route teardown: stop the streaming query (checkpoint
            # state survives — re-adding the route resumes exactly
            # where it left off) and drop it from the registry
            if parts[1] not in eng.routes.jobs:
                raise KeyError(parts[1])
            eng.routes.remove(parts[1])
            return 200, {"removed": parts[1]}
        if key == ("GET", "topics"):
            return 200, _df_rows(eng.topics().filter(F.col("topic") != ""))
        if key == ("POST", "topics"):
            b = self._body()
            eng.add_topic(b["topic"], b.get("dst_topic"), b.get("partitions"))
            return 201, {"added": b["topic"]}
        if key == ("PUT", "topics"):
            b = self._body()
            eng.expand_topic(b["topic"], b["partitions"])
            return 200, {"expanded": b["topic"], "partitions": b["partitions"]}
        if key == ("DELETE", "topics") and len(parts) == 2:
            eng.delete_topic(parts[1])
            return 200, {"deleted": parts[1]}
        if key == ("GET", "offset") and len(parts) == 3:
            rows = _df_rows(
                eng.offsets().filter(
                    (F.col("topic") == parts[1])
                    & (F.col("partition") == int(parts[2]))
                )
            )
            if not rows:
                raise KeyError(f"{parts[1]}/{parts[2]}")
            return 200, rows[0]
        if key == ("GET", "offsets"):
            as_of = q.get("as_of_sec")
            return 200, _df_rows(eng.offsets(int(as_of) if as_of else None))
        if key == ("GET", "noprogress"):
            return 200, _df_rows(
                eng.no_progress(int(q["t1_sec"]), int(q["t2_sec"]))
            )
        if key == ("GET", "validation") and parts[1:] == ["instance"]:
            return 200, _df_rows(eng.validate_by_instance())
        if key == ("GET", "validation"):
            return 200, _df_rows(eng.validate())
        if key == ("GET", "instances") and len(parts) == 2:
            rows = _df_rows(
                eng.assignment_view().filter(F.col("instance") == parts[1])
            )
            if not rows:
                raise KeyError(parts[1])
            return 200, rows[0]
        if key == ("GET", "instances"):
            return 200, _df_rows(eng.assignment_view())
        if key == ("GET", "admin") and parts[1:] == ["workloadinfo"]:
            return 200, _df_rows(eng.workload())
        if key == ("GET", "admin") and parts[1:] == ["expected_workers"]:
            rows = _df_rows(eng.expected_workers())
            if not rows:
                raise KeyError("no workload data to estimate workers from")
            return 200, rows[0]
        if key == ("GET", "admin") and parts[1:] == ["autobalancing_status"]:
            return 200, {"autobalancing": eng.autobalancing_status()}
        if key == ("POST", "admin") and parts[1:] == ["enable_autobalancing"]:
            eng.enable_autobalancing()
            return 200, {"autobalancing": True}
        if key == ("POST", "admin") and parts[1:] == ["disable_autobalancing"]:
            eng.disable_autobalancing()
            return 200, {"autobalancing": False}
        if key == ("GET", "blacklist"):
            return 200, _df_rows(eng.blacklist().filter(F.col("topic") != ""))
        if key == ("POST", "blacklist"):
            b = self._body()
            eng.blacklist_add(b["topic"])
            return 201, {"blacklisted": b["topic"]}
        if key == ("DELETE", "blacklist") and len(parts) == 2:
            eng.blacklist_remove(parts[1])
            return 200, {"unblacklisted": parts[1]}
        if key == ("PUT", "ratelimiter"):
            # Reference applies the new rate to a LIVE RateLimiter
            # (RateLimiterResource.java:41-62). Dynamic routes (live
            # ControlDoc) match that: next micro-batch, no restart.
            # Option-configured routes read options at start and are
            # listed as pending-restart (Engine.set_rate docstring).
            return 200, eng.set_rate(int(q["messagerate"]))
        return None

    def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
        self._route("GET")

    def do_POST(self) -> None:  # noqa: N802
        self._route("POST")

    def do_PUT(self) -> None:  # noqa: N802
        self._route("PUT")

    def do_DELETE(self) -> None:  # noqa: N802
        self._route("DELETE")


class RestServer:
    """Threaded REST server bound to ``Engine``. ``port=0`` picks a
    free port (tests); ``.port`` reports the bound one."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0) -> None:
        handler = type("BoundHandler", (_Handler,), {"engine": engine})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "RestServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="ureplicator-rest", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 8000) -> RestServer:
    """Start the REST facade in a background thread and return it."""
    return RestServer(engine, host, port).start()
