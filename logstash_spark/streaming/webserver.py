"""Monitoring HTTP API: serve node stats over HTTP like the reference.

Reference: logstash-core/lib/logstash/webserver.rb (Puma serving the API
app on ports 9600-9700, webserver.rb:32 ``DEFAULT_PORTS``), endpoint
modules logstash-core/lib/logstash/api/modules/{root,node,node_stats}.rb,
metric names logstash-core/src/main/java/org/logstash/instrument/metrics/
MetricKeys.java:89-111.  This is how every ops/monitoring stack scrapes a
running node (``GET /_node/stats``).

The Spark-native shape: the stats themselves come from Spark's
StreamingQueryProgress events, folded by ``listener.node_stats`` into the
reference's pipeline payload — the webserver is a thin stdlib
``http.server`` thread over that fold, reading the listener's JSONL on
each request so a scrape always sees the latest completed micro-batch.
Nothing here touches the hot path: metrics flow driver-side only.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from logstash_spark.streaming.listener import node_stats

#: webserver.rb:32 — the reference binds the first free port in 9600-9700.
DEFAULT_PORTS = range(9600, 9701)


def _build_handler(server: "MonitoringServer"):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # silence per-request stderr
            pass

        def _respond(self, payload: dict, status: int = 200) -> None:
            body = json.dumps(payload, indent=2).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            path = self.path.split("?", 1)[0].rstrip("/") or "/"
            if path == "/":
                # api/modules/root.rb — node banner + status
                self._respond({**server.node_info(),
                               "status": server.status(),
                               "tagline": "you know, for analytics"})
            elif path == "/_node":
                # api/modules/node.rb — node info (pipelines listed)
                stats = server.stats()
                self._respond({**server.node_info(),
                               "pipelines": {
                                   qid: {"batches": p["batches"],
                                         "status": p["status"]}
                                   for qid, p in stats["pipelines"].items()}})
            elif path in ("/_node/stats", "/_node/stats/pipelines"):
                # api/modules/node_stats.rb — the scrape target: events
                # in/out, flow rates (current+lifetime), state rows,
                # watermark, per-pipeline
                stats = server.stats()
                events = {"in": 0, "out": 0, "duration_in_millis": 0}
                for p in stats["pipelines"].values():
                    for k in events:
                        events[k] += p["events"][k]
                self._respond({**server.node_info(), "events": events,
                               "pipelines": stats["pipelines"],
                               "status": server.status()})
            elif path == "/_node/hot_threads":
                # api/modules/node.rb GET /hot_threads — the reference
                # dumps the busiest JVM threads; here both sides of the
                # engine: driver Python threads and (when a SparkSession
                # was attached) JVM threads via py4j.
                self._respond({"hot_threads": server.hot_threads()})
            elif path.startswith("/_node/stats/pipelines/"):
                pid = path.rsplit("/", 1)[1]
                stats = server.stats()
                if pid not in stats["pipelines"]:
                    self._respond({"error": f"pipeline {pid} not found"},
                                  status=404)
                else:
                    self._respond(
                        {"pipelines": {pid: stats["pipelines"][pid]}})
            else:
                self._respond({"error": f"no handler for {self.path}"},
                              status=404)

    return Handler


class MonitoringServer:
    """Serve ``node_stats(metrics_path)`` over HTTP on a daemon thread.

    ``port=0`` binds an ephemeral port (tests); ``port=None`` walks the
    reference's 9600-9700 range and binds the first free one, exactly the
    webserver.rb:32 behavior.  Use as a context manager or call
    ``start()``/``stop()``.
    """

    def __init__(self, metrics_path: str, host: str = "127.0.0.1",
                 port: int | None = None, name: str = "logstash_spark",
                 spark=None):
        self.metrics_path = metrics_path
        self.host = host
        self.name = name
        self.spark = spark  # optional: enables JVM threads in hot_threads
        self._requested_port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- payload builders (read the JSONL fresh per request) ----------------

    def stats(self) -> dict:
        try:
            return node_stats(self.metrics_path)
        except FileNotFoundError:
            return {"pipelines": {}}

    def status(self) -> str:
        pipes = self.stats()["pipelines"]
        if not pipes:
            return "yellow"  # up, nothing flowing yet
        return "green" if any(p["status"] == "running"
                              for p in pipes.values()) else "yellow"

    def node_info(self) -> dict:
        return {"name": self.name, "host": self.host,
                "http_address": f"{self.host}:{self.port}"}

    def hot_threads(self) -> list[dict]:
        """node.rb GET /hot_threads analog: driver Python threads always;
        JVM threads too when a SparkSession was attached (driver-side
        only — executor hot threads live in the Spark UI/REST API on a
        real cluster)."""
        import sys
        import traceback

        frames = sys._current_frames()
        out = []
        for t in threading.enumerate():
            fr = frames.get(t.ident)
            out.append({
                "name": t.name, "side": "python",
                "daemon": t.daemon, "alive": t.is_alive(),
                "stack": traceback.format_stack(fr)[-5:] if fr else [],
            })
        if self.spark is not None:
            try:
                jvm = self.spark.sparkContext._jvm
                it = (jvm.java.lang.Thread.getAllStackTraces()
                      .entrySet().iterator())
                while it.hasNext():
                    e = it.next()
                    th = e.getKey()
                    stack = [str(f) for f in e.getValue()][:5]
                    out.append({"name": th.getName(), "side": "jvm",
                                "state": str(th.getState()),
                                "stack": stack})
            except Exception:  # noqa: BLE001 — stats must not take the
                pass           # API down if the JVM is busy/shutting down
        return out

    # -- lifecycle ----------------------------------------------------------

    @property
    def port(self) -> int | None:
        return self._httpd.server_address[1] if self._httpd else None

    def start(self) -> "MonitoringServer":
        handler = _build_handler(self)
        if self._requested_port is not None:
            self._httpd = ThreadingHTTPServer(
                (self.host, self._requested_port), handler)
        else:
            err = None
            for p in DEFAULT_PORTS:
                try:
                    self._httpd = ThreadingHTTPServer((self.host, p), handler)
                    break
                except OSError as e:  # port taken — walk the range
                    err = e
            if self._httpd is None:
                raise OSError(
                    f"no free port in {DEFAULT_PORTS.start}-"
                    f"{DEFAULT_PORTS.stop - 1}") from err
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="monitoring-api",
            daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "MonitoringServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
