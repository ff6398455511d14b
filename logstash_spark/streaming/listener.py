"""Flow-metrics analog: StreamingQueryListener -> JSONL metrics/lineage log.

Reference: Logstash captures input/filter/output throughput, worker
utilization and queue backpressure every 5 s
(logstash-core/src/main/java/org/logstash/instrument/metrics/
MetricKeys.java:89-111, FlowMetric.java:31-50) and serves them over HTTP.

Spark's StreamingQueryProgress already carries the equivalents —
processedRowsPerSecond (throughput), stateOperators (aggregate filter
state), per-source startOffset/endOffset (the per-partition lineage the
north rule asks for).  This listener persists each progress event as one
JSON line so a run is fully reconstructable: which offsets fed which epoch
at what rate.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class FlowMetricsListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def _write(self, record: dict) -> None:
        with self._lock, open(self.out_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id),
                     "runId": str(event.runId), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write({
            "event": "progress",
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            # per-partition lineage: source offsets for this epoch
            "sources": [
                {"description": s.description,
                 "startOffset": s.startOffset, "endOffset": s.endOffset,
                 "numInputRows": s.numInputRows}
                for s in p.sources
            ],
            "stateOperators": [
                {"operatorName": getattr(s, "operatorName", ""),
                 "numRowsTotal": s.numRowsTotal,
                 "numRowsUpdated": s.numRowsUpdated}
                for s in p.stateOperators
            ],
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
        })

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id),
                     "exception": event.exception})


# ---------------------------------------------------------------------------
# node-stats view (reference: logstash-core/lib/logstash/webserver.rb serves
# GET /_node/stats; metric names MetricKeys.java:89-111, flow rates
# FlowMetric.java:31-50 with `current` and `lifetime` retention windows)
# ---------------------------------------------------------------------------

def node_stats(metrics_path: str) -> dict:
    """Fold the listener's JSONL into the reference's ``_node/stats``
    pipeline shape — the queryable view every ops team consumes:

    ``{"pipelines": {<query id>: {
        "events":  {"in", "out", "duration_in_millis"},
        "flow":    {"input_throughput" | "filter_throughput" |
                    "output_throughput": {"current", "lifetime"},
                    "queue_backpressure": {"current", "lifetime"}},
        "state":   {"rows_total", "rows_updated"},     # aggregate filters
        "batches": N, "watermark": <last>, "status": running|terminated}}}``

    Mapping notes: Spark's micro-batch engine has no separate per-plugin
    meters, so input==filter==output throughput (a batch either fully
    commits or retries — there is no intra-pipeline loss to meter);
    ``queue_backpressure`` is the reference's blocked-push-time ratio,
    proxied here by how far arrival rate outruns processing rate
    (max(0, 1 - processed/input) — 0 when the sink keeps up, ->1 as the
    queue falls behind).  ``lifetime`` rates are total rows / total
    trigger time, ``current`` is the last batch's rate — the two retention
    windows the reference always reports.
    """
    import json as _json

    pipelines: dict[str, dict] = {}
    with open(metrics_path, encoding="utf-8") as f:
        for line in f:
            rec = _json.loads(line)
            qid = rec.get("id", "?")
            p = pipelines.setdefault(qid, {
                "events": {"in": 0, "out": 0, "duration_in_millis": 0},
                "flow": {}, "state": {}, "batches": 0,
                "watermark": None, "status": "running",
                "_last_in_rate": 0.0, "_last_proc_rate": 0.0,
                "_bp_num": 0.0, "_bp_den": 0,
            })
            if rec["event"] == "progress":
                n = rec.get("numInputRows") or 0
                dur = (rec.get("durationMs") or {}).get("triggerExecution", 0)
                p["events"]["in"] += n
                p["events"]["out"] += n
                p["events"]["duration_in_millis"] += dur
                p["batches"] += 1
                p["watermark"] = rec.get("watermark") or p["watermark"]
                in_rate = rec.get("inputRowsPerSecond") or 0.0
                proc_rate = rec.get("processedRowsPerSecond") or 0.0
                p["_last_in_rate"], p["_last_proc_rate"] = in_rate, proc_rate
                if in_rate > 0:
                    p["_bp_num"] += max(0.0, 1.0 - proc_rate / in_rate)
                    p["_bp_den"] += 1
                for s in rec.get("stateOperators") or []:
                    p["state"] = {"rows_total": s.get("numRowsTotal"),
                                  "rows_updated": s.get("numRowsUpdated")}
            elif rec["event"] == "terminated":
                p["status"] = "terminated"

    for p in pipelines.values():
        secs = p["events"]["duration_in_millis"] / 1000.0
        lifetime = p["events"]["in"] / secs if secs > 0 else 0.0
        rate = {"current": p.pop("_last_proc_rate"), "lifetime": lifetime}
        in_rate = p.pop("_last_in_rate")
        bp_cur = (max(0.0, 1.0 - rate["current"] / in_rate)
                  if in_rate > 0 else 0.0)
        bp_num, bp_den = p.pop("_bp_num"), p.pop("_bp_den")
        bp_life = bp_num / bp_den if bp_den else 0.0
        p["flow"] = {
            "input_throughput": dict(rate),
            "filter_throughput": dict(rate),
            "output_throughput": dict(rate),
            "queue_backpressure": {"current": bp_cur, "lifetime": bp_life},
        }
    return {"pipelines": pipelines}


def node_stats_df(spark, metrics_path: str):
    """node_stats flattened to a DataFrame (one row per pipeline) so ops
    dashboards can query it with SQL like any other table."""
    stats = node_stats(metrics_path)
    rows = []
    for qid, p in stats["pipelines"].items():
        rows.append((
            qid, p["status"], p["batches"],
            p["events"]["in"], p["events"]["duration_in_millis"],
            p["flow"]["input_throughput"]["current"],
            p["flow"]["input_throughput"]["lifetime"],
            p["flow"]["queue_backpressure"]["current"],
            p["flow"]["queue_backpressure"]["lifetime"],
            p["state"].get("rows_total"), p["watermark"],
        ))
    return spark.createDataFrame(rows, (
        "pipeline_id string, status string, batches long, events_in long, "
        "duration_in_millis long, throughput_current double, "
        "throughput_lifetime double, backpressure_current double, "
        "backpressure_lifetime double, state_rows_total long, "
        "watermark string"))
