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
