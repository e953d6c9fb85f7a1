"""Operational observability for the streaming job.

Reference counterpart: the service's structured logging + Sentry tee
(internal/logger/logger.go:18-139) — every batch INSERT and every
skipped row is visible to an operator.  The Spark twin is a
``StreamingQueryListener`` emitting ONE structured record per
micro-batch — rows/sec, batch duration, dead-letter reject count — to
the standard ``logging`` machinery (route to file/Sentry/anything via
handlers), and retaining the records in memory for tests and scraping.

Reject counts can't be observed from the engine's progress event (they
are a sink-side decision), so the sink reports them to the listener via
``record_rejects`` keyed by epoch id; the listener merges them into the
progress record for that batch when the event fires (progress events
fire after ``foreachBatch`` returns, so the count is always there).
"""

from __future__ import annotations

import json
import logging
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("logpump_spark.metrics")


class TechLogMetricsListener(StreamingQueryListener):
    """Per-micro-batch metrics: append one record per progress event to
    ``self.batches`` and emit it as a JSON log line."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._pending_rejects: dict[int, int] = {}
        self.batches: list[dict] = []

    # -- wiring -----------------------------------------------------
    def attach(self, spark: SparkSession) -> "TechLogMetricsListener":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def record_rejects(self, batch_id: int, n: int) -> None:
        """Called by the sink (foreachBatch) with the dead-letter row
        count of the epoch it just wrote."""
        with self._lock:
            self._pending_rejects[int(batch_id)] = int(n)

    # -- listener callbacks (listener-bus thread) -------------------
    def onQueryStarted(self, event) -> None:
        log.info(json.dumps({"event": "query_started", "id": str(event.id)}))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        batch_id = int(p.batchId)
        with self._lock:
            rejects = self._pending_rejects.pop(batch_id, 0)
        duration = dict(p.durationMs or {})
        rps = p.processedRowsPerSecond
        rec = {
            "event": "batch",
            "batch_id": batch_id,
            "input_rows": int(p.numInputRows),
            "rows_per_sec": float(rps) if rps == rps else 0.0,  # NaN -> 0
            "batch_duration_ms": int(duration.get("triggerExecution", 0)),
            "rejects": rejects,
        }
        with self._lock:
            self.batches.append(rec)
        log.info(json.dumps(rec))

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        log.info(
            json.dumps(
                {"event": "query_terminated", "id": str(event.id), "error": str(event.exception) if event.exception else None}
            )
        )
