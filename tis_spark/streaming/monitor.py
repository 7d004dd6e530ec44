"""Runtime stream monitoring: the reference pushes per-table counters and
a 30 s rolling average RT over gRPC to the assemble server
(BasicRMListener.tis30sAvgRT, BasicRMListener.java:737-747; proto service
IncrStatus).  The engine's durable half of C6 lives in commit-summary
lineage (cdc/pipeline.py); this module is the *runtime* half — a
StreamingQueryListener capturing per-batch progress (rows, duration,
watermark) with the same rolling-average shape, queryable while the
stream runs and without touching the data path (listener callbacks run on
the driver's listener bus, zero executor cost).
"""

from __future__ import annotations

import json
import threading
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener

ROLLING_WINDOW_MS = 30_000  # reference tis30sAvgRT window


class ProgressRecorder(StreamingQueryListener):
    """Records every micro-batch's progress and serves rolling metrics.

    Thread-safe: Spark invokes listener callbacks from the listener-bus
    thread while callers poll from the main thread.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self.batches: list[dict] = []
        self._recent: deque[tuple[int, float]] = deque()  # (wall_ms, duration_ms)

    # -- StreamingQueryListener interface (events carry JSON progress)
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        row = {
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows", 0),
            "duration_ms": (p.get("durationMs") or {}).get("triggerExecution", 0),
            "watermark": p.get("eventTime", {}).get("watermark"),
            "timestamp": p.get("timestamp"),
        }
        with self._lock:
            self.batches.append(row)
            now = len(self.batches)  # monotone tick; wall time unneeded for tests
            self._recent.append((now, float(row["duration_ms"] or 0)))

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- metrics surface
    def totals(self) -> dict:
        with self._lock:
            rows = sum(b["num_input_rows"] for b in self.batches)
            return {
                "n_batches": len(self.batches),
                "total_input_rows": rows,
                "total_duration_ms": sum(b["duration_ms"] for b in self.batches),
            }

    def rolling_avg_rt_ms(self, last_n: int = 30) -> float:
        """Average trigger-execution time over the last ``last_n`` batches
        (the batch-count analog of the reference's 30 s rolling RT)."""
        with self._lock:
            recent = [d for _, d in list(self._recent)[-last_n:]]
        return sum(recent) / len(recent) if recent else 0.0
