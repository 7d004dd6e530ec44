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


class ProgressRecorder(StreamingQueryListener):
    """Records micro-batch progress and serves rolling metrics.

    Per-batch rows are kept in a bounded deque (``keep_last`` newest —
    a stream running for weeks must not grow driver memory), while the
    totals are running counters so they stay exact regardless of the
    window.  Thread-safe: Spark invokes callbacks from the listener-bus
    thread while callers poll from the main thread.
    """

    def __init__(self, keep_last: int = 10_000):
        self._lock = threading.Lock()
        self.batches: deque[dict] = deque(maxlen=keep_last)
        self._n = 0
        self._rows = 0
        self._duration_ms = 0

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
            self._n += 1
            self._rows += int(row["num_input_rows"] or 0)
            self._duration_ms += int(row["duration_ms"] or 0)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- metrics surface
    def totals(self) -> dict:
        with self._lock:
            return {
                "n_batches": self._n,
                "total_input_rows": self._rows,
                "total_duration_ms": self._duration_ms,
            }

    def rolling_avg_rt_ms(self, last_n: int = 30) -> float:
        """Average trigger-execution time over the last ``last_n`` batches
        (the batch-count analog of the reference's 30 s rolling RT)."""
        with self._lock:
            recent = [b["duration_ms"] for b in list(self.batches)[-last_n:]]
        return sum(recent) / len(recent) if recent else 0.0
