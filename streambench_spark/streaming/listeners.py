"""M1/A9: throughput measurement via StreamingQueryListener — the exact
semantics of the reference's Listener (SparkYahooRunner.scala:28-40,
91-113): accumulate numInputRows across progress events; throughput =
rows * 1000 / (end - start) ms, start at onQueryStarted, end at
onQueryTerminated. Documented as a lower bound, as the reference does
(SparkYahooRunner.scala:91-97: termination fires after the last batch)."""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Tracks one query. ``bind(query_id)`` pins it explicitly (events
    from concurrent queries on the session are ignored); unbound, it
    adopts the first query that starts after registration."""

    def __init__(self) -> None:
        self.rows = 0
        self.start_ms: float | None = None
        self.end_ms: float | None = None
        self.query_id: str | None = None

    def bind(self, query_id) -> None:
        self.query_id = str(query_id)

    def _mine(self, event_id) -> bool:
        return self.query_id is None or str(event_id) == self.query_id

    def onQueryStarted(self, event) -> None:
        if self._mine(event.id) and self.start_ms is None:
            if self.query_id is None:
                self.query_id = str(event.id)
            self.start_ms = time.time() * 1000

    def onQueryProgress(self, event) -> None:
        if self._mine(event.progress.id):
            self.rows += event.progress.numInputRows

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if self._mine(event.id):
            self.end_ms = time.time() * 1000

    @property
    def throughput_rows_per_s(self) -> float:
        """rows * 1000 / duration_ms — the reference's lower-bound metric."""
        if self.start_ms is None:
            return 0.0
        end = self.end_ms or (time.time() * 1000)
        dur = max(end - self.start_ms, 1.0)
        return self.rows * 1000.0 / dur


def progress_stats(query) -> list[dict]:
    """M6 analog: per-micro-batch, per-operator stats from the query's
    recentProgress — the Spark-native equivalent of StreamBox's periodic
    ``ReportStatistics`` table (sbx/EvaluationBundleContext.h:331-379).

    Returns one dict per (batch, state operator): rows in/out, rate,
    state rows, memory, and watermark-dropped rows.
    """
    out = []
    for p in query.recentProgress:
        base = {
            "batch_id": p["batchId"],
            "input_rows": p["numInputRows"],
            "rows_per_s": p.get("processedRowsPerSecond"),
            "batch_duration_ms": p.get("batchDuration"),
            "watermark": p.get("eventTime", {}).get("watermark"),
        }
        ops = p.get("stateOperators") or [{}]
        for op in ops:
            out.append(
                {
                    **base,
                    "operator": op.get("operatorName"),
                    "state_rows": op.get("numRowsTotal"),
                    "state_mem_bytes": op.get("memoryUsedBytes"),
                    "rows_dropped_by_watermark": op.get("numRowsDroppedByWatermark"),
                }
            )
    return out
