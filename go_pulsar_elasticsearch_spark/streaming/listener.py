"""Observability: streaming query metrics (reference: pkg/metrics +
health endpoints, main.go:327-364).

The reference exposes 5 Prometheus counters and /health//ready probes.
Spark equivalents:
- per-batch row counters via ``df.observe()`` (collected in a
  StreamingQueryListener, no extra pass over the data)
- liveness from ``query.status`` / ``query.lastProgress``

``health()`` mirrors the reference's HealthStatus JSON
(pkg/model/model.go:69-76): status, detail, error counts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_counters(df: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach observed metrics (received count, null-decode count) to the
    stream — evaluated inline by the engine, surfaced per batch."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("received"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0)).alias("decode_errors"),
    )


@dataclass
class MetricsListener(StreamingQueryListener):
    """Accumulates the reference's counter set from query progress."""

    received: int = 0
    decode_errors: int = 0
    progress_events: list = field(default_factory=list)
    last_error: str | None = None

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress_events.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "observed": p.get("observedMetrics", {}),
            }
        )
        for obs in p.get("observedMetrics", {}).values():
            self.received += obs.get("received", 0) or 0
            self.decode_errors += obs.get("decode_errors", 0) or 0

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if getattr(event, "exception", None):
            self.last_error = str(event.exception)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def health(self, query=None) -> dict:
        """HealthStatus-shaped dict (model.go:69-76)."""
        status = "UP"
        detail = "ok"
        if self.last_error:
            status, detail = "DOWN", self.last_error
        elif query is not None and not query.isActive:
            status, detail = "DOWN", "query inactive"
        return {
            "status": status,
            "detail": detail,
            "received": self.received,
            "decode_errors": self.decode_errors,
            "batches": len(self.progress_events),
        }
