"""Streaming observability: per-batch progress metrics as data.

The reference surfaces only driver-side counters (SURVEY §2.9 M1-M4);
a production stream needs per-micro-batch throughput/lag visibility.
``ProgressRecorder`` wraps Spark's StreamingQueryListener and keeps one
row per finished micro-batch — rows in, processed rate, batch duration,
state-store rows — the relation an ops dashboard or alerting rule
consumes.  The recorder holds O(batches) tiny dicts on the driver (the
progress events are already driver-side in Spark's design); nothing is
added to the executor path.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects (batch_id, num_input_rows, duration_ms, state_rows) per
    completed micro-batch for the queries it is attached to."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        self.batches.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "state_rows": state_rows,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
