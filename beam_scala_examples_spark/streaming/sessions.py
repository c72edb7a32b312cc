"""Streaming sessionization: the production (unbounded) form of
``queries/behavior.py::events_sessions``.

W3 applied to the engine's own event log: ``session_window`` holds one
open session per (user, gap) in the state store, merges on arrival, and
emits a session exactly once — in append mode — when the watermark
passes its end (last event + gap).  At scale the state is O(open
sessions), keyed by user_id; lateness is the watermark delay.  Late
events: each micro-batch merges its input into session state FIRST and
evicts/emits closed sessions after, so a late event landing in the same
batch where the watermark passes its session's end still merges, while
one arriving after the state was evicted is dropped outright — no
re-fire, no fragment session (the Beam allowed-lateness re-fire has no
append-mode equivalent — SURVEY §7.4, same caveat as X2; pinned by
``test_streaming_sessions_drop_late_after_eviction``).

Batch equivalence is pinned by
``tests/test_streaming.py::test_streaming_sessions_match_batch`` against
the same DuckDB gaps-and-islands oracle as the batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import epoch_us


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    lateness: str = "0 seconds",
) -> DataFrame:
    """(user_id, session_start_us, n_events, duration_us) per closed
    session — schema-identical to the batch ``events_sessions``."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            epoch_us("first_ts").alias("session_start_us"),
            "n_events",
            (epoch_us("last_ts") - epoch_us("first_ts")).alias("duration_us"),
        )
    )
