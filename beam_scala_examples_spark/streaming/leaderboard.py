"""Streaming LeaderBoard (SURVEY §2.12 Q13; ``complete/game/LeaderBoard.scala:74-260``).

Two branches from one event stream:
 - team totals per fixed window with allowed lateness (X4: Beam's
   early/on-time/late composite trigger ≈ Spark update mode + watermark =
   allowedLateness, SURVEY §7.4);
 - per-user running totals on the global window with periodic firing
   (X5 ≈ unwindowed agg in update mode with a processing-time trigger).

Batch-equivalence (the safety net pinned by tests): with a watermark
covering all lateness, the final streaming state equals the batch
``q13_leaderboard_team`` / ``q11_user_score`` answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.agg import sum_cents

ALLOWED_LATENESS = "120 minutes"  # LeaderBoard.scala:155-158 default


def team_scores(events: DataFrame, window: str = "1 hour",
                lateness: str = ALLOWED_LATENESS) -> DataFrame:
    """Windowed team totals. In update mode each trigger re-emits the
    windows refined by new (possibly late) rows — the accumulating-panes
    analogue; rows later than the watermark are dropped like Beam's
    expired-lateness data."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(sum_cents("value").alias("total_score"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("team"),
            "total_score",
        )
    )


def user_scores(events: DataFrame) -> DataFrame:
    """Global-window per-user running totals (update mode): Spark re-emits
    each user's cumulative total every trigger — Beam's periodic
    processing-time firing on the global window."""
    return events.groupBy("user_id").agg(sum_cents("value").alias("total_score"))
