"""Stream-stream joins.

The reference never joins two unbounded inputs (SURVEY §2.4 tops out at
CoGroupByKey over bounded sides); this module adds the Structured
Streaming capability a production event pipeline needs at ingest:
correlating two live event streams on a key plus an event-time interval
— click-to-purchase attribution being the canonical shape.

Semantics and scale posture:
 - Both sides carry watermarks; the time-interval predicate bounds how
   long either side's rows stay in the join state store, so state is
   O(key-rate × window), not O(stream length).  Without the interval
   bound Spark would keep every row forever — the join condition IS the
   retention policy.
 - Inner joins emit eagerly as matches arrive (no watermark wait), so a
   bounded replay's final output equals the batch interval join exactly
   — pinned by ``tests/test_streaming.py::test_stream_stream_interval_join``
   against the same DuckDB oracle as the batch twin
   (``queries/temporal.py::events_clicks_before_purchase``).
 - The shuffle keys on user_id on both sides — same single-shuffle
   profile as the batch form; skewed users are AQE's problem per
   micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import epoch_us

CLICK_TYPE = "click"
PURCHASE_TYPE = "purchase"


def clicks_before_purchases(
    events: DataFrame,
    window: str = "1 HOUR",
    lateness: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Every (purchase, click) pair for the same user where the click
    happened within ``window`` before (or at) the purchase — the
    stream-stream interval self-join.

    ``events`` is one unbounded stream (event_id, ts, user_id,
    event_type, ...); both sides are filtered views of it, which Spark
    plans as a genuine stream-stream join (two state stores, one
    exchange per side).

    ``how="left_outer"`` keeps click-less purchases with null click
    columns.  Outer rows emit only once the watermark passes the end of
    a purchase's attribution window (Spark must prove no match can
    still arrive) — and the join's global watermark is the MIN of the
    two sides' watermarks (``spark.sql.streaming.multipleWatermarkPolicy``
    default), so BOTH streams must keep flowing for null rows to flush.
    On a bounded replay the tail of the stream therefore needs
    sentinels on both sides across two micro-batches (advance, then
    evict) before its unmatched purchases surface — the streaming test
    feeds them; an unbounded production stream advances naturally.
    """
    clicks = (
        events.filter(F.col("event_type") == CLICK_TYPE)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", lateness)
    )
    purchases = (
        events.filter(F.col("event_type") == PURCHASE_TYPE)
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", lateness)
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.click_user_id)
        & (clicks.click_ts <= purchases.ts)
        & (clicks.click_ts > purchases.ts - F.expr(f"INTERVAL {window}")),
        how,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        (epoch_us("ts") - epoch_us("click_ts")).alias("gap_us"),
    )
