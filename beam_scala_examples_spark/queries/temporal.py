"""Temporal / interval join queries over the events and orders tables.

Two operators Spark lacks natively, built scale-first
(``operators/asof.py``, ``operators/rangejoin.py``) and pinned here
against genuinely different oracle algorithms (DuckDB LATERAL pick /
non-equi interval join — not a restatement of the engine's plan):

 - ``events_asof_click``: for every purchase event, the same user's
   latest *prior* click (strict as-of, left-outer).  One shuffle on
   user_id, one per-partition sort; no range fan-out.
 - ``orders_price_bands``: orders equi-joined into half-open price
   bands via bin replication — the non-equi predicate never reaches the
   join, so no broadcast nested loop survives in the plan.

Beyond the reference's surface: beam-scala-examples has no temporal or
interval join (SURVEY §2.4); these are the timeseries staples a user
would otherwise leave the engine for.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, asof_join_bucketed, asof_join_nearest
from ..operators.rangejoin import range_join_binned
from ..operators.windows import epoch_us
from ..tables import load

ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"

# (band, lo, hi): half-open price intervals, deliberately unaligned with
# the bin width so bands span multiple bins and bins split bands.
PRICE_BANDS = (
    ("micro", 0.0, 25_000.0),
    ("small", 25_000.0, 75_000.0),
    ("mid", 75_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 500_000.0),
)
PRICE_BIN_WIDTH = 50_000.0


def _asof_click(spark: SparkSession, sf_dir: str, join_fn) -> DataFrame:
    """Shared body of the flat/bucketed click-attribution pair — one
    place defines the purchase/click shape and the exact-microsecond
    gap, so the 'identical output, same oracle' invariant cannot drift."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE)
    out = join_fn(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "click_event_id", "ts": "click_ts"},
        strict=True,
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        (epoch_us("ts") - epoch_us("click_ts")).alias("gap_us"),
    )


def events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest prior click per purchase (strict backward as-of join on
    user_id; ties on click ts broken by highest event_id).  The gap
    rides exact integer microseconds — no float time arithmetic."""
    return _asof_click(spark, sf_dir, asof_join)


def events_asof_click_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-hardened two-pass form of ``events_asof_click`` (daily
    time buckets): identical output, pinned by the same LATERAL oracle —
    the path to take when single keys carry whale histories."""
    return _asof_click(
        spark,
        sf_dir,
        functools.partial(
            asof_join_bucketed, bucket=lambda c: F.date_trunc("day", c)
        ),
    )


def orders_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count and exact-cents volume per price band (binned range
    join; the band dim replicates ~2x under the chosen bin width while
    orders compute a single bin each)."""
    orders = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        list(PRICE_BANDS), schema="band string, lo double, hi double"
    )
    joined = range_join_binned(
        orders, "o_totalprice", bands, "lo", "hi", PRICE_BIN_WIDTH
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("volume_cents"),
    )


ATTRIBUTION_WINDOW = "1 HOUR"


def _clicks_before_purchase(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    """Shared body of the inner/left-outer attribution pair — one place
    defines the window predicate so the streaming twins cannot drift."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.click_user_id)
        & (clicks.click_ts <= purchases.ts)
        & (
            clicks.click_ts
            > purchases.ts - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
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


def events_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL clicks within the attribution window before (or at) each
    purchase by the same user — the interval join, vs the as-of join's
    latest-only pick.  This is the batch twin of the stream-stream join
    (``streaming/joins.py::clicks_before_purchases``); the streaming
    test pins the two equal on a bounded replay.

    Scale posture: a plain equi-join on user_id with the time band as a
    residual predicate — one shuffle each side, no range fan-out (the
    band filters pairs after the hash match; per-user histories are the
    unit of work, same as the as-of join)."""
    return _clicks_before_purchase(spark, sf_dir, "inner")


def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEFT OUTER form: every purchase, attributed clicks where they
    exist, null click columns where none fell in the window — the batch
    twin of the streaming outer join (whose null rows emit only after
    the watermark proves no match can arrive)."""
    return _clicks_before_purchase(spark, sf_dir, "left_outer")


QUERIES = {
    "events_asof_click": events_asof_click,
    "events_asof_click_bucketed": events_asof_click_bucketed,
    "orders_price_bands": orders_price_bands,
    "events_clicks_before_purchase": events_clicks_before_purchase,
    "events_purchase_attribution": events_purchase_attribution,
}

_BAND_VALUES = ", ".join(
    f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS
)

ORACLE = {
    # A genuinely different algorithm: per-left-row LATERAL pick of the
    # max-(ts, event_id) prior click, vs the engine's union+running-last.
    "events_asof_click": f"""
        SELECT p.event_id, p.user_id, p.ts,
               c.click_event_id, c.click_ts,
               epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
        FROM events p
        LEFT JOIN LATERAL (
            SELECT b.event_id AS click_event_id, b.ts AS click_ts
            FROM events b
            WHERE b.user_id = p.user_id
              AND b.event_type = '{ASOF_RIGHT_TYPE}'
              AND b.ts < p.ts
            ORDER BY b.ts DESC, b.event_id DESC
            LIMIT 1
        ) c ON TRUE
        WHERE p.event_type = '{ASOF_LEFT_TYPE}'
    """,
    "orders_price_bands": f"""
        SELECT band, count(*)::BIGINT AS n_orders,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS volume_cents
        FROM orders
        JOIN (VALUES {_BAND_VALUES}) AS bands(band, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY 1
    """,
}

# The bucketed variant must produce the identical result — same oracle.
ORACLE["events_asof_click_bucketed"] = ORACLE["events_asof_click"]

ORACLE["events_clicks_before_purchase"] = f"""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id, c.ts AS click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = '{ASOF_LEFT_TYPE}'
     AND c.event_type = '{ASOF_RIGHT_TYPE}'
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL {ATTRIBUTION_WINDOW}
"""

ORACLE["events_purchase_attribution"] = f"""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id, c.ts AS click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events p
    LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = '{ASOF_RIGHT_TYPE}'
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL {ATTRIBUTION_WINDOW}
    WHERE p.event_type = '{ASOF_LEFT_TYPE}'
"""


USHAPE_WINDOW = "7 DAYS"  # longer lookback than the 1h as-of window:
# multi-touch models attribute over the consideration period, and the
# 1h window degenerates to single-touch ('first' only) on the fixture


def events_attribution_ushaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each purchase's
    value is credited 40% to the first click, 40% to the last, and 20%
    split over the middles — the multi-touch model beside the first/
    last-touch (``behavior.events_first_last_touch``) and latest-only
    as-of pick.  Report: total credited value per touch position.

    Exactness: credits are integer basis points of exact value cents
    (``credit_microcents = v_cents * bp``); the middle split uses
    integer division with the remainder assigned to the first middle,
    so every purchase's credits sum to exactly 10000 bp — both engines
    compute the identical integers.  Degenerate baskets follow the
    standard convention (1 touch -> 100% first; 2 -> 50/50 first/last).

    Scale: the same user-keyed interval join as
    ``events_clicks_before_purchase`` (hash join + band residual, no
    range fan-out); windows partition by purchase id — bounded by one
    purchase's touch count — and the report is a 3-row aggregate."""
    from pyspark.sql import Window

    from ..operators.agg import cents

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        F.col("event_id").alias("pid"),
        "user_id",
        "ts",
        cents("value").alias("v_cents"),
    )
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.cts <= purchases.ts)
        & (clicks.cts > purchases.ts - F.expr(f"INTERVAL {USHAPE_WINDOW}")),
    )
    w = Window.partitionBy("pid").orderBy("cts", "cid")
    ranked = joined.select(
        "pid",
        "v_cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("pid")).alias("n"),
    )
    bp = F.expr(
        """CASE WHEN n = 1 THEN 10000
                WHEN n = 2 THEN 5000
                WHEN rn = 1 OR rn = n THEN 4000
                WHEN rn = 2 THEN (2000 div (n - 2))
                                 + (2000 - (2000 div (n - 2)) * (n - 2))
                ELSE 2000 div (n - 2) END"""
    )
    pos = F.expr(
        "CASE WHEN rn = 1 THEN 'first' WHEN rn = n THEN 'last'"
        " ELSE 'middle' END"
    )
    return (
        ranked.select(pos.alias("position"), "v_cents", bp.alias("bp"))
        .groupBy("position")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum(F.col("v_cents") * F.col("bp")).alias("credit_microcents"),
        )
    )


QUERIES["events_attribution_ushaped"] = events_attribution_ushaped

ORACLE["events_attribution_ushaped"] = f"""
    WITH j AS (
        SELECT p.event_id AS pid, round(p.value * 100)::BIGINT AS v_cents,
               c.event_id AS cid, c.ts AS cts
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = '{ASOF_LEFT_TYPE}'
         AND c.event_type = '{ASOF_RIGHT_TYPE}'
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL {USHAPE_WINDOW}
    ),
    r AS (
        SELECT pid, v_cents,
               row_number() OVER (PARTITION BY pid ORDER BY cts, cid) AS rn,
               count(*) OVER (PARTITION BY pid) AS n
        FROM j
    ),
    b AS (
        SELECT v_cents,
               CASE WHEN rn = 1 THEN 'first' WHEN rn = n THEN 'last'
                    ELSE 'middle' END AS position,
               CASE WHEN n = 1 THEN 10000
                    WHEN n = 2 THEN 5000
                    WHEN rn = 1 OR rn = n THEN 4000
                    WHEN rn = 2 THEN (2000 // (n - 2))
                                     + (2000 - (2000 // (n - 2)) * (n - 2))
                    ELSE 2000 // (n - 2) END AS bp
        FROM r
    )
    SELECT position, count(*)::BIGINT AS n_touches,
           sum(v_cents * bp)::BIGINT AS credit_microcents
    FROM b GROUP BY 1
"""


def events_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest subsequent purchase per click (strict FORWARD as-of join
    on user_id) — the label-lookahead shape: every interaction tagged
    with the next conversion it preceded, the supervised-learning label
    join for propensity models.  Same single-exchange union +
    running-last plan as the backward form, timestamp order flipped;
    ties among simultaneous purchases break to the highest event_id.
    The gap rides exact integer microseconds."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE)
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "purchase_event_id", "ts": "purchase_ts"},
        strict=True,
        tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_event_id",
        "purchase_ts",
        (epoch_us("purchase_ts") - epoch_us("ts")).alias("lead_us"),
    )


QUERIES["events_next_purchase"] = events_next_purchase

# Same genuinely-different-algorithm oracle discipline as the backward
# form: per-left-row LATERAL pick of the min-(ts), max-(event_id)
# subsequent purchase.
ORACLE["events_next_purchase"] = f"""
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_event_id, p.purchase_ts,
           epoch_us(p.purchase_ts) - epoch_us(c.ts) AS lead_us
    FROM events c
    LEFT JOIN LATERAL (
        SELECT b.event_id AS purchase_event_id, b.ts AS purchase_ts
        FROM events b
        WHERE b.user_id = c.user_id
          AND b.event_type = '{ASOF_LEFT_TYPE}'
          AND b.ts > c.ts
        ORDER BY b.ts ASC, b.event_id DESC
        LIMIT 1
    ) p ON TRUE
    WHERE c.event_type = '{ASOF_RIGHT_TYPE}'
"""


def events_next_purchase_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened two-pass form of ``events_next_purchase`` (daily
    time buckets, FORWARD direction): identical output, same LATERAL
    oracle — the whale-user path for label lookahead."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE)
    out = asof_join_bucketed(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "purchase_event_id", "ts": "purchase_ts"},
        bucket=lambda c: F.date_trunc("day", c),
        strict=True,
        tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_event_id",
        "purchase_ts",
        (epoch_us("purchase_ts") - epoch_us("ts")).alias("lead_us"),
    )


QUERIES["events_next_purchase_bucketed"] = events_next_purchase_bucketed
ORACLE["events_next_purchase_bucketed"] = ORACLE["events_next_purchase"]


def events_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest purchase in time per click, EITHER side
    (``operators/asof.py::asof_join_nearest``) — the sensor-alignment /
    context-lookup shape: "which conversion is this interaction closest
    to?", where backward-only misses a click seconds before a purchase
    and forward-only misses one seconds after.  Backward candidate =
    latest at-or-before (ties → max event_id); forward = earliest
    strictly-after; smaller |gap| wins, exact ties to the backward row.
    Two key exchanges total (one per direction); the gap rides exact
    integer microseconds."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE)
    out = asof_join_nearest(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "purchase_event_id", "ts": "purchase_ts"},
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_event_id",
        "purchase_ts",
        F.col("__asof_gap_us").alias("gap_us"),
    )


QUERIES["events_nearest_purchase"] = events_nearest_purchase

# Genuinely-different oracle algorithm: one LATERAL pick per click over
# ALL the user's purchases, totally ordered by (|gap|, backward-first,
# event_id desc) — the same winner the two-pass compose selects.
ORACLE["events_nearest_purchase"] = f"""
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_event_id, p.purchase_ts,
           CASE WHEN p.purchase_ts <= c.ts
                THEN epoch_us(c.ts) - epoch_us(p.purchase_ts)
                ELSE epoch_us(p.purchase_ts) - epoch_us(c.ts) END AS gap_us
    FROM events c
    LEFT JOIN LATERAL (
        SELECT b.event_id AS purchase_event_id, b.ts AS purchase_ts
        FROM events b
        WHERE b.user_id = c.user_id
          AND b.event_type = '{ASOF_LEFT_TYPE}'
        ORDER BY
            CASE WHEN b.ts <= c.ts
                 THEN epoch_us(c.ts) - epoch_us(b.ts)
                 ELSE epoch_us(b.ts) - epoch_us(c.ts) END ASC,
            (b.ts > c.ts) ASC,
            b.event_id DESC
        LIMIT 1
    ) p ON TRUE
    WHERE c.event_type = '{ASOF_RIGHT_TYPE}'
"""
