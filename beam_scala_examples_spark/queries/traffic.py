"""Traffic analytics (SURVEY §2.12 Q9, Q10, Q22) over ``events``.

Role mapping: ``user_id`` = station, ``user_id % 5`` = route,
``value`` = speed/flow, ``event_type`` = freeway.

Reference pipelines: ``complete/TrafficMaxLaneFlow.scala:62-317`` (sliding
windows + arg-max combiner A7), ``complete/TrafficRoutes.scala:60-317``
(ordered fold A12 — GatherStats), ``cookbook/TriggerExample.scala:51-435``
(total flow per window; the four trigger regimes live in ``streaming/``).

Window sizes are scaled to the fixture's event density (one month of
events) while keeping the reference's window:slide ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.agg import cents as agg_cents
from ..operators.agg import duck_sum_cents, sum_cents
from ..operators.windows import duck_sliding_starts_cte, duck_tumbling_start
from ..tables import load

# Q9: 12 windows per element, like the reference's 60 min / 5 min.
Q9_WINDOW_S = 12 * 3600
Q9_SLIDE_S = 3600
# Q10: 3 windows per element, like the reference's 3 min / 1 min.
Q10_WINDOW_S = 3 * 21600
Q10_SLIDE_S = 21600
N_ROUTES = 5


def q09_max_lane_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per station per sliding window, the record with max flow (Q9: W2 +
    A7 custom arg-max combiner, ``TrafficMaxLaneFlow.scala:245-248,303``).

    ``max_by`` over a struct ordering key = Beam's ``Combine.perKey(MaxFlow)``:
    partial arg-max before the shuffle, so the exchange carries one record
    per (station, window) per input partition.  Ties break by smaller
    event_id (the struct's second field, negated).
    """
    ev = load(spark, sf_dir, "events")
    n = Q9_WINDOW_S // Q9_SLIDE_S
    # Two-level sliding-window arg-max: aggregate per tumbling *slide
    # bucket* first (the shuffle carries one row per bucket x station, not
    # window/slide x input rows), then expand each bucket result into the
    # n sliding windows containing it and arg-max the n candidates.
    # Valid because arg-max is associative and every sliding window is a
    # disjoint union of slide buckets. At 100 TB this cuts the exchanged
    # volume by the window/slide factor (12x here).
    #
    # The arg-max itself is PACKED into one long — cents<<40 | (2^40-1 -
    # event_id) — so plain max() applies and both aggregation levels run
    # as HashAggregate; a struct-valued max_by buffer forces SortAggregate
    # (sorting every partition) on Spark. Applicability contract: flows
    # are NON-NEGATIVE (a negative pack would flip the sign-following %
    # used to decode event_id), carry exactly 2 decimals, and satisfy
    # cents < 2^23 (~$83k — larger flows overflow the 63-bit pack) with
    # event_id < 2^40. The bounds are ENFORCED: a violating row raises
    # instead of silently corrupting the pack; fall back to
    # max_by(named_struct(...), named_struct(v, -event_id)) if a domain
    # legitimately exceeds them.
    pack_bits = 40
    p_mod = 1 << pack_bits
    cents_raw = agg_cents("value")
    # NULL value/event_id = absent data: EXCLUDED before aggregation (an
    # explicit filter, mirrored in the oracle, so both engines agree on
    # groups that are entirely NULL too), not a bounds violation
    ev = ev.filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
    in_bounds = (
        (cents_raw >= 0)
        & (cents_raw < F.lit(1 << 23))
        & (F.col("event_id") >= 0)
        & (F.col("event_id") < F.lit(p_mod))
    )
    checked = F.when(in_bounds, cents_raw).otherwise(
        F.raise_error(
            F.format_string(
                "q09 arg-max pack bounds violated (need 0 <= 100*value"
                " < 2^23 and 0 <= event_id < 2^40): value=%s event_id=%s",
                F.col("value"), F.col("event_id"),
            )
        )
    )
    packed = checked * p_mod + (F.lit(p_mod - 1) - F.col("event_id"))
    pre = ev.groupBy(
        F.window("ts", f"{Q9_SLIDE_S} seconds").alias("bucket"),
        F.col("user_id").alias("station"),
    ).agg(F.max(packed).alias("p"))
    exploded = pre.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {n - 1}),"
                f" i -> timestampadd(SECOND, -{Q9_SLIDE_S} * i, bucket.start))"
            )
        ).alias("win_start"),
        "station",
        "p",
    )
    return (
        exploded.groupBy("win_start", "station")
        .agg(F.max("p").alias("p"))
        .select(
            "win_start",
            "station",
            F.round(F.shiftright("p", pack_bits) / 100.0, 2).alias("max_flow"),
            (F.lit(p_mod - 1) - (F.col("p") % p_mod)).alias("event_id"),
        )
    )


def q10_traffic_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per route per sliding window: average speed + slowdown flag (Q10:
    A12 ordered fold, ``TrafficRoutes.scala:207-250``).

    The reference's ``GatherStats`` sorts each station's readings by
    timestamp and counts speedups/slowdowns between consecutive readings;
    a route is "slowing down" iff ``slowdowns >= 2 * speedups``
    (``TrafficRoutes.scala:215``).  SQL rewrite: ``lag`` per (window,
    station), then aggregate per (window, route) — no Python in the loop.
    An ``applyInPandas`` variant of the same fold (for semantics Spark SQL
    can't express) is in ``operators/fold.py`` and is tested for equality.
    """
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", f"{Q10_WINDOW_S} seconds", f"{Q10_SLIDE_S} seconds")
    windowed = ev.select(
        win.alias("win"),
        F.col("user_id").alias("station"),
        (F.col("user_id") % N_ROUTES).alias("route"),
        "ts",
        "event_id",
        F.col("value").alias("speed"),
    ).select(F.col("win.start").alias("win_start"), "station", "route", "ts",
             "event_id", "speed")
    lag_w = Window.partitionBy("win_start", "station").orderBy("ts", "event_id")
    with_prev = windowed.withColumn("prev_speed", F.lag("speed").over(lag_w))
    # Average from exact integer cents: double summation order differs
    # between engines (and between cluster runs!), so a float avg can land
    # on a rounding boundary nondeterministically. Integer sums are exact
    # and associative — the distributed-determinism-safe form.
    return (
        with_prev.withColumn("speed_cents", agg_cents("speed"))
        .groupBy("win_start", "route")
        .agg(
            F.round(
                F.sum("speed_cents") / (100.0 * F.count("*")), 4
            ).alias("avg_speed"),
            F.sum(F.when(F.col("speed") < F.col("prev_speed"), 1).otherwise(0))
            .alias("slowdowns"),
            F.sum(F.when(F.col("speed") > F.col("prev_speed"), 1).otherwise(0))
            .alias("speedups"),
        )
        .select(
            "win_start",
            "route",
            "avg_speed",
            (F.col("slowdowns") >= 2 * F.col("speedups")).alias("slowdown_event"),
        )
    )


def q10_traffic_routes_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 again, via the ``applyInPandas`` ordered fold (A12's literal
    form, ``operators/fold.py``) — checked against the *same* oracle as
    the lag-SQL rewrite, pinning the two implementations equal."""
    from ..operators.fold import gather_stats

    ev = load(spark, sf_dir, "events")
    win = F.window("ts", f"{Q10_WINDOW_S} seconds", f"{Q10_SLIDE_S} seconds")
    windowed = ev.select(
        win.alias("win"),
        F.col("user_id").alias("station"),
        (F.col("user_id") % N_ROUTES).alias("route"),
        "ts",
        "event_id",
        F.col("value").alias("speed"),
    ).select(
        F.col("win.start").alias("win_start"), "station", "route", "ts",
        "event_id", "speed",
    )
    return gather_stats(windowed)


def q22_trigger_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-freeway total flow per window — the final (ON_TIME) panes of
    TriggerExample (Q22: X1 + A10, ``cookbook/TriggerExample.scala:300-340``).
    The four trigger regimes and EARLY/LATE pane tagging are exercised in
    ``streaming/panes.py`` (Spark has no PaneInfo — SURVEY §7.4)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day").alias("win"),
            F.col("event_type").alias("freeway"),
        )
        .agg(
            sum_cents("value").alias("total_flow"),
            F.count("*").alias("n_records"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "freeway",
            "total_flow",
            "n_records",
            F.lit("ON_TIME").alias("timing"),
        )
    )


def p06_lane_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: one wide reading -> one row per lane
    (``complete/TrafficMaxLaneFlow.scala:194-236``). The fixture set has
    no 50-field layout, so the wide shape is derived from ``events`` (two
    lane column groups) and exploded via ``operators/parse.py::
    explode_lane_columns`` — ``stack`` inside the scan stage, no shuffle;
    the oracle re-derives the identical union."""
    from ..operators.parse import explode_lane_columns

    ev = load(spark, sf_dir, "events")
    wide = ev.select(
        "event_id",
        F.col("user_id").alias("station"),
        F.round("value", 2).alias("l1_flow"),
        F.round(F.col("value") * 2, 2).alias("l2_flow"),
    )
    return explode_lane_columns(
        wide,
        [{"flow": "l1_flow"}, {"flow": "l2_flow"}],
        keep=["event_id", "station"],
    )


QUERIES = {
    "q09_max_lane_flow": q09_max_lane_flow,
    "p06_lane_explode": p06_lane_explode,
    "q10_traffic_routes": q10_traffic_routes,
    "q10_traffic_routes_pandas": q10_traffic_routes_pandas,
    "q22_trigger_flow": q22_trigger_flow,
}

ORACLE = {
    "q09_max_lane_flow": f"""
        WITH ev9 AS (
            SELECT * FROM events
            WHERE value IS NOT NULL AND event_id IS NOT NULL
        ),
        w AS ({duck_sliding_starts_cte('ev9', 'ts', Q9_WINDOW_S, Q9_SLIDE_S,
                                       'user_id, event_id, value')}),
        ranked AS (
            SELECT win_start, user_id AS station, value, event_id,
                   row_number() OVER (PARTITION BY win_start, user_id
                                      ORDER BY value DESC, event_id ASC) AS rk
            FROM w
        )
        SELECT win_start, station, round(value, 2) AS max_flow, event_id
        FROM ranked WHERE rk = 1
    """,
    "q10_traffic_routes": f"""
        WITH w AS ({duck_sliding_starts_cte('events', 'ts', Q10_WINDOW_S, Q10_SLIDE_S,
                                            'user_id, event_id, value, ts')}),
        lagged AS (
            SELECT win_start, user_id AS station, user_id % {N_ROUTES} AS route,
                   value AS speed, ts, event_id,
                   lag(value) OVER (PARTITION BY win_start, user_id
                                    ORDER BY ts, event_id) AS prev_speed
            FROM w
        )
        SELECT win_start, route,
               round(sum(round(speed * 100)::BIGINT) / (100.0 * count(*)), 4)
                   AS avg_speed,
               (sum(CASE WHEN speed < prev_speed THEN 1 ELSE 0 END)
                >= 2 * sum(CASE WHEN speed > prev_speed THEN 1 ELSE 0 END))
                   AS slowdown_event
        FROM lagged GROUP BY win_start, route
    """,
    "q22_trigger_flow": f"""
        SELECT {duck_tumbling_start('ts', 86400)} AS win_start,
               event_type AS freeway,
               {duck_sum_cents('value')} AS total_flow,
               count(*)::BIGINT AS n_records,
               'ON_TIME' AS timing
        FROM events GROUP BY 1, 2
    """,
}

ORACLE["q10_traffic_routes_pandas"] = ORACLE["q10_traffic_routes"]

ORACLE["p06_lane_explode"] = """
    SELECT event_id, user_id AS station, 1 AS lane,
           round(value, 2) AS flow FROM events
    UNION ALL
    SELECT event_id, user_id AS station, 2 AS lane,
           round(value * 2, 2) AS flow FROM events
"""
