"""Mobile-gaming pipeline family (SURVEY §2.12 Q11–Q15) over ``events``.

Role mapping onto the star schema: ``user_id`` = player, ``event_type`` =
team, ``value`` = score, ``ts`` = event time.

Reference pipelines: ``complete/game/UserScore.scala:50-177``,
``HourlyTeamScore.scala:49-155``, ``LeaderBoard.scala:74-260``,
``GameStats.scala:68-305``, ``StatefulTeamScore.scala:52-181``.
Streaming twins (watermarks, update mode, keyed state) live in
``beam_scala_examples_spark/streaming/``; these are the batch/oracle forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.agg import cents, duck_sum_cents, sum_cents
from ..operators.windows import duck_sessions_cte, duck_tumbling_start, epoch_us
from ..tables import load

# Q12's [start, stop) event-time filter (``HourlyTeamScore.scala:82-95``);
# UTC per GameConstants (SURVEY §2.11-N5).
Q12_START = "2024-01-05 00:00:00"
Q12_STOP = "2024-01-20 00:00:00"

# Q15 threshold (reference default 5000, ``StatefulTeamScore.scala:103-106``,
# scaled to the fixture's score domain).
Q15_THRESHOLD = 1000.0

SESSION_GAP_S = 3600  # Q14 sessions: 5-min gap in the reference, scaled to 1 h


def q11_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user total score, batch (Q11: P5 parse + A3 Sum.perKey;
    ``UserScore.scala:160-177``)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(sum_cents("value").alias("total_score"))


def q12_hourly_team_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-team per-hour totals within [start, stop) (Q12: P2 + W1 + A3;
    ``HourlyTeamScore.scala:82-117``). Filter runs before the shuffle and
    is pushed to the parquet scan."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit(Q12_START)) & (F.col("ts") < F.lit(Q12_STOP))
        )
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(sum_cents("value").alias("total_score"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("team"),
            "total_score",
        )
    )


def q13_leaderboard_team(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team totals per hour — final panes of the LeaderBoard stream (Q13:
    W1 + X4; ``LeaderBoard.scala:101-116``). Streaming twin with watermark
    + update mode: ``streaming/leaderboard.py``."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(sum_cents("value").alias("total_score"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("team"),
            "total_score",
        )
    )


def q13_leaderboard_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user *running* total at each event — the batch-deterministic twin
    of the global-window user leaderboard fired every 10 minutes (Q13: W5 +
    X5; ``LeaderBoard.scala:203-220``). Running sums are evaluated in the
    same (ts, event_id) order on both engines, so doubles match bit-for-bit.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_total"),
    )


def _spammers(ev: DataFrame) -> DataFrame:
    """Spam rule: user total > 2.5 x global mean of user totals
    (``GameStats.scala:254,262-267``).

    Totals and mean are computed in exact integer cents so the threshold
    comparison is deterministic across engines and shuffle orders.
    """
    totals = ev.groupBy("user_id").agg(F.sum(cents("value")).alias("total_cents"))
    mean = totals.agg(F.avg("total_cents").alias("mean_cents"))
    return (
        totals.join(F.broadcast(mean))
        .filter(F.col("total_cents") > 2.5 * F.col("mean_cents"))
        .select("user_id")
    )


def q14_spam_filtered_team_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team totals per hour with spammy users removed (Q14: A3 + A6 + J5
    anti-join; ``GameStats.scala:84-140``).

    SURVEY §2.11-N1: the reference's Scala port inverts the filter (keeps
    spammers); we implement the documented intent — **drop** spammers via
    a left-anti join.  The spammer set is data-dependent (a fraction of
    all users), so the join strategy is left to Catalyst/AQE size
    estimates rather than a forced broadcast that would OOM if the user
    population outgrew the threshold.
    """
    ev = load(spark, sf_dir, "events")
    clean = ev.join(_spammers(ev), "user_id", "left_anti")
    return (
        clean.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(sum_cents("value").alias("total_score"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("team"),
            "total_score",
        )
    )


def q14_session_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean session length (minutes) per 1-day window of session end (Q14:
    W3 sessions + W6 END_OF_WINDOW + W7 re-window; ``GameStats.scala:147-177``).

    Two chained event-time aggregations: per-user sessions, then fixed
    windows over the session-end timestamps.
    """
    ev = load(spark, sf_dir, "events")
    sess = (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
        )
    )
    # Exact integer microseconds -> deterministic mean across engines and
    # across shuffle orders (double summation is not associative).
    dur_us = epoch_us("s_end") - epoch_us("s_start")
    return (
        sess.select(F.window("s_end", "1 day").alias("win"), dur_us.alias("dur_us"))
        .groupBy(F.col("win.start").alias("win_start"))
        .agg(
            F.round(F.sum("dur_us") / (60_000_000.0 * F.count("*")), 4)
            .alias("mean_session_min")
        )
    )


def q15_threshold_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit the team total each time it crosses a multiple of the threshold
    (Q15: ST1 keyed ValueState; ``StatefulTeamScore.scala:139-166``).

    Batch form: running cumulative sum per team in (ts, event_id) order;
    a row fires iff floor(cum/T) > floor((cum - value)/T).  State starts at
    0 per SURVEY §2.11-N2 (the reference port NPEs on first element; we
    implement the documented intent).  The streaming form with real keyed
    state is ``streaming/stateful.py``.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.lit(Q15_THRESHOLD)
    cum = F.sum("value").over(w)
    return (
        ev.select(
            F.col("event_type").alias("team"),
            "event_id",
            cum.alias("cum"),
            F.col("value"),
        )
        .filter(F.floor(F.col("cum") / t) > F.floor((F.col("cum") - F.col("value")) / t))
        .select("team", "event_id", F.round("cum", 2).alias("total"))
    )


QUERIES = {
    "q11_user_score": q11_user_score,
    "q12_hourly_team_score": q12_hourly_team_score,
    "q13_leaderboard_team": q13_leaderboard_team,
    "q13_leaderboard_user": q13_leaderboard_user,
    "q14_spam_filtered_team_score": q14_spam_filtered_team_score,
    "q14_session_mean": q14_session_mean,
    "q15_threshold_crossings": q15_threshold_crossings,
}

_HOUR = duck_tumbling_start("ts", 3600)
_SUMC = duck_sum_cents("value")

ORACLE = {
    "q11_user_score": f"""
        SELECT user_id, {_SUMC} AS total_score
        FROM events GROUP BY user_id
    """,
    "q12_hourly_team_score": f"""
        SELECT {_HOUR} AS win_start, event_type AS team,
               {_SUMC} AS total_score
        FROM events
        WHERE ts >= TIMESTAMP '{Q12_START}' AND ts < TIMESTAMP '{Q12_STOP}'
        GROUP BY 1, 2
    """,
    "q13_leaderboard_team": f"""
        SELECT {_HOUR} AS win_start, event_type AS team,
               {_SUMC} AS total_score
        FROM events GROUP BY 1, 2
    """,
    "q13_leaderboard_user": """
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
        FROM events
    """,
    "q14_spam_filtered_team_score": f"""
        WITH totals AS (
            SELECT user_id, sum(round(value * 100)::BIGINT) AS total_cents
            FROM events GROUP BY user_id
        ),
        spammers AS (
            SELECT user_id FROM totals
            WHERE total_cents > 2.5 * (SELECT avg(total_cents) FROM totals)
        )
        SELECT {_HOUR} AS win_start, event_type AS team,
               {_SUMC} AS total_score
        FROM events
        WHERE user_id NOT IN (SELECT user_id FROM spammers)
        GROUP BY 1, 2
    """,
    "q14_session_mean": f"""
        WITH sess_rows AS ({duck_sessions_cte('events', 'user_id', 'ts', SESSION_GAP_S)}),
        sess AS (
            SELECT user_id, session_id,
                   min(ts) AS s_start,
                   max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS s_end
            FROM sess_rows GROUP BY user_id, session_id
        )
        SELECT {duck_tumbling_start('s_end', 86400)} AS win_start,
               round(sum(epoch_us(s_end) - epoch_us(s_start))
                     / (60000000.0 * count(*)), 4) AS mean_session_min
        FROM sess GROUP BY 1
    """,
    "q15_threshold_crossings": f"""
        WITH c AS (
            SELECT event_type AS team, event_id, value,
                   sum(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM events
        )
        SELECT team, event_id, round(cum, 2) AS total
        FROM c
        WHERE floor(cum / {Q15_THRESHOLD}) > floor((cum - value) / {Q15_THRESHOLD})
    """,
}
