"""Injector-shape fixture generator tests (SURVEY §2.1 S12 closure).

Pins the population dynamics the reference's injector documents —
robots at ~2× a teammate's click rate, team TTL churn, late rows,
corrupt lines (``injector/Injector.java:146-159,285-295,299-304``) —
and runs the distributed spam sink end-to-end on the generated stream,
pinned equal to the driver-dict oracle sink on the same feed.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

from pyspark.sql import Observation
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from beam_scala_examples_spark import io as bio
from beam_scala_examples_spark.streaming import gamestats
from beam_scala_examples_spark.streaming.sources import (
    read_event_stream,
    write_arrival_chunks,
)

from .fixtures.injector_sim import (
    InjectorSim,
    LATE_EVERY,
    N_LIVE_TEAMS,
    USER_ID_BASE,
)
from .test_streaming import _run_stream, tmpdir  # noqa: F401

SEED = 42
N_EVENTS = 12000
EPS = 5  # events/sec -> 40 simulated minutes (spans team TTLs)


def _rows():
    return InjectorSim(seed=SEED).generate(N_EVENTS, events_per_sec=EPS)


def test_robot_click_rate_is_double(spark):
    """Injector.java:285-295: a team's robot is selected 1-in-(n/2) per
    team event vs 1-in-n(ish) for a member — the robot's event share
    must be ~2x the mean member share, aggregated across teams."""
    rows = _rows()
    by_team_user = defaultdict(lambda: defaultdict(int))
    for r in rows:
        by_team_user[r["event_type"]][r["user_id"]] += 1
    ratios = []
    for team, users in by_team_user.items():
        robots = {u for u in users if u < USER_ID_BASE}
        members = {u: c for u, c in users.items() if u >= USER_ID_BASE}
        if len(robots) != 1 or len(members) < 3:
            continue
        robot_n = users[next(iter(robots))]
        mean_member = sum(members.values()) / len(members)
        ratios.append(robot_n / mean_member)
    assert len(ratios) >= 5  # enough robot teams to be meaningful
    avg = sum(ratios) / len(ratios)
    assert 1.5 <= avg <= 2.6, f"robot/member rate ratio {avg:.2f}, expected ~2"


def test_team_ttl_churn(spark):
    """Teams dissolve after 20-40 minutes and are replaced: a 40-minute
    run must see more distinct teams than the live-set size, and no
    team's event span may exceed the max TTL."""
    rows = _rows()
    spans = {}
    for r in rows:
        t = datetime.fromisoformat(r["ts"])
        lo, hi = spans.get(r["event_type"], (t, t))
        spans[r["event_type"]] = (min(lo, t), max(hi, t))
    assert len(spans) > N_LIVE_TEAMS
    max_span = max((hi - lo).total_seconds() for lo, hi in spans.values())
    # TTL max 40 min; late rows can stretch an observed span ~10 min
    assert max_span <= 40 * 60 + 11 * 60


def test_late_rows_present(spark):
    """Every ~LATE_EVERY events one arrives 5-10 minutes late: event
    time lags the arrival clock by >= 4 minutes for some rows."""
    rows = _rows()
    base = datetime.fromisoformat(rows[0]["ts"])
    late = [
        r for i, r in enumerate(rows)
        if (i / EPS) - (datetime.fromisoformat(r["ts"]) - base).total_seconds()
        >= 240
    ]
    assert N_EVENTS / LATE_EVERY / 3 <= len(late) <= N_EVENTS / LATE_EVERY * 3
    assert len(late) > 0


def test_corrupt_lines_counted_by_permissive_parse(spark):
    """Injector.java:299-304 wire format through P5: corrupt lines are
    dropped and counted, never failing the parse."""
    rows = _rows()[:1000]
    lines = InjectorSim(seed=SEED).to_csv_lines(rows, corrupt_every=100)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    schema = StructType(
        [
            StructField("user", LongType(), nullable=False),
            StructField("team", StringType(), nullable=False),
            StructField("score", IntegerType(), nullable=False),
            StructField("event_ts", StringType(), nullable=False),
        ]
    )
    obs = Observation("inj")
    parsed = bio.permissive_csv(df, schema, observation=obs)
    assert parsed.count() == 990
    assert obs.get["parse_errors"] == 10


def test_spam_detection_on_injector_stream(spark, tmpdir):  # noqa: F811
    """GameStats' spam rule on injector-shaped data: robots (persistent,
    2x click rate) are flagged at a far higher rate than humans, and the
    distributed streaming sink equals the driver-dict oracle sink on the
    same arrival-ordered feed (late rows included)."""
    rows = _rows()
    # statistical fidelity: the 2.5x-mean rule heavily enriches robots
    totals = defaultdict(float)
    for r in rows:
        totals[r["user_id"]] += r["value"]
    mean = sum(totals.values()) / len(totals)
    flagged = {u for u, c in totals.items() if c > 2.5 * mean}
    robots_active = {u for u in totals if u < USER_ID_BASE}
    humans = {u for u in totals if u >= USER_ID_BASE}
    robot_rate = len(flagged & robots_active) / len(robots_active)
    human_rate = len(flagged & humans) / len(humans)
    assert len(flagged & robots_active) >= 3
    assert robot_rate > 5 * human_rate

    # streaming: distributed sink == driver-dict oracle on this feed
    write_arrival_chunks(rows, 1500, f"{tmpdir}/feed")
    stream = read_event_stream(spark, f"{tmpdir}/feed")
    dist = gamestats.SpamFilteredTeamScoresSink(
        f"{tmpdir}/contrib", f"{tmpdir}/out"
    )
    _run_stream(stream, "append", dist, f"{tmpdir}/d")

    stream2 = read_event_stream(spark, f"{tmpdir}/feed")
    oracle = gamestats.SpamFilteredTeamScores()
    _run_stream(stream2, "append", oracle, f"{tmpdir}/o")

    got = sorted(
        (r.win_start, r.team, r.total_score)
        for r in spark.read.parquet(f"{tmpdir}/out").collect()
    )
    assert got == oracle.result()
