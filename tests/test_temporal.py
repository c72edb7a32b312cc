"""As-of join and binned range join: edge-case semantics + plan shape.

The sf0.01 oracle parity (``events_asof_click`` / ``orders_price_bands``
in ``test_parity.py``) covers the bulk path; these tests pin the corner
semantics a random fixture may never hit: exact-timestamp ties under
strict/non-strict, duplicate right timestamps, unmatched left rows,
bands ending exactly on bin edges, and overlapping bands.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from beam_scala_examples_spark.operators.asof import asof_join
from beam_scala_examples_spark.operators.rangejoin import range_join_binned
from beam_scala_examples_spark.queries import QUERIES
from tests.test_plans import plan_str


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:10:00")),  # after r10/r11 tie
            (2, 1, _ts("2024-01-01T00:05:00")),  # exactly at r5
            (3, 1, _ts("2024-01-01T00:01:00")),  # before any right row
            (4, 2, _ts("2024-01-01T09:00:00")),  # key with no right rows
        ],
        schema="event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01T00:05:00"), 1.0),  # r5
            (20, 1, _ts("2024-01-01T00:08:00"), 2.0),  # r8 (tie, lower id)
            (21, 1, _ts("2024-01-01T00:08:00"), 3.0),  # r8 (tie, higher id)
        ],
        schema="event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_strict_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "value": "m_value"},
        strict=True, tiebreak="event_id",
    )
    got = {r.event_id: (r.m_id, r.m_value) for r in out.collect()}
    assert got == {
        1: (21, 3.0),  # tie at 00:08 -> highest event_id wins
        2: (None, None),  # strict: simultaneous right row invisible
        3: (None, None),  # nothing before
        4: (None, None),  # key absent on right
    }


def test_asof_non_strict_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id"}, strict=False, tiebreak="event_id",
    )
    got = {r.event_id: r.m_id for r in out.collect()}
    assert got == {1: 21, 2: 10, 3: None, 4: None}


def test_asof_preserves_left_rowcount(spark):
    """Left-outer semantics: duplicate right timestamps must never fan
    out the left side."""
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right.unionAll(right), on=["user_id"], left_ts="ts",
        right_ts="ts", payload={"event_id": "m_id"}, tiebreak="event_id",
    )
    assert out.count() == left.count()


def test_asof_plan_is_single_shuffle_no_join(spark, sf_dir):
    """The as-of query must plan as ONE exchange (the key partitioning)
    feeding a window — no join operator, no range fan-out."""
    p = plan_str(QUERIES["events_asof_click"](spark, sf_dir))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in p
    assert p.count("hashpartitioning(") == 1  # the single key exchange
    assert "Window" in p


def _bands(spark, rows):
    return spark.createDataFrame(rows, schema="band string, lo double, hi double")


def _points(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], schema="id long, x double"
    )


def test_range_join_half_open_and_bin_edges(spark):
    """Band ending exactly on a bin edge must not claim the edge value;
    points on a band's lo are included, on hi excluded."""
    bands = _bands(spark, [("a", 0.0, 10.0), ("b", 10.0, 25.0)])
    pts = _points(spark, [0.0, 9.999, 10.0, 24.999, 25.0, -1.0])
    out = range_join_binned(pts, "x", bands, "lo", "hi", bin_width=10.0)
    got = sorted((r.x, r.band) for r in out.collect())
    assert got == [(0.0, "a"), (9.999, "a"), (10.0, "b"), (24.999, "b")]


def test_range_join_overlapping_and_empty_bands(spark):
    bands = _bands(
        spark,
        [("wide", 0.0, 100.0), ("narrow", 40.0, 60.0), ("empty", 50.0, 50.0)],
    )
    pts = _points(spark, [45.0, 5.0])
    out = range_join_binned(pts, "x", bands, "lo", "hi", bin_width=30.0)
    got = sorted((r.x, r.band) for r in out.collect())
    assert got == [(5.0, "wide"), (45.0, "narrow"), (45.0, "wide")]


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    """The interval predicate must ride the bin equi-join — a surviving
    nested-loop/cartesian means the binning failed."""
    p = plan_str(QUERIES["orders_price_bands"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_range_join_hi_just_above_bin_edge(spark):
    """Regression: a band whose hi sits a hair above a bin edge must
    still replicate into the next bin (an epsilon-based last-bin
    computation dropped the point exactly on the edge)."""
    bands = _bands(spark, [("a", 0.0, 10.000000001)])
    pts = _points(spark, [10.0, 5.0, 10.000000001])
    out = range_join_binned(pts, "x", bands, "lo", "hi", bin_width=10.0)
    got = sorted(r.x for r in out.collect())
    assert got == [5.0, 10.0]


def test_asof_null_keys_and_null_ts_never_match(spark):
    """SQL semantics: NULL join keys and NULL right timestamps never
    match (no NULL-key partition pairing, no universal-earliest row)."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T01:00:00")),
         (2, 7, _ts("2024-01-01T01:00:00")),
         (3, 7, None)],
        schema="event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, _ts("2024-01-01T00:00:00")),   # NULL key
         (11, 7, None),                            # NULL ts
         (12, 8, _ts("2024-01-01T00:00:00"))],     # other key
        schema="event_id long, user_id long, ts timestamp",
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id"}, tiebreak="event_id",
    )
    got = {r.event_id: r.m_id for r in out.collect()}
    assert got == {1: None, 2: None, 3: None}
    assert out.count() == 3  # left rows all survive (left-outer)


def test_asof_matches_brute_force_random(spark):
    """Seeded randomized check: the union+running-last formulation must
    equal the O(L*R) brute-force definition on keys with duplicate
    timestamps, gaps, and unmatched rows."""
    import random

    rng = random.Random(42)
    left_rows = [
        (i, rng.randrange(6), _ts("2024-01-01T00:00:00")
         .replace(minute=rng.randrange(60)))
        for i in range(120)
    ]
    right_rows = [
        (1000 + i, rng.randrange(6), _ts("2024-01-01T00:00:00")
         .replace(minute=rng.randrange(60)))
        for i in range(120)
    ]
    left = spark.createDataFrame(
        left_rows, schema="event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, schema="event_id long, user_id long, ts timestamp"
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id"}, strict=True, tiebreak="event_id",
    )
    got = {r.event_id: r.m_id for r in out.collect()}
    expect = {}
    for lid, lk, lts in left_rows:
        cands = [(rts, rid) for rid, rk, rts in right_rows
                 if rk == lk and rts < lts]
        expect[lid] = max(cands)[1] if cands else None
    assert got == expect


def test_range_join_matches_brute_force_random(spark):
    """Seeded randomized check vs the O(P*B) definition, with band
    widths spanning a fraction of a bin to many bins."""
    import random

    rng = random.Random(7)
    band_rows = []
    for i in range(40):
        lo = round(rng.uniform(-50, 150), 2)
        band_rows.append((f"b{i}", lo, round(lo + rng.uniform(0.1, 80), 2)))
    point_rows = [(i, round(rng.uniform(-60, 240), 2)) for i in range(300)]
    bands = _bands(spark, band_rows)
    pts = _points(spark, [v for _, v in point_rows])
    out = range_join_binned(pts, "x", bands, "lo", "hi", bin_width=25.0)
    got = sorted((r.id, r.band) for r in out.collect())
    expect = sorted(
        (pid, name)
        for pid, (_, v) in enumerate(point_rows)
        for name, lo, hi in band_rows
        if lo <= v < hi
    )
    assert got == expect


def test_bucketed_asof_equals_plain_with_whale_key(spark):
    """The two-pass bucketed form must equal the single-sort form on a
    fixture with a whale key (one key holding most of the history),
    sparse buckets (matches crossing empty buckets), and ties — in both
    strict modes."""
    import random

    from beam_scala_examples_spark.operators.asof import asof_join_bucketed

    rng = random.Random(99)

    def rows(n, start_id, whale_share=0.7):
        out = []
        for i in range(n):
            key = 1 if rng.random() < whale_share else rng.randrange(2, 6)
            t = _ts("2024-01-01T00:00:00").replace(
                day=1 + rng.randrange(9), hour=rng.randrange(24),
                minute=rng.randrange(60),
            )
            out.append((start_id + i, key, t))
        return out

    left = spark.createDataFrame(
        rows(150, 0), schema="event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rows(150, 1000), schema="event_id long, user_id long, ts timestamp"
    )
    for strict in (True, False):
        plain = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            payload={"event_id": "m_id", "ts": "m_ts"},
            strict=strict, tiebreak="event_id",
        )
        bucketed = asof_join_bucketed(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            payload={"event_id": "m_id", "ts": "m_ts"},
            bucket=lambda c: F.date_trunc("day", c),
            strict=strict, tiebreak="event_id",
        )
        a = {(r.event_id, r.m_id, r.m_ts) for r in plain.collect()}
        b = {(r.event_id, r.m_id, r.m_ts) for r in bucketed.collect()}
        assert a == b, f"strict={strict}"


def test_bucketed_asof_null_payload_field_not_conflated(spark):
    """Regression: a within-bucket match whose payload FIELD is NULL
    must stay NULL — the carry fallback fires only when no within-bucket
    match exists, never per-field (which could stitch two right rows)."""
    from beam_scala_examples_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-05T11:00:00"))],
        schema="event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # earlier bucket: full payload
            (100, 7, _ts("2024-01-01T00:00:00"), 5.0),
            # same bucket, before left ts: NULL value field
            (101, 7, _ts("2024-01-05T10:00:00"), None),
        ],
        schema="event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join_bucketed(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "value": "m_value"},
        bucket=lambda c: F.date_trunc("day", c),
        strict=True, tiebreak="event_id",
    )
    row = out.collect()[0]
    assert (row.m_id, row.m_value) == (101, None)


def test_asof_forward_semantics(spark):
    """Forward as-of: the EARLIEST right row after (strict) / at-or-after
    (non-strict) each left timestamp; equal-ts ties still break to the
    highest tiebreak; left rows past the last right row stay NULL."""
    left, right = _asof_fixture(spark)
    strict = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "value": "m_value"},
        strict=True, tiebreak="event_id", direction="forward",
    )
    got = {r.event_id: (r.m_id, r.m_value) for r in strict.collect()}
    assert got == {
        1: (None, None),   # 00:10 is after every right row
        2: (21, 3.0),      # strict: r5 at 00:05 invisible -> tie at 00:08
        3: (10, 1.0),      # earliest right after 00:01
        4: (None, None),   # key absent on right
    }
    loose = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "value": "m_value"},
        strict=False, tiebreak="event_id", direction="forward",
    )
    got = {r.event_id: (r.m_id, r.m_value) for r in loose.collect()}
    assert got[2] == (10, 1.0)  # non-strict: the simultaneous row matches


def test_asof_forward_null_left_timestamp_gets_null_payload(spark):
    """A left row with a NULL timestamp can never satisfy ts-compare
    against any right row — both directions must return NULL payload
    for it (forward's desc scan needs nulls-first or the NULL row
    inherits the smallest right ts's payload)."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2020-01-01T00:00:00")), (2, 1, None)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, _ts("2020-01-02T00:00:00")),
         (11, 1, _ts("2020-01-03T00:00:00"))],
        "rid long, k long, ts timestamp",
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload={"rid": "m_rid"}, strict=True, tiebreak="rid",
            direction=direction,
        )
        got = {r.lid: r.m_rid for r in out.collect()}
        assert got[2] is None, direction
    # and the non-null forward row still matches the earliest later right
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload={"rid": "m_rid"}, strict=True, tiebreak="rid",
        direction="forward",
    )
    assert {r.lid: r.m_rid for r in out.collect()}[1] == 10


def test_asof_bucketed_forward_carries_across_buckets(spark):
    """Forward bucketed as-of: a left row whose next right row lives
    SEVERAL buckets later must get it through the carry pass (the
    within-bucket pass alone would return NULL); simultaneous rows
    stay invisible under strict."""
    from beam_scala_examples_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00")),   # match is 2 days later
         (2, 1, _ts("2024-01-03T12:00:00")),   # same-bucket match
         (3, 1, _ts("2024-01-03T13:00:00"))],  # after every right row
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, _ts("2024-01-03T12:00:00"), 1.0),   # equal-ts to lid 2
         (11, 1, _ts("2024-01-03T12:30:00"), 2.0)],
        "event_id long, k long, ts timestamp, v double",
    )
    out = asof_join_bucketed(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "v": "m_v"},
        bucket=lambda c: F.date_trunc("day", c),
        strict=True, tiebreak="event_id", direction="forward",
    )
    got = {r.lid: (r.m_id, r.m_v) for r in out.collect()}
    assert got == {
        1: (10, 1.0),      # carried across empty 2024-01-02 bucket
        2: (11, 2.0),      # strict: the simultaneous row is invisible
        3: (None, None),   # nothing later
    }


def test_asof_nearest_tie_and_direction_semantics(spark):
    """asof_join_nearest: backward candidate at gap 0 beats any forward;
    exact equal-distance ties go backward; a strictly closer forward row
    wins; equal-ts right rows resolve to the largest tiebreak; unmatched
    keys keep NULLs."""
    from beam_scala_examples_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00")),   # simultaneous right -> gap 0
         (2, 1, _ts("2024-01-01T11:00:00")),   # 30 min both sides -> backward
         (3, 1, _ts("2024-01-01T12:20:00")),   # fwd 10 min < back 50 min
         (4, 2, _ts("2024-01-01T10:00:00"))],  # key with no right rows
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01T10:00:00"), 1.0),
         (11, 1, _ts("2024-01-01T10:00:00"), 2.0),   # equal ts: max id wins
         (12, 1, _ts("2024-01-01T10:30:00"), 3.0),
         (13, 1, _ts("2024-01-01T11:30:00"), 4.0),
         (14, 1, _ts("2024-01-01T12:30:00"), 5.0)],
        "event_id long, k long, ts timestamp, v double",
    )
    out = asof_join_nearest(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload={"event_id": "m_id", "v": "m_v"}, tiebreak="event_id",
    )
    got = {
        r.lid: (r.m_id, r.m_v, r["__asof_gap_us"]) for r in out.collect()
    }
    assert got == {
        1: (11, 2.0, 0),               # gap-0 backward, tiebreak 11 > 10
        2: (12, 3.0, 30 * 60 * 10**6),  # equidistant (12 vs 13) -> backward
        3: (14, 5.0, 10 * 60 * 10**6),  # forward strictly closer
        4: (None, None, None),
    }
