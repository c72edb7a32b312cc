"""TriggerExample's four trigger regimes, pinned against the reference's
own worked pane tables (SURVEY §2.7 X1–X4, X8;
``cookbook/TriggerExample.scala:150-160,190-198,223-231,260-269``).

The reference documents, for freeway 5's [10:00, 10:30) window over ten
elements, the exact pane sequence each trigger regime produces.  These
tests replay the same ten elements (same values, same event times, same
*arrival* order — the documented processing times become arrival-group
boundaries) through the chunked file source and assert the documented
(total_flow, number_of_records) sequences wherever Spark's semantics
determine them.

Documented deviations (SURVEY §7.4):
 - X8 discarding panes: Spark update mode is accumulating-only NATIVELY;
   Beam's discarding LATE deltas are asserted as the first differences
   of the accumulated sequence (regime 2), and — closing the emission
   gap — ``streaming/panes.py::DeltaPaneSink`` EMITS the literal
   discarding pane table (regime-2 delta test below), replay-idempotent.
 - X3: Spark update-mode emissions carry no watermark-relative label
   (all speculative); Beam's EARLY→LATE flip at the watermark is pinned
   via the emission sequence instead (regime 3).
 - X7 sequential trigger phases: not expressible NATIVELY; regime 4
   pins the EARLY prefix, the ON_TIME pane, and the final LATE value
   separately, and — closing the emission gap the same way DeltaPaneSink
   closed X8 — ``streaming/panes.py::SequentialPaneSink`` (batch-
   quantized AfterEach.inOrder) reproduces the reference's literal
   sequential pane table in ONE run (sequential-sink test below).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from beam_scala_examples_spark.streaming.sources import (
    read_event_stream,
    write_arrival_groups,
)

from .test_streaming import tmpdir  # noqa: F401  (fixture reuse)

# The worked example's ten elements (TriggerExample.scala:121-127):
# freeway 5, window [10:00, 10:30), (event_id, value, event time).
_D = "2024-01-01 "
ELEMENTS = {
    1: {"value": 50.0, "ts": _D + "10:00:03"},
    2: {"value": 30.0, "ts": _D + "10:01:00"},
    3: {"value": 30.0, "ts": _D + "10:02:00"},
    4: {"value": 20.0, "ts": _D + "10:04:10"},
    5: {"value": 60.0, "ts": _D + "10:05:00"},
    6: {"value": 20.0, "ts": _D + "10:05:01"},
    7: {"value": 60.0, "ts": _D + "10:15:00"},
    8: {"value": 40.0, "ts": _D + "10:26:40"},
    9: {"value": 60.0, "ts": _D + "10:27:20"},
    10: {"value": 60.0, "ts": _D + "10:29:00"},
}
# Arrival (processing-time) order from the documented table: on-time
# elements first, then the late ones at 11:03, 11:07, 11:07:30, 11:11.
ON_TIME_IDS = [1, 2, 4, 7, 8, 9]
LATE_IDS = [5, 3, 6, 10]

WIN_START = _D + "10:00:00"


def _ev(i: int) -> dict:
    e = ELEMENTS[i]
    return {"event_id": i, "ts": e["ts"], "user_id": 1, "event_type": "5",
            "value": e["value"]}


def _filler(event_id: int, ts: str) -> dict:
    """Watermark-advancing row in a different freeway/window."""
    return {"event_id": event_id, "ts": _D + ts, "user_id": 9,
            "event_type": "F", "value": 1.0}


def _flow(stream, lateness: str):
    """CalculateTotalFlow's aggregation: per-freeway totals in 30-min
    fixed windows (TotalFlow, TriggerExample.scala:300-340)."""
    return (
        stream.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "30 minutes").alias("win"), "event_type")
        .agg(F.sum("value").alias("total_flow"), F.count("*").alias("n_records"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("freeway"),
            "total_flow",
            "n_records",
        )
    )


def _run(spark, groups, tmpdir, mode, lateness):
    """Replay arrival groups, collect window-A panes per micro-batch."""
    write_arrival_groups(groups, f"{tmpdir}/feed")
    stream = read_event_stream(spark, f"{tmpdir}/feed")
    panes: list[tuple] = []

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            if r.freeway == "5" and str(r.win_start).startswith(WIN_START):
                panes.append((r.total_flow, r.n_records))

    (
        _flow(stream, lateness)
        .writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    return panes


def test_regime1_default_trigger_drops_late(spark, tmpdir):  # noqa: F811
    """Concept #1 (TriggerExample.scala:150-160): default trigger, zero
    allowed lateness — the window fires exactly once, ON_TIME, with only
    the six on-time elements:  260 | 6."""
    groups = (
        [[_ev(i) for i in ON_TIME_IDS]]
        + [[_filler(90, "10:45:00")], [_filler(91, "11:00:00")]]  # advance + commit
        + [[_ev(i)] for i in LATE_IDS]  # all behind the watermark -> dropped
    )
    panes = _run(spark, groups, tmpdir, "append", "0 seconds")
    assert panes == [(260.0, 6)]


def test_regime2_allowed_lateness_refines(spark, tmpdir):  # noqa: F811
    """Concept #2 (TriggerExample.scala:190-198): one-day allowed
    lateness — the ON_TIME pane (260|6) then one firing per late element.
    Beam's table shows *discarding* deltas 60, 30, 20, 60; Spark update
    mode is accumulating (X8), so the asserted sequence is the running
    refinement whose first differences are exactly those deltas."""
    groups = (
        [[_ev(i) for i in ON_TIME_IDS]]
        + [[_filler(90, "10:45:00")], [_filler(91, "11:00:00")]]
        + [[_ev(i)] for i in LATE_IDS]
    )
    panes = _run(spark, groups, tmpdir, "update", "1 day")
    assert panes == [
        (260.0, 6),   # ON_TIME (Beam: 260 | 6)
        (320.0, 7),   # + el5's  60 (Beam LATE pane: 60 | 1)
        (350.0, 8),   # + el3's  30 (Beam LATE pane: 30 | 1)
        (370.0, 9),   # + el6's  20 (Beam LATE pane: 20 | 1)
        (430.0, 10),  # + el10's 60 (Beam LATE pane: 60 | 1)
    ]
    deltas = [panes[i][0] - panes[i - 1][0] for i in range(1, len(panes))]
    assert deltas == [60.0, 30.0, 20.0, 60.0]  # the documented discarding panes


def test_regime3_speculative_accumulating(spark, tmpdir):  # noqa: F811
    """Concept #3 (TriggerExample.scala:223-231): processing-time firings
    with accumulating panes — the documented sequence
    80|2, 100|3, 260|6, 320|7, 370|9, 430|10.  Beam labels the first
    three EARLY and the rest LATE; Spark update-mode emissions carry no
    watermark label (all speculative, X3 approximation) — the sequence
    itself is what's pinned."""
    groups = [
        [_ev(1), _ev(2)],          # proc 10:00:47, 10:01:03 -> first firing
        [_ev(4)],                  # proc 10:05:15
        [_ev(7), _ev(8), _ev(9)],  # proc 10:27:15..10:27:25
        [_ev(5)],                  # proc 11:03:00 (late)
        [_ev(3), _ev(6)],          # proc 11:07:00, 11:07:30 (late)
        [_ev(10)],                 # proc 11:11:00 (late)
    ]
    panes = _run(spark, groups, tmpdir, "update", "1 day")
    assert panes == [
        (80.0, 2), (100.0, 3), (260.0, 6),   # Beam: EARLY
        (320.0, 7), (370.0, 9), (430.0, 10),  # Beam: LATE
    ]


def test_regime4_composite_early_ontime_late(spark, tmpdir):  # noqa: F811
    """Concept #4 (TriggerExample.scala:260-269): EARLY 80|2, 100|3,
    260|6; ON_TIME 320|7; LATE 430|10.  Beam's sequential trigger (X7)
    is not expressible in one Spark query — the three phases are pinned
    piecewise:
      - EARLY prefix = regime 3's speculative firings (asserted there);
      - ON_TIME pane: append mode with a 45-min watermark delay admits
        el5 (arriving before the watermark passes 10:30) and fires once
        with 320|7;
      - LATE value: the fully-refined 430|10 is regime 2/3's final
        accumulated pane (asserted there)."""
    groups = [
        [_ev(i) for i in ON_TIME_IDS],
        [_ev(5)],                    # arrives while window A is still open
        [_filler(90, "11:20:00")],   # watermark 10:35 > 10:30 -> A closes
        [_filler(91, "11:30:00")],   # commit (one-batch watermark lag)
        [_ev(3)], [_ev(6)], [_ev(10)],  # beyond lateness -> dropped
    ]
    panes = _run(spark, groups, tmpdir, "append", "45 minutes")
    assert panes == [(320.0, 7)]


def _run_delta(spark, groups, tmpdir, lateness):
    """Replay arrival groups through the DeltaPaneSink; return window-A
    (delta_flow, delta_records) pane rows in firing order."""
    from beam_scala_examples_spark.streaming.panes import DeltaPaneSink

    write_arrival_groups(groups, f"{tmpdir}/feed")
    stream = read_event_stream(spark, f"{tmpdir}/feed")
    sink = DeltaPaneSink(
        f"{tmpdir}/delta_panes",
        key_cols=("win_start", "freeway"),
        value_cols=("total_flow", "n_records"),
    )
    (
        _flow(stream, lateness)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    rows = (
        sink.panes(spark)
        .filter(
            (F.col("freeway") == "5")
            & (F.col("win_start").cast("string").startswith(WIN_START))
        )
        .orderBy("batch_id")
        .collect()
    )
    return [(r.total_flow, r.n_records) for r in rows]


def test_regime2_delta_sink_emits_discarding_panes(spark, tmpdir):  # noqa: F811
    """X8 closed for emission: the DeltaPaneSink turns regime 2's
    accumulating refinements into the reference's literal DISCARDING
    pane table (TriggerExample.scala:190-198) — ON_TIME 260|6 then one
    delta pane per late element: 60|1, 30|1, 20|1, 60|1."""
    groups = (
        [[_ev(i) for i in ON_TIME_IDS]]
        + [[_filler(90, "10:45:00")], [_filler(91, "11:00:00")]]
        + [[_ev(i)] for i in LATE_IDS]
    )
    panes = _run_delta(spark, groups, tmpdir, "1 day")
    assert panes == [
        (260.0, 6),  # ON_TIME pane (Beam: 260 | 6)
        (60.0, 1),   # el5  (Beam LATE discarding pane: 60 | 1)
        (30.0, 1),   # el3  (Beam LATE discarding pane: 30 | 1)
        (20.0, 1),   # el6  (Beam LATE discarding pane: 20 | 1)
        (60.0, 1),   # el10 (Beam LATE discarding pane: 60 | 1)
    ]
    # invariant: sum of discarding deltas == final accumulated pane
    assert sum(p[0] for p in panes) == 430.0
    assert sum(p[1] for p in panes) == 10


def test_delta_sink_replay_idempotent(spark, tmpdir):  # noqa: F811
    """Replaying a micro-batch (same batch_id) re-derives the identical
    delta — its log partition is replaced, never double-subtracted (the
    failure mode of a mutable last-emitted table)."""
    from beam_scala_examples_spark.streaming.panes import DeltaPaneSink

    sink = DeltaPaneSink(
        f"{tmpdir}/delta_panes",
        key_cols=("k",),
        value_cols=("v",),
    )
    b0 = spark.createDataFrame([("a", 100.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 130.0)], "k string, v double")
    sink(b0, 0)
    sink(b1, 1)
    once = sorted(tuple(r) for r in sink.panes(spark).collect())
    sink(b1, 1)  # replay the latest batch
    twice = sorted(tuple(r) for r in sink.panes(spark).collect())
    assert once == twice
    assert sorted((r.k, r.v) for r in sink.panes(spark).collect()) == [
        ("a", 30.0), ("a", 100.0)
    ]


def test_delta_log_compaction_preserves_semantics(spark, tmpdir):  # noqa: F811
    """Compacting committed delta history into the base partition leaves
    per-key totals unchanged AND later deltas still compute against the
    full emitted sum — the log-structured-view roll-up."""
    from beam_scala_examples_spark.streaming.panes import (
        DeltaPaneSink,
        compact_delta_log,
    )

    sink = DeltaPaneSink(
        f"{tmpdir}/delta_panes", key_cols=("k",), value_cols=("v",)
    )
    mk = lambda kv: spark.createDataFrame([kv], "k string, v double")
    sink(mk(("a", 100.0)), 0)
    sink(mk(("a", 130.0)), 1)
    sink(mk(("a", 150.0)), 2)
    compact_delta_log(sink, spark, upto_batch=1)  # batches 0-1 committed
    log = spark.read.parquet(f"{tmpdir}/delta_panes")
    # base partition carries the rolled-up 130; batch 2's delta intact
    assert sorted((r.batch_id, r.v) for r in log.collect()) == [
        (-1, 130.0), (2, 20.0)
    ]
    # a post-compaction batch still diffs against the full emitted sum
    sink(mk(("a", 175.0)), 3)
    rows = sorted(
        (r.batch_id, r.v)
        for r in spark.read.parquet(f"{tmpdir}/delta_panes").collect()
    )
    assert rows == [(-1, 130.0), (2, 20.0), (3, 25.0)]
    # replay of the latest (uncompacted) batch stays idempotent
    sink(mk(("a", 175.0)), 3)
    assert sorted(
        (r.batch_id, r.v)
        for r in spark.read.parquet(f"{tmpdir}/delta_panes").collect()
    ) == rows


def test_regime4_sequential_sink_reproduces_literal_pane_table(
    spark, tmpdir  # noqa: F811
):
    """X7 closed for emission: the SequentialPaneSink (batch-quantized
    AfterEach.inOrder) reproduces the reference's LITERAL sequential
    pane table (TriggerExample.scala:262-269) in ONE run:
        EARLY 80|2, 100|3, 260|6; ON_TIME 320|7; LATE 430|10.
    The three phases come from the sink's trigger emulation itself —
    early firings 60 s after each pane's first refinement, the single
    ON_TIME at (Beam-)watermark passage with el5 aboard, and the late
    throttle batching els 3/6/10 into ONE pane — not from piecewise
    assertions across separate runs.  Spark runs with the reference's
    1-day allowed lateness (state kept, late data admitted); the Beam
    watermark is DERIVED from the staged log (max staged event time) —
    a filler element at 10:35 on another freeway, arriving alongside
    el5, carries it past the 10:30 window end before el3, the
    reference's own timeline (watermark passes between el5 and el3)."""
    from beam_scala_examples_spark.streaming.panes import SequentialPaneSink

    groups = [
        [_ev(1), _ev(2)],          # b0: pane starts              t=0
        [_ev(4)],                  # b1: fires EARLY 80|2         t=60
        [_ev(7), _ev(8), _ev(9)],  # b2: fires EARLY 100|3        t=120
        # b3: fires EARLY 260|6; stages el5's refinement AND the
        # watermark-carrying filler (max staged event time -> 10:35)
        [_ev(5), _filler(98, "10:35:00")],  # t=180
        [_ev(3)],                  # b4: wm=10:35 -> ON_TIME 320|7 t=240
        [_ev(6)],                  # b5: late staged              t=300
        [_ev(10)],                 # b6: late staged              t=360
        [_filler(99, "11:59:00")],  # b7: late throttle due -> LATE t=540
    ]
    sched = {0: 0, 1: 60, 2: 120, 3: 180, 4: 240, 5: 300, 6: 360, 7: 540}
    clock = lambda bid: sched.get(bid, 540 + 60 * (bid - 7))
    write_arrival_groups(groups, f"{tmpdir}/feed")
    stream = read_event_stream(spark, f"{tmpdir}/feed")
    flow_with_end = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "30 minutes").alias("win"), "event_type")
        .agg(F.sum("value").alias("total_flow"),
             F.count("*").alias("n_records"),
             F.max("ts").alias("max_ts"))
        .select(
            F.col("win.end").alias("win_end"),
            F.col("event_type").alias("freeway"),
            "total_flow",
            "n_records",
            "max_ts",
        )
    )
    sink = SequentialPaneSink(
        str(tmpdir),
        win_end_col="win_end",
        key_cols=("freeway",),
        value_cols=("total_flow", "n_records"),
        early_delay_s=60,
        late_delay_s=300,
        event_time_col="max_ts",
        clock=clock,
    )
    (
        flow_with_end.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    rows = (
        sink.panes(spark)
        .filter(F.col("freeway") == "5")
        .orderBy("batch_id")
        .collect()
    )
    assert [(r.total_flow, r.n_records, r.timing) for r in rows] == [
        (80.0, 2, "EARLY"),
        (100.0, 3, "EARLY"),
        (260.0, 6, "EARLY"),
        (320.0, 7, "ON_TIME"),
        (430.0, 10, "LATE"),
    ]


def test_sequential_sink_replay_idempotent(spark, tmpdir):  # noqa: F811
    """Replaying a micro-batch re-derives exactly the staged rows and
    emissions it owned (both logs exclude the replayed partition on
    read), so the pane table is unchanged — the house replay contract,
    deterministic because the clock is injected."""
    from datetime import datetime

    from beam_scala_examples_spark.streaming.panes import SequentialPaneSink

    sink = SequentialPaneSink(
        str(tmpdir),
        win_end_col="win_end",
        key_cols=("k",),
        value_cols=("v",),
        early_delay_s=60,
        late_delay_s=300,
        clock=lambda bid: bid * 60.0,
    )
    end = datetime(2024, 1, 1, 10, 30)
    mk = lambda v: spark.createDataFrame(
        [(end, "a", v)], "win_end timestamp, k string, v long"
    )
    sink(mk(10), 0)
    sink(mk(25), 1)   # fires EARLY 10, stages 25
    sink(mk(40), 2)   # fires EARLY 25, stages 40
    once = sorted(
        tuple(r) for r in sink.panes(spark).collect()
    )
    sink(mk(40), 2)   # replay the latest batch
    twice = sorted(
        tuple(r) for r in sink.panes(spark).collect()
    )
    assert once == twice
    timings = [r.timing for r in sink.panes(spark).collect()]
    assert timings.count("EARLY") == 2


# ---------------------------------------------------------------------------
# Round-8 (verdict item 7): arrival-order PROPERTY tests.  The literal
# reference pane tables above are each pinned by one arrival script;
# these randomize the arrival chunking/permutation within the watermark
# constraints and assert the INVARIANTS that must hold for every
# schedule: conservation (discarding deltas sum to the accumulated
# total), drop determinism (regime 1 fires once with exactly the
# on-time set, however the on-time elements were chunked), and the
# sequential sink's label grammar + accumulating monotonicity + replay
# idempotency under random refinement/clock schedules.
# ---------------------------------------------------------------------------

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _random_chunks(data, ids, max_chunks):
    """Draw a permutation of ``ids`` split into 1..max_chunks arrival
    groups (every element in exactly one group, order preserved)."""
    perm = list(data.draw(st.permutations(list(ids))))
    n = data.draw(st.integers(1, min(max_chunks, len(perm))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, len(perm) - 1),
                min_size=n - 1, max_size=n - 1, unique=True,
            )
        )
    ) if n > 1 else []
    chunks, prev = [], 0
    for c in cuts + [len(perm)]:
        chunks.append(perm[prev:c])
        prev = c
    return [c for c in chunks if c]


@given(data=st.data())
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_delta_sink_conservation_any_arrival_order(spark, data):
    """For EVERY arrival permutation/chunking (on-time elements in any
    order and grouping before the watermark advance, late elements in
    any order after it; 1-day lateness so nothing drops), the
    DeltaPaneSink's window-A discarding panes sum EXACTLY to the
    accumulated total 430|10 and every pane is a positive refinement —
    the conservation law behind the regime-2 literal table."""
    on_chunks = _random_chunks(data, ON_TIME_IDS, 3)
    late_chunks = _random_chunks(data, LATE_IDS, 4)
    groups = (
        [[_ev(i) for i in chunk] for chunk in on_chunks]
        + [[_filler(90, "10:45:00")], [_filler(91, "11:00:00")]]
        + [[_ev(i) for i in chunk] for chunk in late_chunks]
    )
    tmp = tempfile.mkdtemp(prefix="panes-prop-")
    try:
        panes = _run_delta(spark, groups, tmp, "1 day")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert sum(p[0] for p in panes) == 430.0
    assert sum(p[1] for p in panes) == 10
    assert all(n > 0 for _, n in panes)


@given(data=st.data())
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_regime1_drop_invariant_any_arrival_order(spark, data):
    """Regime 1's 260|6 pane is a function of the on-time SET, not the
    arrival order: however the six on-time elements are permuted and
    chunked before the watermark advance, and however the four late
    ones arrive after it, append mode with zero lateness fires window A
    exactly once with exactly the on-time elements."""
    on_chunks = _random_chunks(data, ON_TIME_IDS, 3)
    late_chunks = _random_chunks(data, LATE_IDS, 2)
    groups = (
        [[_ev(i) for i in chunk] for chunk in on_chunks]
        + [[_filler(90, "10:45:00")], [_filler(91, "11:00:00")]]
        + [[_ev(i) for i in chunk] for chunk in late_chunks]
    )
    tmp = tempfile.mkdtemp(prefix="panes-prop-")
    try:
        panes = _run(spark, groups, tmp, "append", "0 seconds")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert panes == [(260.0, 6)]


@given(data=st.data())
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequential_sink_label_grammar_any_schedule(spark, data):
    """SequentialPaneSink invariants under RANDOM refinement totals and
    RANDOM batch clock gaps (direct sink calls — the same foreachBatch
    code path, deterministic injected clock):

      - the window's timing labels read EARLY* ON_TIME? LATE* in batch
        order (the AfterEach.inOrder grammar), with at most one ON_TIME;
      - emitted totals are non-decreasing and drawn from the staged
        accumulating sequence;
      - after the final flush the LAST pane carries the final total;
      - replaying the last batch changes nothing."""
    from datetime import datetime, timedelta

    from beam_scala_examples_spark.streaming.panes import SequentialPaneSink

    deltas = data.draw(
        st.lists(st.integers(1, 50), min_size=2, max_size=5)
    )
    totals = []
    acc = 0
    for d in deltas:
        acc += d
        totals.append(acc)
    # random clock gaps between batches (some below the 60 s early
    # delay, some above), watermark passes after a random prefix
    gaps = data.draw(
        st.lists(
            st.integers(0, 150),
            min_size=len(totals) + 1, max_size=len(totals) + 1,
        )
    )
    n_before = data.draw(st.integers(1, len(totals)))
    sched = []
    t = 0.0
    for g in gaps:
        sched.append(t)
        t += g
    # the LAST batch (bid len(totals)+1) runs far past the late delay
    # so any pending pane must flush
    sched.append(sched[-1] + 400.0)
    clock = lambda bid: sched[bid] if bid < len(sched) else sched[-1]

    tmp = tempfile.mkdtemp(prefix="seq-prop-")
    end = datetime(2024, 1, 1, 10, 30)
    before = end - timedelta(seconds=1)
    after = end + timedelta(minutes=5)
    try:
        sink = SequentialPaneSink(
            tmp, win_end_col="win_end", key_cols=("k",),
            value_cols=("v", "n"), early_delay_s=60, late_delay_s=300,
            event_time_col="ev", clock=clock,
        )
        schema = "win_end timestamp, k string, v long, n long, ev timestamp"
        for bid, tot in enumerate(totals):
            ev = before if bid < n_before else after
            sink(
                spark.createDataFrame(
                    [(end, "a", tot, bid + 1, ev)], schema
                ),
                bid,
            )
        # two flush batches on another key: the first carries the
        # watermark past the window end, the second (far-future clock)
        # fires any pending late pane
        other_end = end + timedelta(hours=1)
        sink(
            spark.createDataFrame(
                [(other_end, "f", 1, 1, after)], schema
            ),
            len(totals),
        )
        last_bid = len(totals) + 1
        last_df = spark.createDataFrame(
            [(other_end, "f", 2, 2, after)], schema
        )
        sink(last_df, last_bid)
        rows = (
            sink.panes(spark)
            .filter(F.col("k") == "a")
            .orderBy("batch_id")
            .collect()
        )
        labels = [r.timing for r in rows]
        vals = [r.v for r in rows]
        # grammar: EARLY* ON_TIME? LATE*
        phase_rank = {"EARLY": 0, "ON_TIME": 1, "LATE": 2}
        ranks = [phase_rank[lb] for lb in labels]
        assert ranks == sorted(ranks), labels
        assert labels.count("ON_TIME") <= 1
        assert vals == sorted(vals)
        assert all(v in totals for v in vals)
        assert rows, "final flush must have fired at least one pane"
        assert vals[-1] == totals[-1]
        assert rows[-1].n == len(totals)
        # replay idempotency
        once = sorted(tuple(r) for r in sink.panes(spark).collect())
        sink(last_df, last_bid)
        twice = sorted(tuple(r) for r in sink.panes(spark).collect())
        assert once == twice
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
