"""Keyed threshold state (SURVEY §2.8 ST1; ``complete/game/StatefulTeamScore.scala:117-173``).

Per-team ``ValueState[total]``: each incoming event adds to the running
total; a row is emitted every time the total crosses a multiple of the
threshold. State initializes to 0 (§2.11-N2: the reference port NPEs on
the first element; we implement the documented intent).

Spark-first implementation: ``applyInPandasWithState`` — Arrow-batched
per-key state, the Structured Streaming analogue of Beam's
``@StateId StateSpecs.value``. Rows within a batch are processed in
event-time order so replaying a bounded stream reproduces the batch
``q15_threshold_crossings`` answer exactly (pinned by tests).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = "team string, event_id long, total double"
STATE_SCHEMA = "total double"

DEFAULT_THRESHOLD = 1000.0  # reference default 5000 (StatefulTeamScore.scala:103-106)


def _round2_half_away(x: float) -> float:
    """Round to 2 decimals with Spark ``F.round``'s exact semantics, so
    the streaming emission can never differ from the batch twin by one
    cent on a .xx5 boundary.  Spark rounds ``BigDecimal.valueOf(d)`` —
    the *shortest decimal representation* of the double — HALF_UP;
    ``Decimal(repr(x))`` is the same shortest representation, and
    quantize(HALF_UP) the same rounding (Python's builtin ``round`` is
    banker's and scaling the raw binary double misreads boundaries like
    1.005, so neither matches Spark)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _fold_crossings(
    team, total: float, pdf_iter, threshold: float
) -> tuple[pd.DataFrame | None, float]:
    """Shared crossing fold for both state APIs: concatenate ALL Arrow
    chunks of the micro-batch before sorting — a per-chunk sort would
    process events out of global (ts, event_id) order whenever one key's
    batch spans multiple Arrow batches (> arrow.maxRecordsPerBatch rows).
    Returns (emissions or None, new running total)."""
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return None, total
    pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
    out_teams, out_ids, out_totals = [], [], []
    for ev_id, v in zip(pdf["event_id"], pdf["value"]):
        new_total = total + float(v)
        if new_total // threshold > total // threshold:
            out_teams.append(team)
            out_ids.append(int(ev_id))
            out_totals.append(_round2_half_away(new_total))
        total = new_total
    if not out_teams:
        return None, total
    return (
        pd.DataFrame({"team": out_teams, "event_id": out_ids,
                      "total": out_totals}),
        total,
    )


def _make_update_fn(threshold: float):
    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (team,) = key
        total = state.get[0] if state.exists else 0.0
        out, total = _fold_crossings(team, total, pdf_iter, threshold)
        state.update((total,))
        if out is not None:
            yield out

    return update


def threshold_crossings(
    events: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """events(ts, event_id, event_type, value) -> crossing emissions."""
    return (
        events.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_update_fn(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class ThresholdProcessor(StatefulProcessor):
    """ST1 on the Spark 4 ``transformWithState`` API — the modern keyed
    state surface (named ValueState handles, timers, TTL). Same semantics
    as ``threshold_crossings``; state is the running team total,
    initialized to 0 (SURVEY §2.11-N2).
    """

    def __init__(self, threshold: float):
        self._threshold = threshold

    def init(self, handle) -> None:
        self._total = handle.getValueState("total", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        (team,) = key
        total = self._total.get()[0] if self._total.exists() else 0.0
        out, total = _fold_crossings(team, total, rows, self._threshold)
        self._total.update((total,))
        if out is not None:
            yield out

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def close(self) -> None:
        pass


def threshold_crossings_tws(
    events: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """``threshold_crossings`` on ``transformWithStateInPandas`` (Spark
    4's StatefulProcessor API) — behavior pinned equal to the
    applyInPandasWithState form by the streaming tests. Requires the
    RocksDB state store provider (set by the caller/session):
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    return (
        events.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=ThresholdProcessor(threshold),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
