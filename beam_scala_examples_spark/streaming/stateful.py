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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = "team string, event_id long, total double"
STATE_SCHEMA = "total double"

DEFAULT_THRESHOLD = 1000.0  # reference default 5000 (StatefulTeamScore.scala:103-106)


def _make_update_fn(threshold: float):
    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (team,) = key
        total = state.get[0] if state.exists else 0.0
        out_teams, out_ids, out_totals = [], [], []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev_id, v in zip(pdf["event_id"], pdf["value"]):
                new_total = total + float(v)
                if new_total // threshold > total // threshold:
                    out_teams.append(team)
                    out_ids.append(int(ev_id))
                    out_totals.append(round(new_total, 2))
                total = new_total
        state.update((total,))
        if out_teams:
            yield pd.DataFrame(
                {"team": out_teams, "event_id": out_ids, "total": out_totals}
            )

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
        out_teams, out_ids, out_totals = [], [], []
        for pdf in rows:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev_id, v in zip(pdf["event_id"], pdf["value"]):
                new_total = total + float(v)
                if new_total // self._threshold > total // self._threshold:
                    out_teams.append(team)
                    out_ids.append(int(ev_id))
                    out_totals.append(round(new_total, 2))
                total = new_total
        self._total.update((total,))
        if out_teams:
            yield pd.DataFrame(
                {"team": out_teams, "event_id": out_ids, "total": out_totals}
            )

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
