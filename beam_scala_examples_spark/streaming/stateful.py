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
