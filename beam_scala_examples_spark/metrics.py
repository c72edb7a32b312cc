"""Metrics (SURVEY §2.9 M1–M3).

Beam's ``Metrics.counter``/``distribution`` map to ``DataFrame.observe``
with an ``Observation`` handle — aggregates computed during the action
itself, no second job (``WordCount.scala:73-80``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def counter(pred: Column, name: str) -> Column:
    """M1 — conditional counter (e.g. empty lines, parse errors)."""
    return F.count(F.when(pred, True)).alias(name)


def distribution(col: Column, name: str) -> list[Column]:
    """M2 — Beam distribution = min/max/sum/count of a value."""
    return [
        F.min(col).alias(f"{name}_min"),
        F.max(col).alias(f"{name}_max"),
        F.sum(col).alias(f"{name}_sum"),
        F.count(col).alias(f"{name}_count"),
    ]


def observe(df: DataFrame, obs: Observation, *aggs: Column) -> DataFrame:
    """Attach metrics to a plan; read ``obs.get`` after the next action."""
    flat: list[Column] = []
    for a in aggs:
        flat.extend(a) if isinstance(a, list) else flat.append(a)
    return df.observe(obs, *flat)


def assert_contains_exactly(df: DataFrame, expected_rows: set) -> None:
    """M3 — PAssert.containsInAnyOrder: sorted multiset equality."""
    actual = sorted(tuple(r) for r in df.collect())
    assert actual == sorted(expected_rows), (
        f"PAssert failed:\n  actual={actual}\n  expected={sorted(expected_rows)}"
    )


def checksum(df: DataFrame) -> int:
    """M3/A4 — the reference's checksum assertion
    (``Sum.longsGlobally`` over per-row hashes,
    ``complete/AutoComplete.scala:134-139,363-370``): an
    order-independent global sum of ``xxhash64`` row hashes. Java
    ``hashCode`` does not port (SURVEY §2.11-N8), so the hash function is
    the engine's own; the *shape* (hash rows, sum globally) is the
    reference's.
    """
    row = df.agg(
        F.coalesce(F.sum(F.xxhash64(*df.columns)), F.lit(0)).alias("c")
    ).collect()[0]
    return row["c"]
