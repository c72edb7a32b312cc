"""Determinism-safe aggregation helpers.

Double summation is order-dependent: partial sums combine in shuffle
order, which differs between partitionings, engines, and cluster runs.
A ``round(sum(double), 2)`` landing near a .xx5 boundary can therefore
flip its last digit nondeterministically (README design rule 3).  For
2-decimal money-like columns the engine sums exact integer *cents*
(associative, order-independent) and divides at the end — the same rule
q10/q19/p08 and the star-schema queries already follow.

Used by the gaming family (Q11–Q14, ``UserScore.scala:160-177``,
``HourlyTeamScore.scala:82-117``, ``LeaderBoard.scala:101-116``,
``GameStats.scala:84-140``) and TriggerExample's Q22 totals
(``cookbook/TriggerExample.scala:300-340``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str = "value") -> Column:
    """The canonical exact-integer-cents expression for a 2-decimal
    double column (NULL passes through).  Every Python-side cents
    computation routes here so the convention has one home."""
    return F.round(F.col(col) * 100, 0).cast("long")


def sum_cents(col: str = "value") -> Column:
    """Order-independent ``round(sum(col), 2)`` for 2-decimal doubles:
    sum exact integer cents, then divide.  Spark side of the shared
    contract; the oracle twin is :func:`duck_sum_cents`."""
    return F.round(F.sum(cents(col)) / 100.0, 2)


def duck_sum_cents(col: str = "value") -> str:
    """DuckDB SQL fragment computing the identical exact-cents sum."""
    return f"round(sum(round({col} * 100)::BIGINT) / 100.0, 2)"
