"""As-of (temporal) join — match each left row to the latest right row
at or before its timestamp.

Beam has no as-of join (the reference's closest shape is the
singleton/map side input, ``cookbook/CombinePerKeyExamples``-adjacent
patterns); Spark has none built in either.  The engine implements the
classic *union + running-last* formulation used by every scale-out
timeseries engine:

    1. tag left and right rows, pack the right payload into one struct;
    2. union by name and shuffle ONCE on the join keys;
    3. sort each partition by (ts, side, tiebreak) and take the running
       ``last(payload, ignorenulls=True)`` — each left row sees exactly
       the latest right payload at/before it;
    4. keep the left rows and unpack the struct.

Scale posture: one exchange on the key columns (both inputs together),
one sort inside each partition — same cost as a single sort-merge join,
with NO range fan-out (a naive ``left.ts >= right.ts`` join explodes to
O(|left| x |right|) per key, and Spark would plan a broadcast
nested-loop).  Skew caveat: a single key with a huge history still sorts
in one task; the standard mitigations (time-bucket the key, then patch
bucket boundaries with a second pass) compose on top of this operator.

The window frame is ``rowsBetween(unboundedPreceding, currentRow)``;
strictness is encoded purely in the sort order of the side tag, so the
frame never needs to peek backwards:

 - strict (``right.ts <  left.ts``): right rows sort AFTER left rows at
   equal ts — an exactly-simultaneous right row is invisible;
 - non-strict (``right.ts <= left.ts``): right rows sort BEFORE left
   rows at equal ts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    *,
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload`` columns
    (``{source_col: output_alias}``) from the latest ``right`` row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), equal ``on``
    keys.  Unmatched left rows keep NULL payload (left-outer
    semantics).  ``tiebreak`` (a right column, e.g. an id) makes the
    pick deterministic when several right rows share one timestamp —
    the largest value wins.
    """
    on = list(on)
    left_side, right_side = (0, 1) if strict else (1, 0)

    # SQL join semantics: a right row with a NULL key or NULL timestamp
    # can never satisfy `r.key = l.key AND r.ts < l.ts` — drop them
    # before the union (otherwise partitionBy groups NULL keys together
    # and a NULL ts sorts first, acting as a universal earliest match).
    # Left rows with NULL key/ts stay and get NULL payload: with the
    # matching right rows gone they simply never see one.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())

    packed = F.struct(
        *[F.col(src).alias(dst) for src, dst in payload.items()]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        packed.alias(_PAYLOAD),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TIE),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(_TS), F.asc(_SIDE), F.asc_nulls_first(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = matched.filter(F.col(_SIDE) == left_side).drop(_TS, _SIDE, _TIE)
    for _, dst in payload.items():
        out = out.withColumn(dst, F.col(_PAYLOAD)[dst])
    return out.drop(_PAYLOAD)
