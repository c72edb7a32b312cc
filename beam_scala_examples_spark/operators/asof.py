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

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_TIE = "__asof_tie"
_BUCKET = "__asof_bucket"
_HIT = "__asof_hit"


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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload`` columns
    (``{source_col: output_alias}``) from the latest ``right`` row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), equal ``on``
    keys.  Unmatched left rows keep NULL payload (left-outer
    semantics).  ``tiebreak`` (a right column, e.g. an id) makes the
    pick deterministic when several right rows share one timestamp —
    the largest value wins.

    ``direction="forward"`` flips the match to the EARLIEST right row
    with ``right_ts > left_ts`` (``>=`` when ``strict=False``) — the
    next-reading/label-lookahead join.  Same single exchange + one
    per-partition sort: only the timestamp sort direction flips (the
    running ``last`` then sees larger timestamps first, so the payload
    standing at each left row is the smallest qualifying right ts; the
    side ordering encodes strictness identically, and the tie among
    equal-ts right rows stays "largest tiebreak wins").  The bucketed
    skew variant (``asof_join_bucketed``) supports the same
    ``direction`` parameter.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
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

    # NULL-ts left rows must see NO right rows in either direction:
    # asc defaults to nulls-first, but desc defaults to nulls-LAST —
    # which would hand a NULL-ts left row the running-last payload of
    # the smallest right ts. Force nulls-first for the forward scan.
    ts_order = (
        F.asc(_TS) if direction == "backward" else F.desc_nulls_first(_TS)
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.asc(_SIDE), F.asc_nulls_first(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = matched.filter(F.col(_SIDE) == left_side).drop(_TS, _SIDE, _TIE)
    for _, dst in payload.items():
        out = out.withColumn(dst, F.col(_PAYLOAD)[dst])
    return out.drop(_PAYLOAD)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    *,
    bucket: "Callable[[F.Column], F.Column] | str",
    strict: bool = True,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Skew-hardened :func:`asof_join`: identical semantics, but the
    per-partition sort runs per ``(key, bucket)`` instead of per key, so
    one whale key's history spreads across buckets instead of landing in
    a single task.

    ``bucket`` maps a timestamp column to a coarse bucket id (e.g.
    ``F.date_trunc('day', ...)`` or ``F.floor(F.unix_micros(...) / W)``)
    and MUST be monotone in the timestamp (equal timestamps -> equal
    buckets), or matches would leak across the carry boundary.

    Two passes, both bounded:
      1. *within-bucket*: the union+running-last formulation partitioned
         by ``(key, bucket)`` — finds the match when it lives in the
         left row's own bucket;
      2. *carry*: per (key, bucket) the latest right payload is reduced
         to ONE row, and a bucket-granularity as-of (same union trick
         over O(distinct buckets) rows) supplies the fallback for left
         rows whose match lives in an earlier bucket.

    Exchange volume: pass 1 shuffles both inputs once on (key, bucket);
    pass 2 shuffles only the bucket-level reductions.  Strictness is
    inherited unchanged: an equal-timestamp right row shares the left
    row's bucket by the monotonicity requirement, so the carry pass
    (strictly-earlier buckets) never sees it.

    ``direction="forward"`` mirrors everything: pass 1 runs the forward
    within-bucket as-of, the per-bucket reduction keeps each bucket's
    EARLIEST payload (ts asc, tiebreak desc — rank-1 window, so the
    tiebreak type needs no negation), and the carry pass is a forward
    as-of over strictly-later buckets.
    """
    on = list(on)

    def _b(ts_col: str) -> F.Column:
        return bucket(F.col(ts_col)) if callable(bucket) else F.col(bucket)

    lb = left.withColumn(_BUCKET, _b(left_ts))
    # A constant marker travels with the within-pass payload so "no
    # within-bucket match" (struct NULL -> marker NULL) is
    # distinguishable from "matched a right row whose payload fields
    # are NULL" — a per-field coalesce would conflate the two and could
    # even stitch fields from two different right rows.
    rb = right.withColumn(_BUCKET, _b(right_ts)).withColumn(
        _HIT, F.lit(True)
    )

    within = asof_join(
        lb, rb, on + [_BUCKET], left_ts, right_ts,
        {
            **{src: f"__within_{dst}" for src, dst in payload.items()},
            _HIT: "__within_hit",
        },
        strict=strict, tiebreak=tiebreak, direction=direction,
    )

    # One row per (key, bucket): the bucket's last right payload.
    # max_by keeps the payload OUT of the ordering key (payload types
    # need no ordering, and ordering must never fall through to payload
    # values when (ts, tiebreak) ties — give a unique tiebreak for a
    # deterministic pick, exactly as in asof_join).
    for k in on:
        rb = rb.filter(F.col(k).isNotNull())
    rb = rb.filter(F.col(right_ts).isNotNull())
    carry_payload = F.struct(
        *[F.col(src).alias(dst) for src, dst in payload.items()]
    )
    tie_col = F.col(tiebreak) if tiebreak else F.lit(0)
    if direction == "backward":
        order_key = F.struct(
            F.col(right_ts).alias("ts"), tie_col.alias("tie")
        )
        bucket_pick = rb.groupBy(*on, _BUCKET).agg(
            F.max_by(carry_payload, order_key).alias("__carry_p")
        )
    else:
        # earliest ts, LARGEST tiebreak — a rank-1 window expresses the
        # mixed sort directions without negating the tiebreak's type
        w = Window.partitionBy(*on, _BUCKET).orderBy(
            F.asc(right_ts), F.desc(tie_col)
        )
        bucket_pick = (
            rb.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .select(*on, _BUCKET, carry_payload.alias("__carry_p"))
        )
    left_buckets = lb.select(*on, _BUCKET).distinct()
    # Bucket-granularity as-of, always strict (same-bucket rights are
    # pass 1's job): carry for left bucket b = the last payload of any
    # right bucket < b (backward) / the first of any bucket > b
    # (forward).
    carry = asof_join(
        left_buckets,
        bucket_pick,
        on,
        _BUCKET,
        _BUCKET,
        {"__carry_p": "__carry"},
        strict=True,
        tiebreak=None,
        direction=direction,
    )

    out = within.join(carry, on + [_BUCKET], "left")
    for _, dst in payload.items():
        out = out.withColumn(
            dst,
            F.when(
                F.col("__within_hit"), F.col(f"__within_{dst}")
            ).otherwise(F.col("__carry")[dst]),
        ).drop(f"__within_{dst}")
    return out.drop(_BUCKET, "__carry", "__within_hit")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-in-time join: every ``left`` row matched to the right row
    with the SMALLEST absolute timestamp distance, either side — the
    sensor-alignment / context-lookup shape (kdb's ``aj`` nearest
    variant) that neither direction alone expresses.

    Semantics (totally ordered): backward candidate = latest right row
    with ``right_ts <= left_ts`` (ties → largest ``tiebreak``); forward
    candidate = earliest right row with ``right_ts > left_ts`` (ties →
    largest ``tiebreak``); the winner is the smaller gap, an exact
    equal-distance tie going to the backward (earlier) row.  An
    exactly-simultaneous right row is the backward candidate at gap 0,
    so it always wins.

    Cost: one backward + one forward pass = TWO key exchanges + sorts
    (each the single-shuffle union + running-last plan); the forward
    pass runs over the backward pass's output, so the payload never
    widens beyond the two candidate structs.  For whale keys compose
    ``asof_join_bucketed`` per direction instead.
    """
    from .windows import epoch_us

    # The matched timestamp must surface for the gap comparison; a
    # payload source may itself be right_ts, so the copy rides a
    # reserved column instead of another dict alias.
    r2 = right.withColumn("__asof_rts", F.col(right_ts))
    b_pay = {src: f"__b_{dst}" for src, dst in payload.items()}
    b_pay["__asof_rts"] = "__b_match_ts"
    f_pay = {src: f"__f_{dst}" for src, dst in payload.items()}
    f_pay["__asof_rts"] = "__f_match_ts"
    b = asof_join(
        left, r2, on, left_ts, right_ts, b_pay,
        strict=False, tiebreak=tiebreak, direction="backward",
    )
    bf = asof_join(
        b, r2, on, left_ts, right_ts, f_pay,
        strict=True, tiebreak=tiebreak, direction="forward",
    )
    gap_b = epoch_us(left_ts) - epoch_us("__b_match_ts")
    gap_f = epoch_us("__f_match_ts") - epoch_us(left_ts)
    use_fwd = F.col("__f_match_ts").isNotNull() & (
        F.col("__b_match_ts").isNull() | (gap_f < gap_b)
    )
    out = bf
    for _, dst in payload.items():
        out = out.withColumn(
            dst,
            F.when(use_fwd, F.col(f"__f_{dst}")).otherwise(
                F.col(f"__b_{dst}")
            ),
        )
    out = out.withColumn(
        "__asof_gap_us",
        F.when(use_fwd, gap_f).otherwise(gap_b),
    )
    drops = (
        [f"__b_{d}" for d in payload.values()]
        + [f"__f_{d}" for d in payload.values()]
        + ["__b_match_ts", "__f_match_ts"]
    )
    return out.drop(*drops)
