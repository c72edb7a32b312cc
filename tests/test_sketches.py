"""Accuracy + mergeability contracts of the sketch surface
(operators/sketches.py).  Estimates are DataSketches-implementation-
specific, so these are unit bands against exact baselines rather than
DuckDB oracles; the exact baseline itself (events_reach_daily) IS
oracle-checked in test_parity."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from beam_scala_examples_spark.operators.sketches import (
    HLL_LGK,
    hll_reach,
    hll_rollup,
    kll_quantiles,
)
from beam_scala_examples_spark.tables import load


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load(spark, sf_dir, "events")


def test_hll_reach_within_error_band(spark, events):
    """Per-type HLL user reach lands within 5 sigma of exact
    (RSE ~ 1.04/sqrt(2^lgk))."""
    est = {
        r.event_type: r.reach_est
        for r in hll_reach(events, ["event_type"], "user_id").collect()
    }
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    rse = 1.04 / math.sqrt(2 ** HLL_LGK)
    assert est.keys() == exact.keys()
    for t, e in exact.items():
        assert abs(est[t] - e) <= max(1, 5 * rse * e), (t, est[t], e)


def test_hll_union_of_parts_equals_sketch_of_whole(spark, events):
    """THE rollup invariant: merging per-day sketches must equal
    sketching the whole month exactly — register-wise max loses
    nothing.  This is what makes sketch tables rollup-able without
    rescanning facts at 100 TB."""
    parts = hll_reach(
        events.withColumn("part", F.col("event_id") % 4),
        ["event_type", "part"],
        "user_id",
    )
    rolled = {
        r.event_type: r.reach_est
        for r in hll_rollup(parts, ["event_type"]).collect()
    }
    whole = {
        r.event_type: r.reach_est
        for r in hll_reach(events, ["event_type"], "user_id").collect()
    }
    assert rolled == whole


def test_kll_quantiles_within_rank_error(spark, events):
    """KLL median/p90 per event type sit within the sketch's normalized
    rank error (~0.8% at k=200, take 3% for slack) of the exact
    percentile's neighborhood."""
    got = {
        r.event_type: (r.q5, r.q9, r.n)
        for r in kll_quantiles(
            events, "value", ["event_type"], probs=(0.5, 0.9)
        ).collect()
    }
    for etype, (q5, q9, n) in got.items():
        vals = sorted(
            r.value
            for r in events.filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        )
        assert n == len(vals)
        for q, p in ((q5, 0.5), (q9, 0.9)):
            # rank of the estimate must be within 3% of the target rank
            import bisect
            lo = bisect.bisect_left(vals, q) / len(vals)
            hi = bisect.bisect_right(vals, q) / len(vals)
            assert lo - 0.03 <= p <= hi + 0.03, (etype, p, q, lo, hi)


def test_cms_estimates_one_sided_and_depth_tightens(spark, sf_dir):
    """Count-min guarantees: every estimate >= the true count (no
    undercount, ever), the min over depth rows never exceeds the
    single-row estimate, and with a 16-bucket width over the 31-token
    fixture vocabulary at least one token actually collides (otherwise
    the test corpus would not exercise the overestimate path at all)."""
    from beam_scala_examples_spark.queries.llmdata import text_heavy_hitters

    rows = text_heavy_hitters(spark, sf_dir).collect()
    assert rows, "fixture vocabulary should all be heavy hitters"
    assert all(r.est_count >= r.true_count for r in rows)
    assert all(r.est_single_row >= r.est_count for r in rows)
    assert any(r.est_count > r.true_count for r in rows) or any(
        r.est_single_row > r.est_count for r in rows
    )


def test_pareto_frontier_is_exactly_the_non_dominated_set(spark, sf_dir):
    """The banded two-level skyline returns precisely the points no
    other supplier dominates — checked against an O(n^2) reference
    over the (tiny) aggregated supplier relation."""
    from beam_scala_examples_spark.queries.relational import (
        star_pareto_frontier,
        _disc_cents,
    )
    from beam_scala_examples_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    perf = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(_disc_cents()).alias("rev"),
            F.max(F.datediff("l_shipdate", "o_orderdate"))
            .cast("long")
            .alias("lag"),
        )
        .collect()
    )
    expected = {
        p.s_suppkey
        for p in perf
        if not any(
            (q.rev >= p.rev and q.lag <= p.lag)
            and (q.rev > p.rev or q.lag < p.lag)
            for q in perf
        )
    }
    got = {r.s_suppkey for r in star_pareto_frontier(spark, sf_dir).collect()}
    assert got == expected
