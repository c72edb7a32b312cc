

def test_hll_estimate_within_3_sigma(spark, sf_dir):
    """The HLL registers estimate the true distinct user count within
    3 standard errors (sigma = 1.04/sqrt(m)) — the Flajolet guarantee,
    checked against the exact count; merging the sketch with itself
    must be a no-op (max is idempotent)."""
    from beam_scala_examples_spark.queries.dq import (
        dq_hll_registers,
        hll_estimate,
        HLL_M,
    )
    from beam_scala_examples_spark.tables import load

    regs = dq_hll_registers(spark, sf_dir).collect()
    est = hll_estimate([(r.register, r.max_rank) for r in regs])
    exact = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    sigma = 1.04 / (HLL_M ** 0.5)
    assert abs(est - exact) / exact <= 3 * sigma, (est, exact)
    # self-merge is a no-op
    df = dq_hll_registers(spark, sf_dir)
    merged = (
        df.unionByName(df)
        .groupBy("register")
        .agg(__import__("pyspark").sql.functions.max("max_rank")
             .alias("max_rank"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs)
    )


def test_hll_grouped_estimates_within_3_sigma(spark, sf_dir):
    """Round-6 grouped sketches: per-event_type register estimates hit
    the exact per-type distinct user counts within 3 sigma."""
    from beam_scala_examples_spark.queries.dq import (
        HLL_M,
        dq_hll_by_type,
        hll_estimate,
    )
    from beam_scala_examples_spark.tables import load
    import pyspark.sql.functions as F

    regs = dq_hll_by_type(spark, sf_dir).collect()
    by_type: dict = {}
    for r in regs:
        by_type.setdefault(r.event_type, []).append((r.register, r.max_rank))
    exact = {
        r.event_type: r.nd
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    sigma = 1.04 / (HLL_M ** 0.5)
    assert set(by_type) == set(exact)
    for t, rs in by_type.items():
        est = hll_estimate(rs)
        assert abs(est - exact[t]) / exact[t] <= 3 * sigma, (t, est, exact[t])


def test_profile_sketch_estimates_within_3_sigma(spark, sf_dir):
    """The sketch-backed profiler's per-column estimates (same stacked
    registers dq_profile_events_sketch hashes) land within 3 sigma of
    the exact profiler's n_distinct for EVERY profiled column."""
    from beam_scala_examples_spark.queries.dq import (
        HLL_M,
        PROFILE_COLUMNS,
        dq_profile_events,
        profile_estimates,
    )

    ests = profile_estimates(spark, sf_dir)
    exact = {
        r.column_name: r.n_distinct
        for r in dq_profile_events(spark, sf_dir).collect()
    }
    sigma = 1.04 / (HLL_M ** 0.5)
    assert set(ests) == set(PROFILE_COLUMNS) == set(exact)
    for c in PROFILE_COLUMNS:
        assert abs(ests[c] - exact[c]) / exact[c] <= 3 * sigma, (
            c, ests[c], exact[c],
        )


def test_hll_cumulative_curve_within_3_sigma(spark, sf_dir):
    """The cumulative register curve (pure register merging, no rescan)
    estimates the exact running distinct-user count within 3 sigma on
    EVERY day, and the final day's registers equal the corpus-global
    sketch exactly (merge law end-to-end)."""
    from beam_scala_examples_spark.queries.dq import (
        HLL_M,
        dq_hll_cumulative,
        dq_hll_registers,
        hll_estimate,
    )
    from beam_scala_examples_spark.tables import load
    import pyspark.sql.functions as F

    rows = dq_hll_cumulative(spark, sf_dir).collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.day, []).append((r.register, r.max_rank))
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    days = sorted(by_day)
    sigma = 1.04 / (HLL_M ** 0.5)
    for day in days:
        exact = (
            ev.filter(F.col("day") <= day)
            .select("user_id").distinct().count()
        )
        est = hll_estimate(by_day[day])
        assert abs(est - exact) / exact <= 3 * sigma, (day, est, exact)
    final = sorted(by_day[days[-1]])
    glob = sorted(
        (r.register, r.max_rank)
        for r in dq_hll_registers(spark, sf_dir).collect()
    )
    assert final == glob


def test_card_source_estimates_within_3_sigma(spark, sf_dir):
    """The dataset card's per-source register counts back a real
    estimator: per-source distinct-text estimates land within 3 sigma
    of the exact counts for EVERY source."""
    import pyspark.sql.functions as F

    from beam_scala_examples_spark.queries.dq import HLL_M
    from beam_scala_examples_spark.queries.llmdata import (
        card_source_estimates,
    )
    from beam_scala_examples_spark.tables import load

    ests = card_source_estimates(spark, sf_dir)
    exact = {
        r.source: r.nd
        for r in load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.countDistinct("text").alias("nd"))
        .collect()
    }
    sigma = 1.04 / (HLL_M ** 0.5)
    assert set(ests) == set(exact) and len(ests) >= 5
    for s in exact:
        assert abs(ests[s] - exact[s]) / exact[s] <= 3 * sigma, (
            s, ests[s], exact[s],
        )
