

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
