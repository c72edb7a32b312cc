"""Salted-fanout operators (T2): semantically transparent, plan-verified.

The reference's ``withHotKeyFanout`` (``complete/AutoComplete.scala:
249-254``) has no Spark analogue for combinable aggregates (partial
aggregation covers it); these tests pin the two cases where salting still
matters — non-combinable grouping and AQE-exempt joins — equal to their
unsalted plans on a deliberately skewed input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beam_scala_examples_spark.operators.skew import salted_collect, salted_join


def _skewed(spark):
    """1 hot key (90%), 10 cold keys."""
    return spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_collect_equals_direct(spark):
    df = _skewed(spark)
    direct = {
        r["k"]: sorted(r["values"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("values")).collect()
    }
    salted = {
        r["k"]: sorted(r["values"])
        for r in salted_collect(df, ["k"], "v", fanout=8).collect()
    }
    assert salted == direct


def test_salted_collect_two_stage_plan(spark):
    plan = (
        salted_collect(_skewed(spark), ["k"], "v", fanout=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage 1 partitions by (k, salt), stage 2 by k alone
    assert plan.count("Exchange") >= 2
    assert "__salt" in plan


def test_salted_join_equals_direct(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"cold{i}", float(i)) for i in range(10)],
        "k string, w double",
    )
    direct = sorted(
        tuple(r) for r in big.join(small, "k").select("k", "v", "w").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(big, small, "k", fanout=8, salt_from="v")
        .select("k", "v", "w")
        .collect()
    )
    assert salted == direct


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    direct = sorted(
        tuple(r)
        for r in big.join(small, "k", "left").select("k", "v", "w").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(big, small, "k", fanout=8, salt_from="v", how="left")
        .select("k", "v", "w")
        .collect()
    )
    assert salted == direct


def test_salted_join_rejects_outer(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    for how in ("full", "right", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", fanout=4, salt_from="v", how=how)
