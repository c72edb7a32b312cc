"""operators/carry.py: the sharded two-pass prefix sum must equal the
naive single-task-per-partition window bit-for-bit, including on skewed
and shard-boundary-straddling inputs."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beam_scala_examples_spark.operators.carry import (
    sharded_prefix_sum,
    sharded_row_number,
)


def _mk(spark, n=500, parts=3):
    # Skew: part 0 owns ~80% of rows; values vary so sums are distinctive.
    rows = [
        (i, f"p{0 if i % 10 < 8 else (i % parts)}", (i * 7) % 13 + 1)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "k bigint, part string, v bigint")


def test_sharded_prefix_sum_equals_global_window(spark):
    df = _mk(spark)
    w = (
        Window.partitionBy("part")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expect = df.withColumn(
        "cum", F.coalesce(F.sum("v").over(w), F.lit(0))
    )
    got = sharded_prefix_sum(
        df,
        part="part",
        order=["k"],
        shard=F.expr("k div 37"),  # odd span: boundaries inside runs
        val="v",
        out="cum",
    )
    assert (
        expect.exceptAll(got.select(*expect.columns)).count() == 0
        and got.exceptAll(expect.select(*got.columns)).count() == 0
    )


def test_sharded_row_number_equals_global_window(spark):
    df = _mk(spark)
    w = Window.partitionBy("part").orderBy("v", "k")
    expect = df.withColumn("pos", F.row_number().over(w).cast("long"))
    got = sharded_row_number(
        df,
        part="part",
        order=["v", "k"],
        shard=F.expr("v div 5"),  # monotone in the leading order key
        out="pos",
    )
    assert (
        expect.exceptAll(got.select(*expect.columns)).count() == 0
        and got.exceptAll(expect.select(*got.columns)).count() == 0
    )
