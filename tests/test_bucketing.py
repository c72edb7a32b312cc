"""Bucketed co-located joins: pre-shuffling at write time.

The 100 TB pattern for repeated fact-fact joins (SCALE.md): bucket both
tables by the join key at write time, and every subsequent join on that
key runs with ZERO exchanges — the shuffle is paid once, at ingest.
These tests pin that the engine's bucketed write + join actually
produces an exchange-free plan and the same rows as the plain join.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    """lineitem + orders written bucketed/sorted by the order key."""
    d = tempfile.mkdtemp(prefix="bese-warehouse-")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    (li.write.format("parquet")
       .bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
       .option("path", f"{d}/li_bucketed")
       .mode("overwrite").saveAsTable("li_bucketed"))
    (orders.write.format("parquet")
       .bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
       .option("path", f"{d}/orders_bucketed")
       .mode("overwrite").saveAsTable("orders_bucketed"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    # DROP TABLE on external (path-option) tables leaves the files behind
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(bucketed, sf_dir):
    spark = bucketed
    got = sorted(
        tuple(r)
        for r in spark.table("li_bucketed")
        .join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_extendedprice", "o_orderpriority")
        .collect()
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = sorted(
        tuple(r)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_extendedprice", "o_orderpriority")
        .collect()
    )
    assert got == expected
