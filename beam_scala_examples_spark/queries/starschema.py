"""Star-schema analytics over the TPC-H-shaped fixture tables.

Beyond the reference's surface (it has no relational star-schema
workload): these pin the engine's multi-way join pipeline — the one shape
SURVEY §2.4's two-input CoGroupByKeys never reach. Shapes follow the
classic TPC-H pricing-summary / shipping-priority / local-supplier
queries, restated for the fixture's columns.

Determinism: money aggregates sum exact integer cents (the per-row
product is rounded once, identically in both engines) — double summation
order is not associative and differs across partitions/engines.

Scale posture: lineitem/orders/customer join on their keys (balanced,
high-cardinality — shuffle joins that AQE sizes); nation/region are
broadcast; top-k goes through the rank's WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import cents
from ..operators.topk import top_k_per_key
from ..tables import load

PRICING_CUTOFF = "2001-09-01"
PRIORITY_SEGMENT = "BUILDING"
PRIORITY_DATE = "1998-01-01"
VOLUME_REGION = "ASIA"
TOP_ORDERS = 10

def _disc_cents():
    """Per-row discounted price in exact cents (Column factory — building
    Column expressions needs an active SparkContext, so not module-level)."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")


def star_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): per (returnflag, linestatus)
    over shipped-before-cutoff lineitems — pure scan + hash aggregate
    with every money column in exact cents."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < PRICING_CUTOFF
    )
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    charge_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")) * 100, 0
    ).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_cents"),
            F.sum(price_c).alias("sum_base_cents"),
            F.sum(_disc_cents()).alias("sum_disc_cents"),
            F.sum(charge_c).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
    )


def star_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): top revenue orders for one
    market segment, ordered before / shipped after the date — a 3-way
    join (two shuffle joins on the order key chain) + global top-k."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > PRIORITY_DATE
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < PRIORITY_DATE
    )
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == PRIORITY_SEGMENT
    )
    revenue = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
    )
    return top_k_per_key(
        revenue.withColumn("g", F.lit(1)),
        ["g"],
        [F.desc("revenue_cents"), F.asc("l_orderkey")],
        TOP_ORDERS,
    ).select("l_orderkey", "o_orderdate", "revenue_cents")


def star_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): revenue per nation for one
    region — a 5-way join; nation and region broadcast, the fact chain
    shuffles on its keys."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name") == VOLUME_REGION
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy("n_name")
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
    )


def star_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary with ROLLUP subtotals — grouping sets are outside
    the reference's Beam surface (SURVEY §2.3 notes them absent) but come
    free from Spark SQL; Catalyst expands the rollup into one Expand +
    hash aggregate, still partial/final."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < PRICING_CUTOFF
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_disc_cents()).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
    )


def star_pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over the full CUBE of (returnflag, linestatus)
    with the grouping_id bitmask — completes the grouping-sets surface
    beside ``star_pricing_rollup`` (Catalyst expands to one Expand +
    partial/final hash aggregate; leftmost cube column is the most
    significant grouping bit in both engines)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < PRICING_CUTOFF
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(_disc_cents()).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
    )


FORECAST_LO = "1998-01-01"
FORECAST_HI = "1999-01-01"
FORECAST_DISC_LO = 0.05
FORECAST_DISC_HI = 0.07
FORECAST_MAX_QTY = 24


def star_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): one filtered scan, one
    global sum — the canonical predicate-pushdown query.  All four
    predicates reach the parquet scan (date range, discount band,
    quantity cap) and the revenue sum rides exact cents; no shuffle at
    all beyond the final single-row combine."""
    li = load(spark, sf_dir, "lineitem")
    rev_c = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100, 0
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= FORECAST_LO)
            & (F.col("l_shipdate") < FORECAST_HI)
            & (F.col("l_discount") >= FORECAST_DISC_LO)
            & (F.col("l_discount") <= FORECAST_DISC_HI)
            & (F.col("l_quantity") < FORECAST_MAX_QTY)
        )
        .agg(
            F.round(F.sum(rev_c) / 100.0, 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


QUERIES = {
    "star_pricing_summary": star_pricing_summary,
    "star_pricing_rollup": star_pricing_rollup,
    "star_pricing_cube": star_pricing_cube,
    "star_shipping_priority": star_shipping_priority,
    "star_volume_by_nation": star_volume_by_nation,
    "star_revenue_forecast": star_revenue_forecast,
}

ORACLE = {
    "star_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               sum(round(l_quantity * 100)::BIGINT)::BIGINT AS sum_qty_cents,
               sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
               sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT
                   AS sum_disc_cents,
               sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         * 100)::BIGINT)::BIGINT AS sum_charge_cents,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate < '{PRICING_CUTOFF}'
        GROUP BY 1, 2
    """,
    "star_pricing_rollup": f"""
        SELECT l_returnflag, l_linestatus,
               sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT
                   AS sum_disc_cents,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate < '{PRICING_CUTOFF}'
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "star_shipping_priority": f"""
        WITH rev AS (
            SELECT l_orderkey, o_orderdate,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 100)::BIGINT)::BIGINT AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = '{PRIORITY_SEGMENT}'
              AND o_orderdate < '{PRIORITY_DATE}'
              AND l_shipdate > '{PRIORITY_DATE}'
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY revenue_cents DESC, l_orderkey ASC) AS rk
            FROM rev
        )
        SELECT l_orderkey, o_orderdate, revenue_cents
        FROM ranked WHERE rk <= {TOP_ORDERS}
    """,
    "star_volume_by_nation": f"""
        SELECT n_name,
               sum(round(l_extendedprice * (1 - l_discount)
                         * 100)::BIGINT)::BIGINT AS revenue_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{VOLUME_REGION}'
        GROUP BY 1
    """,
}

ORACLE["star_pricing_cube"] = f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
           sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT
               AS sum_disc_cents,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate < '{PRICING_CUTOFF}'
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLE["star_revenue_forecast"] = f"""
    SELECT round(sum(round(l_extendedprice * l_discount * 100)::BIGINT)
                 / 100.0, 2) AS revenue,
           count(*)::BIGINT AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= '{FORECAST_LO}' AND l_shipdate < '{FORECAST_HI}'
      AND l_discount >= {FORECAST_DISC_LO} AND l_discount <= {FORECAST_DISC_HI}
      AND l_quantity < {FORECAST_MAX_QTY}
"""
