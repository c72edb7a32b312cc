"""Cookbook queries (SURVEY §2.12 Q16, Q17, Q19, Q20, Q21) over the
star schema.

Reference pipelines: ``cookbook/BigQueryTornadoes.scala:38-177``,
``cookbook/CombinePerKeyExamples.scala:32-149``, ``cookbook/FilterExamples.scala:32-194``,
``cookbook/JoinExamples.scala:38-159``, ``cookbook/MaxPerKeyExamples.scala:31-120``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import cents
from ..tables import load


def q16_tornado_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """month -> count of flagged rows (Q16: S7 projection + P2 filter + A1;
    ``cookbook/BigQueryTornadoes.scala:133-141``). The urgent-priority flag
    plays the ``tornado`` role over ``orders``.

    Scale note: only ``o_orderdate``/``o_orderpriority`` are read (column
    pruning) and the filter is pushed to the parquet scan.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.month("o_orderdate").alias("month"))
        .agg(F.count("*").alias("tornado_count"))
        .select(F.col("month").cast("long").alias("month"), "tornado_count")
    )


def q17_plays_per_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word (len >= 5) -> comma-joined source list (Q17: A8 custom concat
    combiner, ``cookbook/CombinePerKeyExamples.scala:145-148``).

    Declared deviation (like SURVEY §2.11 N1/N2/N5): the reference's
    MIN_WORD_LENGTH is 9 (``CombinePerKeyExamples.scala:95-101``); the
    fixture corpus has few >= 9-letter words, so the threshold is scaled
    to 5 to keep the aggregation exercised at fixture scale.

    The reference's concat order is nondeterministic (SURVEY §7.4); the
    engine canonicalizes with a sorted distinct list so results are stable
    and oracle-comparable.  ``collect_set`` partial-aggregates before the
    shuffle, so the exchange carries per-word sets, not raw rows.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), r"[^\p{L}]+")).alias("word"), "source"
    ).filter(F.length("word") >= 5)
    return words.groupBy("word").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources")
    )


def q19_below_mean_july(spark: SparkSession, sf_dir: str) -> DataFrame:
    """July rows below the global mean (Q19: P17 projection + A6 global
    mean + J4 broadcast-scalar side input; ``cookbook/FilterExamples.scala:150-182``).

    The global mean is a one-row aggregate broadcast-cross-joined into the
    row filter — Beam's ``.asSingletonView()`` with no shuffle of the fact
    table.
    """
    li = load(spark, sf_dir, "lineitem")
    # Exact-cents mean: a float avg differs in the last ulp between engines
    # (and between shuffle orders), which could flip rows sitting exactly at
    # the threshold. Integer sums are associative and exact.
    price_cents = cents("l_extendedprice")
    mean = li.agg(
        (F.sum(price_cents) / (100.0 * F.count("*"))).alias("global_mean")
    )
    return (
        li.filter(F.month("l_shipdate") == 7)
        .join(F.broadcast(mean))
        .filter(F.col("l_extendedprice") < F.col("global_mean"))
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


def q20_join_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact rows joined to a small dim with a default for misses (Q20: J1
    CoGroupByKey with ``getOnly(tag, "none")``, ``cookbook/JoinExamples.scala:146-158``).

    Left join + coalesce('none'), with the dim side broadcast — no shuffle
    of the fact table at any scale where the dim fits in memory.
    """
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_name")
    )
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select(
            "event_id",
            F.coalesce(F.col("c_name"), F.lit("none")).alias("name"),
        )
    )


def q20_join_default_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 in Beam's literal CoGroupByKey form (A11): both sides grouped
    by the key, one Arrow-batched fn sees (events[], customers[]) per key
    and applies the ``getOnly(tag, "none")`` default
    (``cookbook/JoinExamples.scala:87-91,146-158``).

    This is the semantic twin kept for parity with the reference's only
    join primitive — it shuffles BOTH sides on the key; the production
    path is ``q20_join_default``'s broadcast left join (zero fact-table
    shuffle). Both hash-match the same oracle.

    The cogroup key is a hash BUCKET of the join key, not the key
    itself: ``applyInPandas`` pays a per-group Arrow round-trip (~2 ms),
    so cogrouping per key means one Python call per key in the UNION of
    both sides (15k calls / 27 s at sf0.1). Bucketing keeps the CoGBK
    shape — both sides shuffle on the same hash, one function sees both
    bags — while the per-key bag pairing happens vectorized inside
    pandas (a ``merge`` on the true key). 256 buckets ≈ 256 calls; at
    cluster scale raise ``n_buckets`` so each bucket's two sides fit an
    Arrow batch (buckets ≫ cores keeps AQE balance).
    """
    import pandas as pd

    n_buckets = 256
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        "event_id",
        F.pmod(F.xxhash64(F.col("user_id")), F.lit(n_buckets)).alias("b"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        "c_name",
        F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(n_buckets)).alias("b"),
    )

    def cogroup_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "name": pd.Series(dtype="object")})
        # left join on the true key; all (event x customer) pairs per key
        # — matches the relational join twin (and the oracle) if the dim
        # key ever turns out non-unique; misses take the "none" default
        out = left.merge(right[["k", "c_name"]], on="k", how="left")
        out["name"] = out["c_name"].fillna("none")
        return out[["event_id", "name"]]

    return (
        ev.groupby("b")
        .cogroup(cust.groupby("b"))
        .applyInPandas(cogroup_fn, schema="event_id long, name string")
    )


def q21_max_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """month -> max value (Q21: A5 Max.doublesPerKey,
    ``cookbook/MaxPerKeyExamples.scala:83-113``)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.month("l_shipdate").cast("long").alias("month"))
        .agg(F.round(F.max("l_extendedprice"), 2).alias("max_price"))
    )


QUERIES = {
    "q16_tornado_months": q16_tornado_months,
    "q17_plays_per_word": q17_plays_per_word,
    "q19_below_mean_july": q19_below_mean_july,
    "q20_join_default": q20_join_default,
    "q20_join_default_cogroup": q20_join_default_cogroup,
    "q21_max_per_month": q21_max_per_month,
}

ORACLE = {
    "q16_tornado_months": """
        SELECT month(o_orderdate)::BIGINT AS month, count(*)::BIGINT AS tornado_count
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    """,
    "q17_plays_per_word": r"""
        WITH words AS (
            SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word, source
            FROM documents
        )
        SELECT word, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
        FROM words WHERE len(word) >= 5 GROUP BY word
    """,
    "q19_below_mean_july": """
        SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
               round(l_extendedprice, 2) AS price
        FROM lineitem
        WHERE month(l_shipdate) = 7
          AND l_extendedprice < (
              SELECT sum(round(l_extendedprice * 100)::BIGINT) / (100.0 * count(*))
              FROM lineitem)
    """,
    "q20_join_default": """
        SELECT e.event_id, coalesce(c.c_name, 'none') AS name
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    "q21_max_per_month": """
        SELECT month(l_shipdate)::BIGINT AS month,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY 1
    """,
}

ORACLE["q20_join_default_cogroup"] = ORACLE["q20_join_default"]
