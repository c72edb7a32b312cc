"""AutoComplete (SURVEY §2.12 Q5): top-K completions per prefix.

Reference: ``complete/AutoComplete.scala:54-435`` — hashtag extraction
(P9), all-prefix expansion (P11), ``Top.largestPerKey(10)`` with hot-key
fanout (T2) and a recursive variant (T3).

Spark-first: count words once, explode prefixes of the *aggregated*
dictionary (so prefix expansion multiplies the small word-count relation,
never the corpus), then a rank-per-prefix.  Spark's WindowGroupLimit
applies the top-K limit before the shuffle, which is the built-in
replacement for the reference's hand-rolled fanout (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import all_prefixes, tokenize
from ..operators.topk import top_k_per_key
from ..tables import load

TOP_K = 3  # reference default is 10; fixture vocabulary is small


def q05_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per prefix (len >= 1): top-K words by (count desc, word desc) —
    the ordering of ``CompletionCandidate.compare``
    (``complete/AutoComplete.scala:341-345``)."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        tokenize(docs, "text")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    prefixed = all_prefixes(counts, "word")
    return top_k_per_key(
        prefixed,
        ["prefix"],
        [F.desc("cnt"), F.desc("word")],
        TOP_K,
    ).select("prefix", "word", "cnt")


def q05_autocomplete_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 + P19: the reference partitions its top-K output in two by
    prefix length (``Partition.of(2, KeySizePartitionFn)``,
    ``complete/AutoComplete.scala:268-276,293``) and flattens the branches
    back (``:310,317``). Spark shape: two filters on one subplan +
    ``unionByName``; AQE stage reuse dedupes the shared top-K subtree."""
    base = q05_autocomplete(spark, sf_dir)
    small = base.filter(F.length("prefix") == 1).withColumn(
        "branch", F.lit("small")
    )
    large = base.filter(F.length("prefix") > 1).withColumn(
        "branch", F.lit("large")
    )
    return small.unionByName(large)


QUERIES = {
    "q05_autocomplete": q05_autocomplete,
    "q05_autocomplete_branches": q05_autocomplete_branches,
}

ORACLE = {
    "q05_autocomplete": rf"""
        WITH words AS (
            SELECT unnest(regexp_split_to_array(text, '[^\p{{L}}]+')) AS word
            FROM documents
        ),
        counts AS (
            SELECT word, count(*)::BIGINT AS cnt FROM words
            WHERE word <> '' GROUP BY word
        ),
        lens AS (
            SELECT word, cnt, unnest(generate_series(1, len(word))) AS i
            FROM counts
        ),
        pref AS (SELECT substr(word, 1, i) AS prefix, word, cnt FROM lens),
        ranked AS (
            SELECT prefix, word, cnt,
                   row_number() OVER (PARTITION BY prefix
                                      ORDER BY cnt DESC, word DESC) AS rk
            FROM pref
        )
        SELECT prefix, word, cnt FROM ranked WHERE rk <= {TOP_K}
    """,
}

ORACLE["q05_autocomplete_branches"] = rf"""
        WITH words AS (
            SELECT unnest(regexp_split_to_array(text, '[^\p{{L}}]+')) AS word
            FROM documents
        ),
        counts AS (
            SELECT word, count(*)::BIGINT AS cnt FROM words
            WHERE word <> '' GROUP BY word
        ),
        lens AS (
            SELECT word, cnt, unnest(generate_series(1, len(word))) AS i
            FROM counts
        ),
        pref AS (SELECT substr(word, 1, i) AS prefix, word, cnt FROM lens),
        ranked AS (
            SELECT prefix, word, cnt,
                   row_number() OVER (PARTITION BY prefix
                                      ORDER BY cnt DESC, word DESC) AS rk
            FROM pref
        )
        SELECT prefix, word, cnt,
               CASE WHEN len(prefix) = 1 THEN 'small' ELSE 'large' END AS branch
        FROM ranked WHERE rk <= {TOP_K}
    """
