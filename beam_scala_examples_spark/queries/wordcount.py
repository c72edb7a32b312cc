"""WordCount family (SURVEY §2.12 Q1–Q4, Q6, Q18) over the ``documents``
and ``events`` tables.

Reference pipelines: ``MinimalWordCount.scala:27-58``, ``WordCount.scala:36-111``,
``DebuggingWordCount.scala:37-96``, ``WindowedWordCount.scala:45-138``,
``complete/StreamingWordExtract.scala:31-107``, ``cookbook/DistinctExample.scala:26-66``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import WORD_SEP, tokenize
from ..operators.windows import duck_tumbling_start
from ..tables import load

# DuckDB twin of WORD_SEP — RE2 also understands \p{L}.
_DUCK_WORD_SEP = r"[^\p{L}]+"


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize(load(spark, sf_dir, "documents"), "text")


def q01_minimal_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word -> occurrences (Q1: P1 flatMap, P2 filter, A1 count).

    Plan shape: parquet scan (text column only) -> generate(explode) ->
    partial hash agg -> shuffle on word -> final hash agg. All codegen'd.
    """
    return _words(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


def q02_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 + metrics + formatted output (Q2: M1/M2 via observe, P4 format).

    ``observe`` is the Spark twin of Beam's ``Metrics.counter``/``distribution``
    (``WordCount.scala:73-80``): collected on the driver without an extra action.
    """
    docs = load(spark, sf_dir, "documents").observe(
        "q02_metrics",
        F.count(F.when(F.col("text") == "", True)).alias("empty_lines"),
        F.avg(F.length("text")).alias("avg_line_len"),
        F.max(F.length("text")).alias("max_line_len"),
    )
    counts = (
        tokenize(docs, "text")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.select(
        F.format_string("%s: %d", F.col("word"), F.col("cnt")).alias("formatted")
    )


def q03_debugging_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-filtered wordcount (Q3: P3; ``DebuggingWordCount.scala:66-83``).

    The reference keeps words matching ``Flourish|stomach``; on the fixture
    vocabulary we keep an equivalent two-word alternation.
    """
    return (
        _words(spark, sf_dir)
        .filter(F.col("word").rlike("^(data|spark)$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def q04_windowed_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts per 10-min tumbling event-time window (Q4: W1 + A1;
    ``WindowedWordCount.scala:45-138``). The ``events`` table provides real
    event timestamps; ``event_type`` plays the token role.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("event_type").alias("word"),
            "cnt",
        )
    )


def q06_streaming_word_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lines -> words -> uppercase rows (Q6: P1 + P10;
    ``complete/StreamingWordExtract.scala:85-89``). Batch twin of the
    streaming pipeline; the streaming run lives in ``streaming/``.
    """
    return _words(spark, sf_dir).select(F.upper("word").alias("word_upper"))


def q18_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedupe lines (Q18: A13; ``cookbook/DistinctExample.scala:60``).

    ``distinct`` = partial-dedup before the shuffle, so at scale the
    exchange carries unique lines per partition only.
    """
    return load(spark, sf_dir, "documents").select("text").distinct()


QUERIES = {
    "q01_minimal_wordcount": q01_minimal_wordcount,
    "q02_wordcount": q02_wordcount,
    "q03_debugging_wordcount": q03_debugging_wordcount,
    "q04_windowed_wordcount": q04_windowed_wordcount,
    "q06_streaming_word_extract": q06_streaming_word_extract,
    "q18_distinct": q18_distinct,
}

_WORDS_CTE = (
    "WITH words AS (SELECT unnest(regexp_split_to_array(text, '"
    + _DUCK_WORD_SEP
    + "')) AS word FROM documents), w AS (SELECT word FROM words WHERE word <> '')"
)

ORACLE = {
    "q01_minimal_wordcount": f"""
        {_WORDS_CTE}
        SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY word
    """,
    "q02_wordcount": f"""
        {_WORDS_CTE}
        SELECT printf('%s: %d', word, count(*)::BIGINT) AS formatted
        FROM w GROUP BY word
    """,
    "q03_debugging_wordcount": f"""
        {_WORDS_CTE}
        SELECT word, count(*)::BIGINT AS cnt FROM w
        WHERE regexp_matches(word, '^(data|spark)$')
        GROUP BY word
    """,
    "q04_windowed_wordcount": f"""
        SELECT {duck_tumbling_start('ts', 600)} AS win_start,
               event_type AS word, count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2
    """,
    "q06_streaming_word_extract": f"""
        {_WORDS_CTE}
        SELECT upper(word) AS word_upper FROM w
    """,
    "q18_distinct": "SELECT DISTINCT text FROM documents",
}
