"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle (see ``beam_scala_examples_spark/queries/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beam_scala_examples_spark.queries import ORACLE, QUERIES  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required session confs (the driver may hand us a bare
    session; all query semantics assume UTC, and the fixtures have
    shipped TIMESTAMP(NANOS) parquet in past rounds — nanosAsLong keeps
    that read path alive; current tz-naive micros read as TIMESTAMP_NTZ,
    handled by ``tables.load`` + ``operators.windows.epoch_us``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # A bare session defaults to 200 shuffle partitions — far too many
    # tasks for the sf0.01 correctness runs; AQE coalesces but still pays
    # per-task scheduling. Sized to the local core count.
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TF-IDF, SURVEY §2.12 Q7) on /root/testdata/sf0.001."""
    _configure(spark)
    return QUERIES["q07_tfidf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query (same keys as ``queries()``)."""
    return dict(ORACLE)
