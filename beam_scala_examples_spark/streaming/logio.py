"""Batch_id-partitioned contribution-log IO shared by the sketch sinks.

The house log discipline (write one batch's partial under its own
``batch_id`` partition with dynamic overwrite; serving re-aggregates
the whole log) has one degenerate corner: a batch whose every value is
NULL/NaN produces an EMPTY partial, whose partitioned write still
creates the log directory but leaves no parquet files in it — and a
schema-INFERRING read of a file-less directory fails with an inference
error instead of returning the empty relation.  The fix is structural,
not a row-count probe (counting the partial would cost an extra job
per batch): the writer returns the log's schema (partial schema +
``batch_id``), the sink stashes it, and serving reads with that
EXPLICIT schema — zero files then reads as the empty relation and
every downstream aggregate degrades to NULL/empty exactly as the batch
query would over an empty corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_log_partition(
    df: DataFrame, batch_id: int, path: str
) -> T.StructType:
    """Write one batch's partial under its ``batch_id`` partition
    (dynamic overwrite — replay re-derives exactly its own partition)
    and return the log schema for :func:`read_log`."""
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )
    return T.StructType(
        list(df.schema.fields)
        + [T.StructField("batch_id", T.LongType())]
    )


def read_log(
    spark: SparkSession, path: str, schema: T.StructType | None
) -> DataFrame:
    """Read the contribution log; with a stashed ``schema`` the read is
    inference-free and a file-less log directory (all batches empty so
    far) is the empty relation, not an error."""
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(path)
