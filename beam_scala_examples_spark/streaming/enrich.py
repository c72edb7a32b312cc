"""Stream-static dimension enrichment.

The reference's closest shape is the side-input lookup (SURVEY §2.4 J4–J6:
a bounded map joined against the main collection); this module adds the
Structured Streaming counterpart a production ingest pipeline needs:
joining an unbounded event stream against a *static* dimension table on
every micro-batch.

Semantics and scale posture:
 - The static side is a SNAPSHOT: the dimension DataFrame's file index
   is resolved when the plan is built, so overwriting the dim path
   under a running query does NOT refresh the join — it fails the next
   micro-batch with FILE_NOT_EXIST (verified empirically; Spark's
   re-planning per batch reuses the cached file listing).  For a
   slowly-refreshed dimension, enrich inside ``foreachBatch`` with a
   FRESH ``spark.read`` of the dim path per batch (the pattern
   ``tests/test_streaming.py::test_stream_static_enrichment_refreshes_dim``
   pins) — a new DataFrame lists files anew, so an atomic re-write is
   picked up on the next trigger.
 - The dimension join is HINT-FREE (ADVICE r02): the customer table
   grows with scale factor (~1.5M rows/SF), so a forced broadcast is
   the unconditional-OOM shape the engine's broadcast policy forbids
   for data-dependent sides.  While the dim fits under
   ``autoBroadcastJoinThreshold`` Spark still plans the broadcast
   map-side lookup (no shuffle, no state store per micro-batch); past
   it, the planner degrades to a shuffled join instead of an executor
   OOM.  Truly fixed catalogs (routes, configs) may still hint.
 - A left join keeps events whose key misses the dimension (nulls), so
   ingest never drops rows on referential gaps — route them with
   ``QuarantineSink`` if misses must be dead-lettered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Enrich an event stream with the customer dimension: market
    segment and nation key, keyed ``user_id -> c_custkey``.

    Returns (event_id, ts, user_id, event_type, value, mktsegment,
    nationkey); events without a matching customer keep nulls.
    """
    d = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return stream.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).join(d, "user_id", "left")
