"""Streaming sources.

The reference reads Pub/Sub with event time taken from a message
attribute (S10, ``complete/game/LeaderBoard.scala:94-98``). The engine's
production path is any Structured Streaming source (kafka/file/rate) plus
an explicit event-time column; tests replay bounded fixtures through a
chunked file source so arrival order (including late rows) is controlled,
mirroring the Injector's late-data profile (``injector/Injector.java:410-417``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def write_arrival_groups(groups: list[list[dict]], out_dir: str) -> int:
    """Write explicit arrival *groups* (variable sizes) as numbered
    json-lines chunk files; each file becomes one micro-batch with
    maxFilesPerTrigger=1 — the knob that makes Beam's worked
    processing-time pane tables reproducible (one group per firing)."""
    os.makedirs(out_dir, exist_ok=True)
    base = time.time() - 3600  # strictly increasing mtimes: the file
    for n, group in enumerate(groups):  # source orders by mod time
        path = os.path.join(out_dir, f"chunk_{n:05d}.json")
        with open(path, "w") as f:
            for r in group:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (base + n, base + n))
    return len(groups)


def write_arrival_chunks(rows: list[dict], chunk_size: int, out_dir: str) -> int:
    """Fixed-size arrival chunking over rows already in arrival order."""
    return write_arrival_groups(
        [rows[i : i + chunk_size] for i in range(0, len(rows), chunk_size)],
        out_dir,
    )


def read_event_stream(
    spark: SparkSession, path: str, schema: str = EVENT_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source delivering one chunk file per micro-batch in
    arrival order — the deterministic stand-in for a queue."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .json(path)
    )
