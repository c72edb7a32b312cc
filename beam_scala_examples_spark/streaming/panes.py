"""Pane-timing emulation (SURVEY §2.7 X6/X7; ``cookbook/TriggerExample.scala:342-361``).

Spark has no ``PaneInfo``; the engine derives Beam-style timing labels
from the semantics of the output mode:

 - **update mode** emissions are speculative refinements while the
   watermark is below the window end — Beam's EARLY panes (Spark evicts
   window state once the watermark passes, so a native update stream
   cannot re-fire a closed window);
 - **append mode** emits each window exactly once, when the watermark
   passes its end — Beam's ON_TIME pane;
 - a re-emission of an already-finalized (window, key) — possible only in
   engine-assisted refinement pipelines (e.g. a foreachBatch MERGE sink) —
   is labeled LATE via the finalized-pane dedup set.

This is precisely the X4 approximation documented in SURVEY §7.4: Beam's
late-firing panes beyond the watermark have no native Spark equivalent.

The per-batch watermark (from ``lastProgress``, one batch behind by
construction) is recorded as pane metadata, mirroring PaneInfo's
processing-time fields.

Scale note: labels are constants per batch/mode, so in a production sink
the timing column is a literal; the only state is the finalized-pane set,
which in a real deployment is the MERGE key of the target table rather
than driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


class PaneSink:
    """Production-shape pane sink — :class:`PaneTagger`'s scale note made
    real: the timing label is a per-batch literal column, the finalized
    set is the sink table's own keys, and nothing is collected to the
    driver.

    - ``update`` mode: every emission is a speculative refinement →
      ``timing = EARLY`` literal, appended with its ``batch_id``.
    - ``append`` mode: a pane whose (window, key) is absent from the
      sink table is ON_TIME; one already present (engine-assisted
      refinement / failure replay beyond the idempotent partition) is
      LATE — derived by a left join against the sink's distinct keys,
      the DataFrame form of a MERGE's matched/not-matched branches.

    Writes are partitioned by ``batch_id`` with dynamic partition
    overwrite, so replaying a batch replaces its own partition
    (exactly-once), like the contribution table in
    ``streaming/gamestats.py``; the finalized-set read excludes the
    current batch's partition so a replay cannot relabel its own panes
    LATE.  (Structured Streaming only ever replays the latest
    uncommitted batch, which is exactly the case this covers.)
    """

    def __init__(self, path: str, win_end_col: str, key_cols: tuple[str, ...],
                 mode: str = "update"):
        if mode not in ("update", "append"):
            raise ValueError(f"mode must be update|append, got {mode!r}")
        self.path = path
        self.win_end_col = win_end_col
        self.key_cols = key_cols
        self.mode = mode

    def _existing_keys(self, spark, batch_id: int) -> DataFrame | None:
        try:
            return (
                spark.read.parquet(self.path)
                # exclude the current batch's own partition: on failure
                # replay the batch's previous write must not relabel its
                # own ON_TIME panes as LATE
                .filter(F.col("batch_id") != batch_id)
                .select(self.win_end_col, *self.key_cols)
                .distinct()
            )
        except AnalysisException:  # first batch: no sink table yet
            return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.mode == "update":
            tagged = batch_df.withColumn("timing", F.lit("EARLY"))
        else:
            keys = [self.win_end_col, *self.key_cols]
            existing = self._existing_keys(batch_df.sparkSession, batch_id)
            if existing is None:
                tagged = batch_df.withColumn("timing", F.lit("ON_TIME"))
            else:
                # no broadcast hint: the finalized-key set grows with
                # windows x keys — Catalyst/AQE picks the strategy
                seen = existing.withColumn("__seen", F.lit(True))
                tagged = (
                    batch_df.join(seen, on=keys, how="left")
                    .withColumn(
                        "timing",
                        F.when(F.col("__seen"), F.lit("LATE"))
                        .otherwise(F.lit("ON_TIME")),
                    )
                    .drop("__seen")
                )
        (
            tagged.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )


class PaneTagger:
    """foreachBatch sink collecting panes with Beam-style timing labels.

    ``mode`` must match the query's output mode ("update" or "append").
    Attach the running query with ``attach()`` after ``start()`` so the
    per-batch watermark can be recorded as metadata.
    """

    def __init__(self, win_end_col: str, key_cols: tuple[str, ...],
                 mode: str = "update"):
        if mode not in ("update", "append"):
            raise ValueError(f"mode must be update|append, got {mode!r}")
        self.win_end_col = win_end_col
        self.key_cols = key_cols
        self.mode = mode
        self.query = None
        self._finalized: set = set()
        self._batch_keys: dict[int, set] = {}
        self.panes: list[dict] = []

    def attach(self, query) -> "PaneTagger":
        self.query = query
        return self

    def _watermark(self) -> str | None:
        if self.query is not None and self.query.lastProgress:
            return (self.query.lastProgress.get("eventTime") or {}).get("watermark")
        return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        wm = self._watermark()
        if batch_id in self._batch_keys:
            # failure replay of this batch: forget its previous panes so
            # it cannot relabel its own ON_TIME output LATE — the
            # driver-dict analogue of PaneSink's batch-partition
            # exclusion (same replay shape, same answer)
            self._finalized -= self._batch_keys[batch_id]
            self.panes = [
                p for p in self.panes if p["processing_batch"] != batch_id
            ]
        self._batch_keys[batch_id] = set()
        for row in batch_df.collect():
            d = row.asDict()
            pane_key = (d[self.win_end_col], *(d[k] for k in self.key_cols))
            if self.mode == "update":
                d["timing"] = "EARLY"
            elif pane_key in self._finalized:
                d["timing"] = "LATE"
            else:
                d["timing"] = "ON_TIME"
                self._finalized.add(pane_key)
                self._batch_keys[batch_id].add(pane_key)
            d["processing_batch"] = batch_id
            d["watermark"] = wm
            self.panes.append(d)


class DeltaPaneSink:
    """Discarding-mode pane emission (X8, ``TriggerExample.scala:178,
    210,245,291``): converts Spark's update-mode ACCUMULATING
    refinements into Beam-style per-pane DELTAS — each firing emits
    only the increment since the key's previous emission, so the sink's
    output IS the reference's discarding pane table (260|6 then 60|1,
    30|1, 20|1, 60|1 for the worked regime-2 example) instead of the
    running totals Spark natively re-emits.

    Log-as-state (the ``IngestDedupSink`` discipline): the emitted
    deltas are partitioned by ``batch_id``; a key's last-emitted value
    is the SUM of its deltas in the log EXCLUDING the current batch's
    partition, so a replayed batch re-derives exactly the delta it
    owned and dynamic partition overwrite replaces it — idempotent
    under at-least-once delivery, with no mutable state table to
    corrupt.  Sum-of-deltas over the log always equals the latest
    accumulated value (pinned in tests).

    Scale: per batch, one aggregate over the log keyed on the pane key
    (O(panes emitted), not O(events) — update-mode batches carry
    pre-aggregated rows) and one left join against the batch's rows.
    With Delta/Iceberg the log append becomes a MERGE on
    (key, batch_id).  The batch rows are localCheckpoint-materialized
    before the write because the join reads the same path the write
    replaces (the dedupview lesson)."""

    def __init__(self, path: str, key_cols: tuple[str, ...],
                 value_cols: tuple[str, ...]):
        self.path = path
        self.key_cols = list(key_cols)
        self.value_cols = list(value_cols)

    def _emitted(self, spark, batch_id: int) -> DataFrame | None:
        try:
            log = spark.read.parquet(self.path)
        except AnalysisException:  # first batch: no log yet
            return None
        return (
            log.filter(F.col("batch_id") != batch_id)
            .groupBy(*self.key_cols)
            .agg(
                *[
                    F.sum(c).alias(f"__prev_{c}")
                    for c in self.value_cols
                ]
            )
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = self._emitted(spark, int(batch_id))
        out = batch_df.select(*self.key_cols, *self.value_cols)
        if prev is not None:
            out = (
                out.join(prev, self.key_cols, "left")
                .select(
                    *self.key_cols,
                    *[
                        (
                            F.col(c)
                            - F.coalesce(F.col(f"__prev_{c}"), F.lit(0))
                        ).alias(c)
                        for c in self.value_cols
                    ],
                )
                .localCheckpoint(eager=True)
            )
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )

    def panes(self, spark) -> DataFrame:
        """The discarding pane table: one row per (key, firing) with the
        pane's delta values, ordered by batch_id within a key."""
        return spark.read.parquet(self.path)


def compact_delta_log(sink: DeltaPaneSink, spark, upto_batch: int) -> None:
    """Roll the DeltaPaneSink's history up to ``upto_batch`` into one
    base partition (``batch_id = -1``) — the log-structured-view
    compaction that bounds the per-batch re-aggregation cost for
    long-running streams: after compaction the log holds one row per
    key (the summed base) plus only the recent delta partitions, and
    every sink read (``_emitted``, ``panes``) keeps working unchanged
    because both only ever SUM over partitions.

    Safety contract: compact only batches the stream has COMMITTED
    (Structured Streaming replays at most the latest uncommitted batch,
    so ``upto_batch`` must be strictly below it); like
    ``io.compact_table`` this is the plain-parquet local-FS form —
    writers quiesced, and with Delta/Iceberg it becomes a MERGE +
    partition drop in one commit.  The base is materialized via
    localCheckpoint before any partition is touched (the write reads
    the same path it modifies)."""
    import shutil as _shutil

    log = spark.read.parquet(sink.path)
    base = (
        log.filter(F.col("batch_id") <= upto_batch)
        .groupBy(*sink.key_cols)
        .agg(*[F.sum(c).alias(c) for c in sink.value_cols])
        .localCheckpoint(eager=True)
    )
    (
        base.withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sink.path)
    )
    import os as _os

    for entry in _os.listdir(sink.path):
        if not entry.startswith("batch_id="):
            continue
        bid = int(entry.split("=", 1)[1])
        if 0 <= bid <= upto_batch:
            _shutil.rmtree(_os.path.join(sink.path, entry))
